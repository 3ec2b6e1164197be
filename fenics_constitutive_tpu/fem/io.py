"""Mesh import/export.

The reference reads/writes meshes through dolfinx's XDMF and adios4dolfinx
(tests/solver/test_solver_mpi.py:97-109). Here a mesh is plain arrays, so any
reader works by constructing ``Mesh(nodes, cells, cell_type)`` directly; this
module additionally ships a dependency-free Gmsh ASCII v2.2 reader/writer
(the lingua franca for unstructured FEM meshes) so externally generated
meshes load without meshio.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

__all__ = ["read_gmsh", "write_gmsh"]

# gmsh element type id -> (cell_type, n_nodes)
_GMSH_TYPES = {
    1: ("interval", 2),
    2: ("triangle", 3),
    3: ("quad", 4),
    4: ("tetra", 4),
    5: ("hex", 8),
}
_GMSH_IDS = {v[0]: k for k, v in _GMSH_TYPES.items()}

# node-order permutations gmsh -> ours (ours: tensor ordering for quad/hex)
_FROM_GMSH_PERM = {
    "interval": [0, 1],
    "triangle": [0, 1, 2],
    "tetra": [0, 1, 2, 3],
    # gmsh quad: counterclockwise 0,1,2,3; ours: (0,0),(1,0),(0,1),(1,1)
    "quad": [0, 1, 3, 2],
    # gmsh hex: bottom face ccw 0-3, top face ccw 4-7;
    # ours: index = dx + 2 dy + 4 dz
    "hex": [0, 1, 3, 2, 4, 5, 7, 6],
}


def read_gmsh(path) -> Mesh:
    """Read an ASCII Gmsh v2.2 ``.msh`` file (highest-dimension cells only)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 0

    def seek(tag):
        nonlocal i
        while i < len(lines) and lines[i] != tag:
            i += 1
        i += 1

    seek("$Nodes")
    n_nodes = int(lines[i]); i += 1
    nodes = np.zeros((n_nodes, 3))
    for k in range(n_nodes):
        parts = lines[i + k].split()
        nodes[int(parts[0]) - 1] = [float(x) for x in parts[1:4]]
    i += n_nodes

    seek("$Elements")
    n_elems = int(lines[i]); i += 1
    by_type: dict[str, list] = {}
    for k in range(n_elems):
        parts = lines[i + k].split()
        etype = int(parts[1])
        if etype not in _GMSH_TYPES:
            continue
        name, nn = _GMSH_TYPES[etype]
        n_tags = int(parts[2])
        conn = [int(x) - 1 for x in parts[3 + n_tags : 3 + n_tags + nn]]
        by_type.setdefault(name, []).append(conn)

    dim_rank = {"interval": 1, "triangle": 2, "quad": 2, "tetra": 3, "hex": 3}
    cell_type = max(by_type, key=lambda t: dim_rank[t])
    perm = _FROM_GMSH_PERM[cell_type]
    cells = np.asarray(by_type[cell_type], np.int32)[:, perm]

    gdim = dim_rank[cell_type]
    # drop trailing zero coordinate axes beyond the topological dimension
    return Mesh(np.ascontiguousarray(nodes[:, :gdim]), cells, cell_type)


def write_gmsh(path, mesh: Mesh) -> None:
    """Write an ASCII Gmsh v2.2 ``.msh`` file."""
    inv = np.argsort(_FROM_GMSH_PERM[mesh.cell_type])
    etype = _GMSH_IDS[mesh.cell_type]
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{mesh.num_nodes}\n")
        for k, p in enumerate(mesh.nodes):
            xyz = list(p) + [0.0] * (3 - mesh.gdim)
            f.write(f"{k + 1} {xyz[0]} {xyz[1]} {xyz[2]}\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{mesh.num_cells}\n")
        for k, c in enumerate(mesh.cells):
            conn = " ".join(str(int(c[j]) + 1) for j in inv)
            f.write(f"{k + 1} {etype} 2 0 0 {conn}\n")
        f.write("$EndElements\n")
