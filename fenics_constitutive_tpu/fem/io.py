"""Mesh and field import/export.

The reference reads/writes meshes through dolfinx's XDMF and adios4dolfinx
(tests/solver/test_solver_mpi.py:97-109). Here a mesh is plain arrays, so any
reader works by constructing ``Mesh(nodes, cells, cell_type)`` directly; this
module additionally ships:

* a dependency-free Gmsh ASCII v2.2 reader/writer (the lingua franca for
  unstructured FEM meshes), so externally generated meshes load without meshio;
* a VTU (VTK XML UnstructuredGrid) writer/reader for visualization of solved
  displacement/stress fields in ParaView — the analog of the reference's XDMF
  field output (tests/solver/test_solver_mpi.py:97-109) — plus a PVD
  time-series index for load-step histories.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

__all__ = [
    "read_gmsh",
    "write_gmsh",
    "write_vtu",
    "read_vtu",
    "PVDWriter",
]

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


# --- VTU (VTK XML UnstructuredGrid) ------------------------------------------

# VTK cell type ids; node-order permutation ours -> VTK is the same as ours ->
# gmsh (both use ccw faces where we use tensor ordering)
_VTK_TYPES = {
    "interval": 3,  # VTK_LINE
    "triangle": 5,  # VTK_TRIANGLE
    "quad": 9,  # VTK_QUAD
    "tetra": 10,  # VTK_TETRA
    "hex": 12,  # VTK_HEXAHEDRON
}
_VTK_NAMES = {v: k for k, v in _VTK_TYPES.items()}


def _as_fields(data: dict | None) -> dict[str, np.ndarray]:
    """Normalize a name -> array dict to 2D float arrays [n, comps]."""
    out = {}
    for name, arr in (data or {}).items():
        a = np.asarray(arr, dtype=np.float64)
        if a.ndim == 1:
            a = a[:, None]
        out[name] = a.reshape(a.shape[0], -1)
    return out


def _write_darray(f, name: str, arr: np.ndarray, kind: str) -> None:
    comps = arr.shape[1] if arr.ndim == 2 else 1
    f.write(
        f'        <DataArray type="{kind}" Name="{name}" '
        f'NumberOfComponents="{comps}" format="ascii">\n'
    )
    flat = np.asarray(arr).reshape(-1)
    fmt = "%d" if kind.startswith("Int") else "%.17g"
    # chunked rows to keep lines short
    per_line = max(1, comps if arr.ndim == 2 else 8)
    for row in flat.reshape(-1, per_line):
        f.write("          " + " ".join(fmt % x for x in row) + "\n")
    f.write("        </DataArray>\n")


def write_vtu(
    path,
    mesh: Mesh,
    point_data: dict | None = None,
    cell_data: dict | None = None,
) -> None:
    """Write a VTK XML UnstructuredGrid (.vtu) file for ParaView.

    Args:
        mesh: the mesh (P1 geometry; for P2 solution fields, pass nodal values
            at the mesh vertices, e.g. ``u.reshape(-1, vs)[:mesh.num_nodes]``).
        point_data: name -> [num_nodes] or [num_nodes, k] arrays.
        cell_data: name -> [num_cells] or [num_cells, k] arrays (e.g. the
            QP-averaged Mandel stress ``stress.mean(axis=1)``).

    Analog of the reference's XDMF field output
    (tests/solver/test_solver_mpi.py:97-109).
    """
    pdata = _as_fields(point_data)
    cdata = _as_fields(cell_data)
    for name, a in pdata.items():
        assert a.shape[0] == mesh.num_nodes, f"point_data[{name}] wrong length"
    for name, a in cdata.items():
        assert a.shape[0] == mesh.num_cells, f"cell_data[{name}] wrong length"

    pts3 = np.zeros((mesh.num_nodes, 3))
    pts3[:, : mesh.gdim] = mesh.nodes
    # VTK node order equals gmsh order here; ours -> VTK inverts VTK -> ours
    inv = np.argsort(_FROM_GMSH_PERM[mesh.cell_type])
    conn = mesh.cells[:, inv]
    npc = mesh.cells.shape[1]

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write(
            '<VTKFile type="UnstructuredGrid" version="0.1" '
            'byte_order="LittleEndian">\n'
        )
        f.write("  <UnstructuredGrid>\n")
        f.write(
            f'    <Piece NumberOfPoints="{mesh.num_nodes}" '
            f'NumberOfCells="{mesh.num_cells}">\n'
        )
        f.write("      <Points>\n")
        _write_darray(f, "Points", pts3, "Float64")
        f.write("      </Points>\n")
        f.write("      <Cells>\n")
        _write_darray(f, "connectivity", conn.astype(np.int64), "Int64")
        offsets = np.arange(1, mesh.num_cells + 1, dtype=np.int64) * npc
        _write_darray(f, "offsets", offsets[:, None], "Int64")
        types = np.full((mesh.num_cells, 1), _VTK_TYPES[mesh.cell_type], np.uint8)
        _write_darray(f, "types", types, "UInt8")
        f.write("      </Cells>\n")
        f.write("      <PointData>\n")
        for name, a in pdata.items():
            _write_darray(f, name, a, "Float64")
        f.write("      </PointData>\n")
        f.write("      <CellData>\n")
        for name, a in cdata.items():
            _write_darray(f, name, a, "Float64")
        f.write("      </CellData>\n")
        f.write("    </Piece>\n")
        f.write("  </UnstructuredGrid>\n")
        f.write("</VTKFile>\n")


def read_vtu(path) -> tuple[Mesh, dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Read an ascii .vtu written by :func:`write_vtu` (round-trip checkable).

    Returns (mesh, point_data, cell_data).
    """
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    piece = root.find("UnstructuredGrid/Piece")

    def parse(el, dtype):
        vals = np.array(el.text.split(), dtype=dtype)
        comps = int(el.get("NumberOfComponents", "1"))
        return vals.reshape(-1, comps)

    pts = parse(piece.find("Points/DataArray"), np.float64)
    arrays = {
        el.get("Name"): el for el in piece.findall("Cells/DataArray")
    }
    conn = parse(arrays["connectivity"], np.int64)
    vtk_type = int(parse(arrays["types"], np.int64)[0, 0])
    cell_type = _VTK_NAMES[vtk_type]
    # VTK order back to ours (same permutation as gmsh -> ours)
    perm = _FROM_GMSH_PERM[cell_type]
    npc = len(perm)
    cells = conn.reshape(-1, npc)[:, perm].astype(np.int32)

    gdim = {"interval": 1, "triangle": 2, "quad": 2, "tetra": 3, "hex": 3}[
        cell_type
    ]
    mesh = Mesh(np.ascontiguousarray(pts[:, :gdim]), cells, cell_type)

    def fields(tag):
        out = {}
        for el in piece.findall(f"{tag}/DataArray"):
            a = parse(el, np.float64)
            out[el.get("Name")] = a[:, 0] if a.shape[1] == 1 else a
        return out

    return mesh, fields("PointData"), fields("CellData")


class PVDWriter:
    """ParaView .pvd time-series index over per-step .vtu files.

    Example::

        pvd = PVDWriter("out/run.pvd")
        for step in ...:
            ...solve...
            pvd.write(mesh, time=t, point_data={"u": u2d}, cell_data=...)
        pvd.close()
    """

    def __init__(self, path):
        import os

        self.path = str(path)
        self.base, _ = os.path.splitext(self.path)
        self.entries: list[tuple[float, str]] = []

    def write(self, mesh, time, point_data=None, cell_data=None) -> str:
        import os

        fname = f"{self.base}_{len(self.entries):06d}.vtu"
        write_vtu(fname, mesh, point_data, cell_data)
        self.entries.append((float(time), os.path.basename(fname)))
        self._flush()
        return fname

    def _flush(self) -> None:
        with open(self.path, "w") as f:
            f.write('<?xml version="1.0"?>\n')
            f.write(
                '<VTKFile type="Collection" version="0.1" '
                'byte_order="LittleEndian">\n  <Collection>\n'
            )
            for t, fname in self.entries:
                f.write(
                    f'    <DataSet timestep="{t}" part="0" file="{fname}"/>\n'
                )
            f.write("  </Collection>\n</VTKFile>\n")

    def close(self) -> None:
        self._flush()
