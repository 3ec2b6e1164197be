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
    "write_gmsh41_binary",
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

# node counts of the remaining standard gmsh element types (needed only to
# SKIP records of unsupported types in binary files, where there is no
# per-line structure to resynchronize on)
_GMSH_SKIP_NODES = {
    6: 6, 7: 5, 8: 3, 9: 6, 10: 9, 11: 10, 12: 27, 13: 18, 14: 14,
    15: 1, 16: 8, 17: 20, 18: 15, 19: 13,
}

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


_DIM_RANK = {"interval": 1, "triangle": 2, "quad": 2, "tetra": 3, "hex": 3}


class _Scanner:
    """Section-seeking line scanner over a .msh file (or its text)."""

    def __init__(self, path=None, text=None):
        if text is None:
            with open(path) as f:
                text = f.read()
        self.lines = [ln.strip() for ln in text.splitlines()]
        self.i = 0

    def seek(self, tag) -> bool:
        j = 0
        while j < len(self.lines) and self.lines[j] != tag:
            j += 1
        if j >= len(self.lines):
            return False
        self.i = j + 1
        return True

    def line(self) -> str:
        ln = self.lines[self.i]
        self.i += 1
        return ln


def _read_physical_names(sc: _Scanner) -> dict[tuple[int, int], str]:
    """(dim, physical id) -> name, from an optional $PhysicalNames section."""
    names: dict[tuple[int, int], str] = {}
    if not sc.seek("$PhysicalNames"):
        return names
    n = int(sc.line())
    for _ in range(n):
        parts = sc.line().split(maxsplit=2)
        names[(int(parts[0]), int(parts[1]))] = parts[2].strip().strip('"')
    return names


def _read_gmsh_v22(sc: _Scanner):
    sc.seek("$Nodes")
    n_nodes = int(sc.line())
    nodes = np.zeros((n_nodes, 3))
    id_map: dict[int, int] = {}
    for k in range(n_nodes):
        parts = sc.line().split()
        id_map[int(parts[0])] = k
        nodes[k] = [float(x) for x in parts[1:4]]

    sc.seek("$Elements")
    n_elems = int(sc.line())
    by_type: dict[str, list] = {}
    tags_by_type: dict[str, list] = {}
    for _ in range(n_elems):
        parts = sc.line().split()
        etype = int(parts[1])
        if etype not in _GMSH_TYPES:
            continue
        name, nn = _GMSH_TYPES[etype]
        n_tags = int(parts[2])
        phys = int(parts[3]) if n_tags >= 1 else 0
        conn = [id_map[int(x)] for x in parts[3 + n_tags : 3 + n_tags + nn]]
        by_type.setdefault(name, []).append(conn)
        tags_by_type.setdefault(name, []).append(phys)
    return nodes, by_type, tags_by_type


def _read_gmsh_v41(sc: _Scanner):
    # $Entities maps (dim, entity tag) -> physical tags
    ent_phys: dict[tuple[int, int], int] = {}
    if sc.seek("$Entities"):
        counts = [int(x) for x in sc.line().split()]  # points curves surf vol
        for dim, cnt in enumerate(counts):
            for _ in range(cnt):
                parts = sc.line().split()
                # points: tag x y z numPhys [...]; others: tag 6-bbox numPhys
                base = 4 if dim == 0 else 7
                n_phys = int(parts[base])
                phys = int(parts[base + 1]) if n_phys >= 1 else 0
                ent_phys[(dim, int(parts[0]))] = phys

    sc.seek("$Nodes")
    hdr = sc.line().split()
    n_blocks, n_nodes = int(hdr[0]), int(hdr[1])
    nodes = np.zeros((n_nodes, 3))
    id_map: dict[int, int] = {}
    pos = 0
    for _ in range(n_blocks):
        bh = sc.line().split()
        parametric, n_in = int(bh[2]), int(bh[3])
        tags = [int(sc.line()) for _ in range(n_in)]
        for j, t in enumerate(tags):
            id_map[t] = pos + j
        for j in range(n_in):
            parts = sc.line().split()
            nodes[pos + j] = [float(x) for x in parts[:3]]
        pos += n_in
        del parametric

    sc.seek("$Elements")
    hdr = sc.line().split()
    n_blocks = int(hdr[0])
    by_type: dict[str, list] = {}
    tags_by_type: dict[str, list] = {}
    for _ in range(n_blocks):
        bh = sc.line().split()
        ent_dim, ent_tag, etype, n_in = (int(x) for x in bh[:4])
        if etype not in _GMSH_TYPES:
            for _ in range(n_in):
                sc.line()
            continue
        name, nn = _GMSH_TYPES[etype]
        phys = ent_phys.get((ent_dim, ent_tag), 0)
        for _ in range(n_in):
            parts = sc.line().split()
            conn = [id_map[int(x)] for x in parts[1 : 1 + nn]]
            by_type.setdefault(name, []).append(conn)
            tags_by_type.setdefault(name, []).append(phys)
    return nodes, by_type, tags_by_type


class _BinReader:
    """Typed cursor over the raw bytes of a binary .msh section."""

    def __init__(self, data: bytes, off: int, dsize: int, bo: str):
        self.data = data
        self.o = off
        self._i4 = np.dtype(bo + "i4")
        self._sz = np.dtype(bo + ("u8" if dsize == 8 else "u4"))
        self._f8 = np.dtype(bo + "f8")
        self._dsize = dsize

    def ints(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.data, self._i4, n, self.o)
        self.o += 4 * n
        return a

    def sizes(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.data, self._sz, n, self.o)
        self.o += self._dsize * n
        return a

    def doubles(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.data, self._f8, n, self.o)
        self.o += 8 * n
        return a


def _bin_section(data: bytes, name: bytes) -> int:
    """Byte offset just past the ``$name`` line, or -1 if absent."""
    key = b"$" + name
    j = data.find(key)
    if j < 0:
        return -1
    return data.index(b"\n", j) + 1


def _read_gmsh_v41_binary(data: bytes, dsize: int, bo: str):
    """Binary Gmsh v4.1 $Entities/$Nodes/$Elements (the gmsh default output).

    Format reference: gmsh.info/doc/texinfo/gmsh.html#MSH-file-format —
    binary sections keep the ASCII section markers but store the payload as
    raw ints (4 B), size_t (``dsize`` B) and doubles (8 B) in file byte
    order ``bo``.
    """
    # $Entities: (dim, entity tag) -> first physical tag
    ent_phys: dict[tuple[int, int], int] = {}
    off = _bin_section(data, b"Entities")
    if off >= 0:
        r = _BinReader(data, off, dsize, bo)
        counts = [int(x) for x in r.sizes(4)]  # points curves surf vol
        for dim, cnt in enumerate(counts):
            for _ in range(cnt):
                tag = int(r.ints(1)[0])
                r.doubles(3 if dim == 0 else 6)  # point xyz | bbox
                n_phys = int(r.sizes(1)[0])
                phys = r.ints(n_phys)
                ent_phys[(dim, tag)] = int(phys[0]) if n_phys else 0
                if dim > 0:
                    nb = int(r.sizes(1)[0])  # bounding entities
                    r.ints(nb)

    off = _bin_section(data, b"Nodes")
    if off < 0:
        msg = "binary .msh: no $Nodes section"
        raise ValueError(msg)
    r = _BinReader(data, off, dsize, bo)
    n_blocks, n_nodes, _min_t, max_t = (int(x) for x in r.sizes(4))
    nodes = np.zeros((n_nodes, 3))
    tag_to_idx = np.full(max_t + 1, -1, np.int64)
    pos = 0
    for _ in range(n_blocks):
        edim, _etag, parametric = (int(x) for x in r.ints(3))
        n_in = int(r.sizes(1)[0])
        tags = r.sizes(n_in).astype(np.int64)
        coords = r.doubles(3 * n_in).reshape(n_in, 3)
        if parametric:
            r.doubles(edim * n_in)  # parametric coords, unused
        nodes[pos : pos + n_in] = coords
        tag_to_idx[tags] = np.arange(pos, pos + n_in)
        pos += n_in

    off = _bin_section(data, b"Elements")
    if off < 0:
        msg = "binary .msh: no $Elements section"
        raise ValueError(msg)
    r = _BinReader(data, off, dsize, bo)
    n_blocks, _n_elems, _mn, _mx = (int(x) for x in r.sizes(4))
    by_type: dict[str, list] = {}
    tags_by_type: dict[str, list] = {}
    for _ in range(n_blocks):
        ent_dim, ent_tag, etype = (int(x) for x in r.ints(3))
        n_in = int(r.sizes(1)[0])
        if etype not in _GMSH_TYPES:
            nn = _GMSH_SKIP_NODES.get(etype)
            if nn is None:
                msg = f"binary .msh: unknown element type {etype}"
                raise ValueError(msg)
            r.sizes(n_in * (1 + nn))
            continue
        name, nn = _GMSH_TYPES[etype]
        rows = r.sizes(n_in * (1 + nn)).astype(np.int64).reshape(n_in, 1 + nn)
        conn = tag_to_idx[rows[:, 1:]]
        phys = ent_phys.get((ent_dim, ent_tag), 0)
        by_type.setdefault(name, []).extend(conn.tolist())
        tags_by_type.setdefault(name, []).extend([phys] * n_in)
    return nodes, by_type, tags_by_type


def _read_physical_names_binary(data: bytes) -> dict[tuple[int, int], str]:
    """$PhysicalNames stays ASCII even inside binary .msh files."""
    off = _bin_section(data, b"PhysicalNames")
    if off < 0:
        return {}
    end = data.index(b"$EndPhysicalNames", off)
    lines = data[off:end].decode().strip().splitlines()
    names: dict[tuple[int, int], str] = {}
    for ln in lines[1 : 1 + int(lines[0])]:
        parts = ln.split(maxsplit=2)
        names[(int(parts[0]), int(parts[1]))] = parts[2].strip().strip('"')
    return names


def read_gmsh(path) -> Mesh:
    """Read an ASCII Gmsh ``.msh`` file (v2.2 or v4.1; highest-dimension
    cells only).

    Physical groups become ``mesh.cell_sets``: a dict mapping each physical
    id (and its ``$PhysicalNames`` name, when present) to the cell indices
    carrying that tag — the analog of the dolfinx cell tags the reference
    uses to assign per-region laws (reference solver/_lawonsubmesh.py).
    Use them directly as the law cell arrays::

        mesh = read_gmsh("bar.msh")
        laws = [(steel, mesh.cell_sets["steel"]), (foam, mesh.cell_sets["foam"])]
    """
    with open(path, "rb") as f:
        data = f.read()
    j = data.find(b"$MeshFormat")
    if j < 0:
        msg = f"{path}: not a Gmsh .msh file (no $MeshFormat)"
        raise ValueError(msg)
    hdr_start = data.index(b"\n", j) + 1
    hdr_end = data.index(b"\n", hdr_start)
    fmt = data[hdr_start:hdr_end].split()
    version, is_binary, dsize = fmt[0].decode(), int(fmt[1]), int(fmt[2])
    if is_binary:
        # gmsh writes binary v4.1 by default ("gmsh -3 x.geo"); v2.2 binary
        # is legacy-only and not supported here
        if not version.startswith("4"):
            msg = (
                f"{path}: binary .msh v{version} not supported "
                "(use binary v4.1 or any ASCII version)"
            )
            raise ValueError(msg)
        # endianness probe: the binary int 1 follows the format line
        one_le = int.from_bytes(data[hdr_end + 1 : hdr_end + 5], "little")
        bo = "<" if one_le == 1 else ">"
        names = _read_physical_names_binary(data)
        nodes, by_type, tags_by_type = _read_gmsh_v41_binary(data, dsize, bo)
    else:
        text = data.decode()
        names = _read_physical_names(_Scanner(text=text))
        if version.startswith("2"):
            nodes, by_type, tags_by_type = _read_gmsh_v22(_Scanner(text=text))
        elif version.startswith("4"):
            nodes, by_type, tags_by_type = _read_gmsh_v41(_Scanner(text=text))
        else:
            msg = f"{path}: unsupported .msh version {version} (use 2.2 or 4.1)"
            raise ValueError(msg)

    cell_type = max(by_type, key=lambda t: _DIM_RANK[t])
    perm = _FROM_GMSH_PERM[cell_type]
    cells = np.asarray(by_type[cell_type], np.int32)[:, perm]
    tags = np.asarray(tags_by_type[cell_type], np.int64)

    cell_sets: dict = {}
    dim = _DIM_RANK[cell_type]
    for t in np.unique(tags):
        if t == 0:
            continue
        idx = np.nonzero(tags == t)[0].astype(np.int32)
        cell_sets[int(t)] = idx
        if (dim, int(t)) in names:
            cell_sets[names[(dim, int(t))]] = idx

    gdim = dim
    # drop trailing zero coordinate axes beyond the topological dimension
    return Mesh(
        np.ascontiguousarray(nodes[:, :gdim]),
        cells,
        cell_type,
        cell_sets=cell_sets or None,
    )


def write_gmsh(path, mesh: Mesh) -> None:
    """Write an ASCII Gmsh v2.2 ``.msh`` file.

    ``mesh.cell_sets`` (int-keyed entries) become per-cell physical tags;
    str-keyed entries whose indices match an int set become $PhysicalNames
    — so material regions round-trip through write_gmsh/read_gmsh.
    """
    inv = np.argsort(_FROM_GMSH_PERM[mesh.cell_type])
    etype = _GMSH_IDS[mesh.cell_type]
    tags, names = _cell_tags_and_names(mesh)
    dim = _DIM_RANK[mesh.cell_type]
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        if names:
            f.write(f"$PhysicalNames\n{len(names)}\n")
            for ik, nm in sorted(names.items()):
                f.write(f'{dim} {ik} "{nm}"\n')
            f.write("$EndPhysicalNames\n")
        f.write(f"$Nodes\n{mesh.num_nodes}\n")
        for k, p in enumerate(mesh.nodes):
            xyz = list(p) + [0.0] * (3 - mesh.gdim)
            f.write(f"{k + 1} {xyz[0]} {xyz[1]} {xyz[2]}\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{mesh.num_cells}\n")
        for k, c in enumerate(mesh.cells):
            conn = " ".join(str(int(c[j]) + 1) for j in inv)
            f.write(f"{k + 1} {etype} 2 {tags[k]} 0 {conn}\n")
        f.write("$EndElements\n")


def _cell_tags_and_names(mesh: Mesh) -> tuple[np.ndarray, dict[int, str]]:
    """Per-cell physical tags + id -> name map from ``mesh.cell_sets``."""
    tags = np.zeros(mesh.num_cells, np.int64)
    names: dict[int, str] = {}
    if mesh.cell_sets:
        for key, idx in mesh.cell_sets.items():
            if isinstance(key, int):
                tags[np.asarray(idx)] = key
        for key, idx in mesh.cell_sets.items():
            if isinstance(key, str):
                for ik, iidx in mesh.cell_sets.items():
                    if isinstance(ik, int) and np.array_equal(iidx, idx):
                        names[ik] = key
                        break
    return tags, names


def write_gmsh41_binary(path, mesh: Mesh) -> None:
    """Write a BINARY Gmsh v4.1 ``.msh`` file (gmsh's default output format).

    One entity per physical tag (``mesh.cell_sets`` int keys; untagged cells
    go to a physical-free entity), one node block, one element block per
    entity — the same structure ``read_gmsh`` parses back, so physical
    groups and names round-trip.
    """
    import struct

    dim = _DIM_RANK[mesh.cell_type]
    etype = _GMSH_IDS[mesh.cell_type]
    inv = np.argsort(_FROM_GMSH_PERM[mesh.cell_type])
    tags, names = _cell_tags_and_names(mesh)

    def sz(*vals):  # size_t = 8 bytes little-endian
        return struct.pack(f"<{len(vals)}Q", *vals)

    def i4(*vals):
        return struct.pack(f"<{len(vals)}i", *vals)

    pts3 = np.zeros((mesh.num_nodes, 3))
    pts3[:, : mesh.gdim] = mesh.nodes
    lo, hi = pts3.min(axis=0), pts3.max(axis=0)

    ent_tags = sorted({int(t) for t in np.unique(tags)})
    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n4.1 1 8\n")
        f.write(struct.pack("<i", 1))
        f.write(b"\n$EndMeshFormat\n")
        if names:
            f.write(f"$PhysicalNames\n{len(names)}\n".encode())
            for ik, nm in sorted(names.items()):
                f.write(f'{dim} {ik} "{nm}"\n'.encode())
            f.write(b"$EndPhysicalNames\n")

        # one entity of the cell dimension per physical tag (counts are
        # numPoints numCurves numSurfaces numVolumes)
        counts = [0, 0, 0, 0]
        counts[dim] = len(ent_tags)
        f.write(b"$Entities\n")
        f.write(sz(*counts))
        for t in ent_tags:
            f.write(i4(t if t != 0 else len(ent_tags) + 1))
            f.write(struct.pack("<6d", *lo, *hi))
            if t != 0:
                f.write(sz(1))
                f.write(i4(t))
            else:
                f.write(sz(0))
            f.write(sz(0))  # no bounding entities
        f.write(b"\n$EndEntities\n")

        f.write(b"$Nodes\n")
        f.write(sz(1, mesh.num_nodes, 1, mesh.num_nodes))
        ent0 = ent_tags[0] if ent_tags[0] != 0 else len(ent_tags) + 1
        f.write(i4(dim, ent0, 0))
        f.write(sz(mesh.num_nodes))
        f.write(np.arange(1, mesh.num_nodes + 1, dtype="<u8").tobytes())
        f.write(pts3.astype("<f8").tobytes())
        f.write(b"\n$EndNodes\n")

        f.write(b"$Elements\n")
        f.write(sz(len(ent_tags), mesh.num_cells, 1, mesh.num_cells))
        conn_g = mesh.cells[:, inv].astype(np.int64) + 1
        for t in ent_tags:
            idx = np.nonzero(tags == t)[0]
            f.write(i4(dim, t if t != 0 else len(ent_tags) + 1, etype))
            f.write(sz(len(idx)))
            rows = np.empty((len(idx), 1 + conn_g.shape[1]), "<u8")
            rows[:, 0] = idx + 1  # element tags (values unused on read)
            rows[:, 1:] = conn_g[idx]
            f.write(rows.tobytes())
        f.write(b"\n$EndElements\n")


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
