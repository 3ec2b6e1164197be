"""Windowed exchange engine: fast gather/scatter for GENERAL unstructured meshes.

Why this exists: the reference (via dolfinx) treats arbitrary imported meshes
as its bread-and-butter workload (reference solver/_solver.py:30-159 is
mesh-agnostic; tests/solver/test_solver_mpi.py:97 runs unstructured-partitioned
cubes). On TPU the packed engine's two index ops — the element dof gather
``u[dofmap_t]`` and the assembly gather ``flat[gather_idx].sum(1)`` — lower to
scalarized XLA gathers at ~54 ns/row (measured, scripts/profile_gather.py),
putting a 1M-QP Newton step at ~29.8 s. TPUs have no fast arbitrary gather;
they have an MXU. This module converts the irregular exchange into dense
contractions:

1.  **Reverse Cuthill-McKee** orders the dof-nodes so every cell's nodes span
    a narrow index window (the mesh bandwidth).
2.  Nodes are split into **tiles of T**; each cell is assigned to a tile-block
    whose **window** ``[b*T, b*T + W)`` (W = small multiple of T) covers all
    its nodes. A greedy rebalance over the feasible block range keeps the
    per-block cell padding low.
3.  Per block, the local gather becomes a **two-level one-hot select** over
    the window: a one-hot contraction over W1 = W/W2 window sub-tiles (MXU
    matmul) followed by a one-hot select over W2 lanes (VPU multiply-sum).
    Both masks are 0/1 so the result is exact. The scatter (assembly) is the
    transpose contraction; because block b's window starts at tile b, the
    cross-block combine is a static shift-and-add — **no scatter op exists
    anywhere in the hot path**.

The contraction runs as a fused Pallas TPU kernel (masks live only in VMEM;
HBM traffic is indices + node values + cell values) with a pure-XLA fallback
(naive take / scatter-add over the same plan) for CPU and testing.

Layouts follow the packed engine (ops/packed.py): component axes leading, one
flat minor axis (nodes or QPs). The internal dof vector of this engine is
component-major ``idx = comp * M_pad + rcm_node`` — the unstructured analog of
the structured engine's grid-major vectors.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "reverse_cuthill_mckee",
    "WindowedExchange",
    "build_windowed_exchange",
]


def reverse_cuthill_mckee(cell_nodes: np.ndarray, n_nodes: int) -> np.ndarray:
    """RCM ordering of the node graph induced by shared-cell adjacency.

    Returns ``perm_old2new`` with ``perm_old2new[old_id] = new_id``; the new
    numbering has small bandwidth ``max |new(a) - new(b)|`` over cell edges.
    Host-side, runs once per mesh. Handles disconnected components.
    """
    C, n = cell_nodes.shape
    # undirected edge list: all node pairs within a cell
    ii, jj = np.triu_indices(n, k=1)
    a = cell_nodes[:, ii].reshape(-1)
    b = cell_nodes[:, jj].reshape(-1)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    edges = np.unique(lo.astype(np.int64) * n_nodes + hi)
    lo = (edges // n_nodes).astype(np.int64)
    hi = (edges % n_nodes).astype(np.int64)
    # CSR adjacency (both directions)
    src = np.concatenate([lo, hi])
    dst = np.concatenate([hi, lo])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n_nodes)
    starts = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    degree = counts

    # neighbors of each node pre-sorted by (degree, id) so the BFS append is
    # just a filtered slice
    key = degree[dst] * np.int64(n_nodes) + dst
    for v in range(n_nodes):
        s, e = starts[v], starts[v + 1]
        sub = np.argsort(key[s:e], kind="stable")
        dst[s:e] = dst[s:e][sub]

    visited = np.zeros(n_nodes, bool)
    order_new = np.empty(n_nodes, np.int64)
    pos = 0
    remaining = np.argsort(degree, kind="stable")  # component seeds by degree
    seed_ptr = 0
    while pos < n_nodes:
        while visited[remaining[seed_ptr]]:
            seed_ptr += 1
        root = remaining[seed_ptr]
        visited[root] = True
        order_new[pos] = root
        head, pos = pos, pos + 1
        while head < pos:
            v = order_new[head]
            head += 1
            nbrs = dst[starts[v] : starts[v + 1]]
            new = nbrs[~visited[nbrs]]
            if len(new):
                # dedup while keeping the degree-sorted order
                _, first = np.unique(new, return_index=True)
                new = new[np.sort(first)]
                visited[new] = True
                order_new[pos : pos + len(new)] = new
                pos += len(new)
    order_new = order_new[::-1]  # the "reverse" in RCM
    perm = np.empty(n_nodes, np.int64)
    perm[order_new] = np.arange(n_nodes)
    return perm


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _Static:
    """Identity-hashable holder for host-side numpy plan arrays, so they can
    sit in a registered dataclass's meta fields (treedefs hash/compare meta)."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = np.asarray(a)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["loc"],
    meta_fields=[
        "T", "W", "W1", "W2", "P", "B", "C_B", "n", "M", "M_pad",
        "n_cells", "_perm", "_cell_order", "pad_ratio",
    ],
)
@dataclass(frozen=True)
class WindowedExchange:
    """Blocked exchange plan between node rows ``[K, M_pad]`` and cell-local
    rows ``[B, K, n * C_B]`` (node-slot-major within a block: row = a*C_B+r).

    loc: [B, n * C_B] int32 — window-local node index of each (slot, cell)
        row, -1 for padded cells (one-hot of -1 is all-zero: reads give 0,
        writes drop).
    perm / cell_order: host-side numpy (old node -> RCM id; plan cell slot ->
        original cell id, -1 padding).
    """

    loc: jnp.ndarray
    T: int
    W: int
    W1: int
    W2: int
    P: int
    B: int
    C_B: int
    n: int
    M: int
    M_pad: int
    n_cells: int
    _perm: _Static
    _cell_order: _Static
    pad_ratio: float

    @property
    def perm(self) -> np.ndarray:
        """old node id -> RCM id (host-side numpy)."""
        return self._perm.a

    @property
    def cell_order(self) -> np.ndarray:
        """plan cell slot -> original cell id (-1 = padding slot)."""
        return self._cell_order.a

    @property
    def C_pad(self) -> int:
        return self.B * self.C_B

    @property
    def Rn(self) -> int:
        return self.n * self.C_B

    # ---- reference (pure-XLA) implementations --------------------------------
    # Semantically identical to the Pallas kernels; used on CPU and to pin the
    # kernels in tests. ``u2`` is [K, M_pad]; cell rows are [B, K, Rn].

    def _global_idx(self) -> jnp.ndarray:
        base = jnp.arange(self.B, dtype=jnp.int32)[:, None] * self.T
        g = self.loc + base  # [B, Rn]; pads map to (base - 1), clamp + mask
        return jnp.where(self.loc >= 0, g, self.M_pad)

    def gather_ref(self, u2: jnp.ndarray) -> jnp.ndarray:
        gi = self._global_idx()  # [B, Rn] in [0, M_pad]
        u_ext = jnp.concatenate(
            [u2, jnp.zeros((u2.shape[0], 1), u2.dtype)], axis=1
        )
        return jnp.transpose(u_ext[:, gi], (1, 0, 2))  # [B, K, Rn]

    def scatter_ref(self, f: jnp.ndarray) -> jnp.ndarray:
        gi = self._global_idx()  # [B, Rn]
        K = f.shape[1]
        out = jnp.zeros((K, self.M_pad + 1), f.dtype)
        out = out.at[:, gi.reshape(-1)].add(
            jnp.transpose(f, (1, 0, 2)).reshape(K, -1)
        )
        return out[:, : self.M_pad]

    # ---- dispatch -------------------------------------------------------------

    @property
    def pallas_ok(self) -> bool:
        """Mosaic requires the u3 block's last two dims be (8k, 128k): the
        node tile must span >= 8 lane sub-tiles (T % (8 * W2) == 0)."""
        return self.W2 % 128 == 0 and self.T % (8 * self.W2) == 0

    def gather(self, u2: jnp.ndarray) -> jnp.ndarray:
        """[K, M_pad] node rows -> [B, K, Rn] cell-local rows."""
        if _use_pallas(u2.dtype) and self.pallas_ok:
            from .pallas_window import windowed_gather

            return windowed_gather(self, u2)
        return self.gather_ref(u2)

    def scatter(self, f: jnp.ndarray) -> jnp.ndarray:
        """[B, K, Rn] cell-local rows -> [K, M_pad] node rows (sum dups)."""
        if _use_pallas(f.dtype) and self.pallas_ok:
            from .pallas_window import windowed_scatter

            return windowed_scatter(self, f)
        return self.scatter_ref(f)

    # ---- layout helpers -------------------------------------------------------

    def cells_to_rows(self, x: jnp.ndarray) -> jnp.ndarray:
        """[n, K, C_pad] (slot-major cell data) -> [B, K, Rn] block rows."""
        n, K, _ = x.shape
        x4 = x.reshape(n, K, self.B, self.C_B)
        return jnp.transpose(x4, (2, 1, 0, 3)).reshape(self.B, K, self.Rn)

    def rows_to_cells(self, r: jnp.ndarray) -> jnp.ndarray:
        """[B, K, Rn] block rows -> [n, K, C_pad]."""
        K = r.shape[1]
        r4 = r.reshape(self.B, K, self.n, self.C_B)
        return jnp.transpose(r4, (2, 1, 0, 3)).reshape(self.n, K, self.C_pad)


def _use_pallas(dtype) -> bool:
    import os

    if os.environ.get("FC_NO_PALLAS_WINDOW"):  # debug: force the XLA path
        return False
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


def build_windowed_exchange(
    cell_nodes: np.ndarray,
    n_nodes: int,
    *,
    tile: int = 1024,
    w2: int = 128,
    max_pad_ratio: float = 4.0,
    perm: np.ndarray | None = None,
) -> WindowedExchange:
    """Build the blocked window plan for ``cell_nodes`` [C, n].

    tile: nodes per block (T); windows are W = ceil((T + span_max)/T) * T.
        The Pallas TPU kernels require tile % (8 * w2) == 0 (Mosaic block
        alignment); other tiles still work through the XLA reference path.
    w2: lane width of the second select level (W2 | W and W2 | T required).
    perm: precomputed node ordering (old -> new), e.g. the whole-mesh RCM
        shared by every law of a multi-material problem so their internal
        vectors coincide; default computes RCM of ``cell_nodes``.
    """
    cell_nodes = np.asarray(cell_nodes, np.int64)
    C, n = cell_nodes.shape
    T = int(tile)
    W2 = int(w2)
    assert T % W2 == 0, "tile must be a multiple of w2"
    if T % (8 * W2) != 0 and _use_pallas(jnp.float32):
        # the plan will silently run through the scalarized-gather XLA
        # reference path on TPU — the ~54 ns/row tax this engine exists to
        # avoid; say so once at build time rather than per dispatch
        import warnings

        warnings.warn(
            f"windowed exchange: tile={T} is not a multiple of 8*w2={8 * W2};"
            " the Pallas TPU kernels are disabled for this plan and"
            " gather/scatter fall back to the slow XLA reference path."
            " Use tile % (8*w2) == 0 (e.g. tile=1024) for the fast kernels.",
            stacklevel=2,
        )

    if perm is None:
        perm = reverse_cuthill_mckee(cell_nodes, n_nodes)
    else:
        perm = np.asarray(perm, np.int64)
    cn = perm[cell_nodes]  # [C, n] RCM-relabelled
    lo = cn.min(axis=1)
    hi = cn.max(axis=1)
    span_max = int((hi - lo).max()) + 1 if C else 1

    M = n_nodes
    B = _round_up(M, T) // T
    M_pad = B * T
    P = 1 + -(-span_max // T)  # window covers P tiles
    P = min(P, B)
    W = P * T
    W1 = W // W2

    # feasible block range per cell: window [bT, bT+W) must contain [lo, hi]
    b_hi = lo // T
    b_lo = np.maximum(0, (hi - W) // T + 1)
    b_hi = np.minimum(b_hi, B - 1)

    # greedy balance: sweep cells by lo; within each b_hi group, spill to the
    # least-filled feasible earlier block
    counts = np.zeros(B, np.int64)
    assign = np.empty(C, np.int64)
    order = np.argsort(lo, kind="stable")
    for c in order:
        blo, bhi = int(b_lo[c]), int(b_hi[c])
        seg = counts[blo : bhi + 1]
        k = int(np.argmin(seg))  # earliest least-filled feasible block
        assign[c] = blo + k
        counts[blo + k] += 1

    # round the block capacity so Rn = n*C_B tiles into lane-aligned row
    # chunks for the Pallas kernels (see ops/pallas_window._row_tile)
    C_B = _round_up(max(int(counts.max()), 1), 128)
    pad_ratio = (B * C_B) / max(C, 1)
    if pad_ratio > max_pad_ratio:
        import warnings

        warnings.warn(
            f"windowed exchange: block padding ratio {pad_ratio:.2f} "
            f"(B={B} x C_B={C_B} slots for {C} cells) — the mesh ordering "
            "bunches cells; expect wasted compute. Consider a different "
            "tile size.",
            stacklevel=2,
        )

    # slot table: block-major, node-slot-major rows (row = a*C_B + r).
    # Vectorized fill: group cells by block (stable in lo-order), slot r =
    # rank within the group.
    grp = np.argsort(assign[order], kind="stable")
    cells_grouped = order[grp]  # cells sorted by (block, lo)
    blocks_sorted = assign[cells_grouped]
    group_start = np.searchsorted(blocks_sorted, np.arange(B))
    r_in_block = np.arange(C) - group_start[blocks_sorted]
    slot = blocks_sorted * C_B + r_in_block  # [C] flat (b, r) slot

    cell_order = np.full(B * C_B, -1, np.int64)
    cell_order[slot] = cells_grouped

    loc = np.full((B, n, C_B), -1, np.int32)
    base = (blocks_sorted * T)[:, None]
    loc[blocks_sorted, :, r_in_block] = (cn[cells_grouped] - base).astype(
        np.int32
    )
    loc = loc.reshape(B, n * C_B)

    assert loc.max() < W and (loc >= -1).all()

    return WindowedExchange(
        loc=jnp.asarray(loc),
        T=T, W=W, W1=W1, W2=W2, P=P, B=B, C_B=C_B, n=n,
        M=M, M_pad=M_pad, n_cells=C,
        _perm=_Static(perm), _cell_order=_Static(cell_order),
        pad_ratio=float(pad_ratio),
    )


# =============================================================================
# WindowedGeometry: the general-unstructured-mesh production engine
# =============================================================================


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ex", "dN", "w", "perm_dev", "invperm_dev", "slot_of_cell"],
    meta_fields=["n_qp", "n_nodes", "vs", "ndofs", "M", "n_cells", "constraint"],
)
@dataclass(frozen=True)
class WindowedGeometry:
    """SoA geometry for GENERAL (imported/unstructured) meshes on TPU.

    Same solver-facing interface as ops.packed.PackedGeometry, but every
    irregular index op runs through the windowed exchange (MXU one-hot
    contractions; ops/pallas_window.py) instead of scalarized XLA gathers.
    QP fields are stored q-major over the plan's PADDED sorted cell order
    (``N = n_qp * ex.C_pad``; padded slots carry zero weights/gradients).

    The engine's internal dof vector is component-major over RCM-permuted,
    tile-padded nodes: ``idx = comp * M_pad + rcm_node`` — the unstructured
    analog of the structured engine's grid-major layout. ``to_internal`` /
    ``from_internal`` convert at the Newton-step boundary (solver/packed_step
    keeps the whole Krylov loop internal).

    Mirrors the reference's mesh-agnostic solver core
    (reference src/fenics_constitutive/solver/_solver.py:30-159).
    """

    ex: WindowedExchange
    dN: jnp.ndarray  # [n, g, N] physical shape-fn gradients (0 on pads)
    w: jnp.ndarray  # [N] quadrature weight x |detJ| (0 on pads)
    perm_dev: jnp.ndarray  # [M] old node -> rcm id
    invperm_dev: jnp.ndarray  # [M] rcm id -> old node
    slot_of_cell: jnp.ndarray  # [n_cells] original (subset) cell -> plan slot
    n_qp: int
    n_nodes: int  # nodes per cell
    vs: int
    ndofs: int  # EXTERNAL dof count (= n_dof_nodes * vs of the space)
    M: int  # dof-nodes of the space
    n_cells: int  # true (unpadded) cell count of this law's block
    constraint: "object"

    @property
    def N(self) -> int:
        return self.n_qp * self.ex.C_pad

    @property
    def ndofs_int(self) -> int:
        return self.vs * self.ex.M_pad

    def qp_shape(self, k: int) -> tuple:
        return (k, self.N)

    # ---- boundary transforms -------------------------------------------------

    def to_internal(self, u: jnp.ndarray) -> jnp.ndarray:
        """External node-major [ndofs] -> internal [vs * M_pad]."""
        u2 = u.reshape(self.M, self.vs).T  # [vs, M]
        out = jnp.zeros((self.vs, self.ex.M_pad), u.dtype)
        out = out.at[:, : self.M].set(u2[:, self.invperm_dev])
        return out.reshape(-1)

    def from_internal(self, ui: jnp.ndarray) -> jnp.ndarray:
        """Internal [vs * M_pad] -> external node-major [ndofs]."""
        u2 = ui.reshape(self.vs, self.ex.M_pad)
        return u2[:, self.perm_dev].T.reshape(-1)

    def bc_internal(self, bc_dofs: jnp.ndarray) -> jnp.ndarray:
        node = bc_dofs // self.vs
        comp = bc_dofs % self.vs
        return comp * self.ex.M_pad + self.perm_dev[node]

    def free_internal(self, bc_dofs: jnp.ndarray) -> jnp.ndarray:
        """True on real, non-Dirichlet internal slots (pads excluded)."""
        valid = jnp.zeros(self.ex.M_pad, bool).at[: self.M].set(True)
        free = jnp.tile(valid, self.vs)
        return free.at[self.bc_internal(bc_dofs)].set(False)

    # ---- kinematics / assembly (internal layout) ------------------------------
    # The tiny-dim contractions (n<=10 nodes, g=vs<=3, s<=6) are UNROLLED at
    # trace time into elementwise [N] multiply-adds instead of jnp.einsum:
    # on TPU, einsum lowers to dot_general whose default precision is bf16
    # multiplies — enough operator error to stall the outer Newton at
    # r/r0 ~1e-2 (measured on v5e, scripts/bench_unstructured.py) — while
    # "highest" costs 6 MXU passes. Unrolled VPU sums are full-f32 at
    # default precision and carry no such tax. The Mandel map T[s, i, j]
    # (ops/mandel._mandel_matrix_map) is a host constant with exactly one
    # nonzero slot s per tensor component (i, j), so both directions unroll
    # to one scaled term per component.

    def _mandel_np(self):
        from . import mandel

        return mandel._mandel_matrix_map(self.constraint)  # np [s, g, g]

    def _u_cells(self, ui: jnp.ndarray) -> jnp.ndarray:
        rows = self.ex.gather(ui.reshape(self.vs, self.ex.M_pad))
        return self.ex.rows_to_cells(rows)  # [n, vs, C_pad]

    def _dN(self, a: int, i: int) -> jnp.ndarray:
        """Physical gradient channel [N]. Affine elements (P1 simplices)
        store dN compactly as [n, g, C_pad] — identical for every QP of a
        cell — and broadcast here (free under XLA fusion); this quarters
        the dN HBM stream of every matvec/eval and the one-time device
        upload (which matters through slow tunnels)."""
        d = self.dN[a, i]
        if d.shape[0] == self.N:
            return d
        return jnp.broadcast_to(
            d[None, :], (self.n_qp, self.ex.C_pad)
        ).reshape(-1)

    def strain(self, du: jnp.ndarray) -> jnp.ndarray:
        """Internal [vs*M_pad] -> Mandel strain [s, N]."""
        u_e = self._u_cells(du)
        n, vs = self.n_nodes, self.vs
        u_eN = jnp.broadcast_to(
            u_e[:, :, None, :], (n, vs, self.n_qp, self.ex.C_pad)
        ).reshape(n, vs, self.N)
        T = self._mandel_np()
        s, g = T.shape[0], T.shape[1]
        # grad[i, j] = sum_n dN[n, i] * u[n, j] (unrolled over n)
        grad = {}
        for i in range(g):
            for j in range(vs):
                acc = self._dN(0, i) * u_eN[0, j]
                for a in range(1, n):
                    acc = acc + self._dN(a, i) * u_eN[a, j]
                grad[i, j] = acc
        rows = []
        for si in range(s):
            terms = [
                (T[si, i, j], grad[i, j])
                for i in range(g)
                for j in range(g)
                if T[si, i, j] != 0.0
            ]
            if not terms:  # plane-constraint zz slot: no 2D image
                rows.append(jnp.zeros(self.N, du.dtype))
                continue
            acc = None
            for c, gij in terms:
                t = gij if c == 1.0 else jnp.asarray(c, du.dtype) * gij
                acc = t if acc is None else acc + t
            rows.append(acc)
        return jnp.stack(rows, axis=0)

    def residual(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """Mandel stress [s, N] -> internal residual [vs*M_pad]."""
        T = self._mandel_np()
        g = T.shape[1]
        n, vs = self.n_nodes, self.vs
        # sig_t[i, j] = w * sum_s T[s, i, j] sigma[s]: exactly one s per (i, j)
        sig_t = {}
        for i in range(g):
            for j in range(g):
                (si,) = [
                    si for si in range(T.shape[0]) if T[si, i, j] != 0.0
                ] or (None,)
                if si is None:
                    sig_t[i, j] = None
                    continue
                c = T[si, i, j]
                v = sigma[si] if c == 1.0 else jnp.asarray(
                    c, sigma.dtype
                ) * sigma[si]
                sig_t[i, j] = v * self.w
        cols = []
        for a in range(n):
            for j in range(vs):
                acc = None
                for i in range(g):
                    if sig_t[i, j] is None:
                        continue
                    t = self._dN(a, i) * sig_t[i, j]
                    acc = t if acc is None else acc + t
                cols.append(
                    acc.reshape(self.n_qp, self.ex.C_pad).sum(axis=0)
                )
        f_e = jnp.stack(cols, axis=0).reshape(n, vs, self.ex.C_pad)
        return self.ex.scatter(self.ex.cells_to_rows(f_e)).reshape(-1)

    def matvec(self, v: jnp.ndarray, tangent) -> jnp.ndarray:
        return self.residual(tangent.apply(self.strain(v)))

    def jacobi_diag(self, tangent) -> jnp.ndarray:
        T = self._mandel_np()
        s = T.shape[0]
        dtype = self.w.dtype
        zero = jnp.zeros(self.N, dtype)
        cols = []
        for a in range(self.n_nodes):
            # B_a[s, j] = sum_i T[s, i, j] dN[a, i] (unrolled host constants)
            brows = []
            for si in range(s):
                row = []
                for j in range(self.vs):
                    acc = None
                    for i in range(T.shape[1]):
                        c = T[si, i, j]
                        if c == 0.0:
                            continue
                        t = self._dN(a, i) if c == 1.0 else jnp.asarray(
                            c, dtype
                        ) * self._dN(a, i)
                        acc = t if acc is None else acc + t
                    row.append(zero if acc is None else acc)
                brows.append(jnp.stack(row, axis=0))
            B_a = jnp.stack(brows, axis=0)  # [s, vs, N]
            q = tangent.quad_diag(B_a)  # [vs, N]
            contrib = (q * self.w).reshape(
                self.vs, self.n_qp, self.ex.C_pad
            ).sum(axis=1)
            cols.append(contrib)
        d_e = jnp.stack(cols, axis=0)  # [n, vs, C_pad]
        return self.ex.scatter(self.ex.cells_to_rows(d_e)).reshape(-1)

    # ---- observation -----------------------------------------------------------

    def extract_cells(self, field: jnp.ndarray) -> jnp.ndarray:
        """QP field [k, N] -> [k, Q, n_cells] in original (subset) cell order."""
        k = field.shape[0]
        f = field.reshape(k, self.n_qp, self.ex.C_pad)
        return f[:, :, self.slot_of_cell]


def build_windowed_geometry(
    space,
    q_degree: int,
    constraint,
    cells: np.ndarray | None = None,
    dtype=None,
    *,
    tile: int = 1024,
    perm: np.ndarray | None = None,
) -> WindowedGeometry:
    """Tabulate windowed SoA geometry (host-side, once per mesh/law).

    ``perm``: optional shared whole-mesh RCM ordering (multi-material).
    """
    from ..fem.elements import tabulate_element
    from ..fem.kinematics import _geometry_grad_at

    dtype = dtype or jnp.result_type(float)
    mesh = space.mesh
    elem, quad = tabulate_element(mesh.cell_type, space.degree, q_degree)
    cell_ids = np.arange(mesh.num_cells) if cells is None else np.asarray(cells)
    C = len(cell_ids)
    Q = quad.points.shape[0]

    cell_nodes = space.cell_dof_nodes[cell_ids]  # [C, n] dof-node ids
    M = space.n_dof_nodes
    ex = build_windowed_exchange(cell_nodes, M, tile=tile, perm=perm)

    verts = mesh.nodes[mesh.cells[cell_ids]]
    geom_dN = _geometry_grad_at(mesh.cell_type, quad.points)  # [Q, nv, r]
    J = np.einsum("cvi,qvj->cqij", verts, geom_dN)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)
    dN_dx = np.einsum("qaj,cqji->cqai", elem.dN_dxi, Jinv)  # [C, Q, n, g]
    w = quad.weights[None, :] * detJ  # [C, Q]

    n = elem.N.shape[1]
    g = dN_dx.shape[3]
    co = ex.cell_order  # [C_pad] -> subset index or -1
    valid = co >= 0
    dN_pad = np.zeros((ex.C_pad, Q, n, g))
    dN_pad[valid] = dN_dx[co[valid]]
    w_pad = np.zeros((ex.C_pad, Q))
    w_pad[valid] = w[co[valid]]

    slot_of_cell = np.empty(C, np.int64)
    slot_of_cell[co[valid]] = np.nonzero(valid)[0]

    # q-major flat: N index = q * C_pad + slot
    from ..utils import to_device

    # affine elements (P1 simplices): dN identical across a cell's QPs —
    # store ONE copy per cell ([n, g, C_pad]); WindowedGeometry._dN
    # broadcasts it on device (exact bitwise equality check, not a
    # tolerance: affine tabulation reuses the same Jinv per q)
    if Q > 1 and bool((dN_pad == dN_pad[:, :1]).all()):
        dN_j = to_device(dN_pad[:, 0].transpose(1, 2, 0), dtype)
    else:
        dN_j = to_device(dN_pad.transpose(2, 3, 1, 0).reshape(n, g, -1), dtype)
    w_j = to_device(w_pad.T.reshape(-1), dtype)

    inv = np.argsort(ex.perm)
    return WindowedGeometry(
        ex=ex,
        dN=dN_j,
        w=w_j,
        perm_dev=to_device(ex.perm, jnp.int32),
        invperm_dev=to_device(inv, jnp.int32),
        slot_of_cell=to_device(slot_of_cell, jnp.int32),
        n_qp=Q,
        n_nodes=n,
        vs=space.value_size,
        ndofs=space.ndofs,
        M=M,
        n_cells=C,
        constraint=constraint,
    )
