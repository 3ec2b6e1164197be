"""Windowed block-sparse (BSR) matvec: TPU-fast SpMV for AMG levels.

The smoothed-aggregation AMG (solver/amg.py) freezes its level operators
into ELL arrays whose apply is ``(vals * v[cols]).sum(1)`` — a scalarized
XLA gather on TPU, the same ~54 ns/row tax as the old unstructured element
gather (docs/performance.md). This module applies the windowed-exchange
idea (ops/windowed.py) to sparse matrices:

* rows and columns are grouped into NODES of ``br``/``bc`` dofs (3 for the
  fine elastic operator, the rigid-mode count for coarse levels);
* row-nodes and col-nodes are each put in a banded order (the mesh RCM for
  the fine level; aggregate-of-min-fine-node order for coarse levels), so
  each row's block-columns span a narrow window;
* fixed row tiles of ``T_r`` row-nodes read their column window as shifted
  128-wide sub-tile views (scalar-prefetched window starts), and the
  column select is the same two-level one-hot contraction as the element
  gather — MXU + VPU, masks only in VMEM, exact;
* each row-tile owns its output rows: NO scatter exists (unlike the
  element engine, SpMV needs no transpose pass).

Vector layout: component-major over permuted nodes, ``x[j*Nc + cnode]``
(the windowed engine's internal layout). The fine level can therefore run
directly on WindowedGeometry internal vectors when built with the same
node permutation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import to_device

__all__ = ["WindowedBsr", "build_windowed_bsr"]

_W2 = 128  # column sub-tile width (lane width)
_GRAN = 8 * _W2  # column window granule: Mosaic blocks need >= 8 sub-tiles


def _round_up(x: int, m: int) -> int:
    return -(-max(x, 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["loc", "vals", "jb"],
    meta_fields=["br", "bc", "k", "T_r", "P", "B", "n_rnodes", "n_cnodes",
                 "NR_pad", "NC_pad", "select_passes"],
)
@dataclass(frozen=True)
class WindowedBsr:
    """y[br * NR_pad] = A @ x[bc * NC_pad], component-major node layouts.

    loc:  [B, k, T_r] int32 window-local col-node index per slot (-1 pad)
    vals: [B, k * br * bc, T_r] block entries, slot-major then (jr, jc)
    jb:   [B] int32 window start in 1024-col-node granules (``_GRAN``)
    """

    loc: jnp.ndarray
    vals: jnp.ndarray
    jb: jnp.ndarray
    br: int
    bc: int
    k: int
    T_r: int
    P: int
    B: int
    n_rnodes: int
    n_cnodes: int
    NR_pad: int
    NC_pad: int
    #: bf16 split depth of the Pallas column select: 3 = exact f32
    #: (default), 1 = bf16-rounded x at a third of the MXU cost (AMG
    #: preconditioner levels; see pallas_window.windowed_bsr_matvec)
    select_passes: int = 3

    @property
    def n_rows(self) -> int:
        return self.br * self.n_rnodes

    @property
    def n_cols(self) -> int:
        return self.bc * self.n_cnodes

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [bc * NC_pad] -> y [br * NR_pad] (pads zero)."""
        from .windowed import _use_pallas

        if _use_pallas(x.dtype):
            from .pallas_window import windowed_bsr_matvec

            return windowed_bsr_matvec(self, x)
        return self.matvec_ref(x)

    def matvec_ref(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pure-XLA reference (CPU tests): naive take over the same plan."""
        x2 = x.reshape(self.bc, self.NC_pad)
        base = (self.jb * _GRAN)[:, None, None]
        gi = jnp.where(self.loc >= 0, self.loc + base, self.NC_pad)
        x_ext = jnp.concatenate(
            [x2, jnp.zeros((self.bc, 1), x.dtype)], axis=1
        )
        sel = x_ext[:, gi]  # [bc, B, k, T_r]
        v5 = self.vals.reshape(self.B, self.k, self.br, self.bc, self.T_r)
        y = jnp.einsum("bkrcT,cbkT->rbT", v5, sel)  # [br, B, T_r]
        return y.reshape(self.br, self.NR_pad).reshape(-1)


def build_windowed_bsr(
    A,
    br: int,
    bc: int,
    row_perm: np.ndarray | None = None,
    col_perm: np.ndarray | None = None,
    *,
    tile_rows: int = 512,
    n_pad_rows: int | None = None,
    n_pad_cols: int | None = None,
    dtype=None,
    select_passes: int = 3,
) -> WindowedBsr:
    """Freeze a scipy sparse matrix into the windowed BSR plan.

    A: [n_rows, n_cols] with n_rows = br * n_rnodes, n_cols = bc * n_cnodes,
       dofs node-major (dof = node * bs + comp).
    row_perm/col_perm: node orderings old -> new (banded, e.g. RCM);
       identity if None. The RESULT operates on permuted component-major
       vectors (see module docstring).
    """
    import scipy.sparse as sp

    dtype = dtype or jnp.result_type(float)
    A = sp.csr_matrix(A)
    n_rows, n_cols = A.shape
    assert n_rows % br == 0 and n_cols % bc == 0
    NRn, NCn = n_rows // br, n_cols // bc
    rp = np.arange(NRn) if row_perm is None else np.asarray(row_perm)
    cp = np.arange(NCn) if col_perm is None else np.asarray(col_perm)

    # permute to the banded node orders (node-major dof permutation)
    rdof = (np.argsort(rp)[:, None] * br + np.arange(br)).reshape(-1)
    cdof = (np.argsort(cp)[:, None] * bc + np.arange(bc)).reshape(-1)
    Ap = A[rdof][:, cdof].tobsr(blocksize=(br, bc))
    Ap.sort_indices()

    indptr, indices, data = Ap.indptr, Ap.indices, Ap.data  # blocks [nnzb, br, bc]
    nnz_row = np.diff(indptr)
    k = max(1, int(nnz_row.max()))

    T_r = int(tile_rows)
    NR_pad = _round_up(NRn, T_r)
    if n_pad_rows is not None:  # caller-fixed level size (AMG hierarchies)
        assert n_pad_rows >= NR_pad and n_pad_rows % T_r == 0
        NR_pad = n_pad_rows
    B = NR_pad // T_r

    NC_pad = _round_up(NCn, _GRAN)
    if n_pad_cols is not None:
        assert n_pad_cols >= NC_pad and n_pad_cols % _GRAN == 0
        NC_pad = n_pad_cols

    # per-tile window: cover all block-cols of the tile's rows; window
    # starts/extents in 1024-col granules (Mosaic block alignment)
    jb = np.zeros(B, np.int64)
    wmax = 1
    for b in range(B):
        r0, r1 = b * T_r, min((b + 1) * T_r, NRn)
        cols_b = indices[indptr[r0] : indptr[r1]] if r0 < NRn else indices[:0]
        if len(cols_b):
            lo, hi = int(cols_b.min()), int(cols_b.max())
        else:
            lo = hi = 0
        jb[b] = lo // _GRAN
        wmax = max(wmax, hi // _GRAN - jb[b] + 1)
    # clamp windows into the fixed col space (small/dense levels: the
    # window may be the whole col space)
    P = min(int(wmax), NC_pad // _GRAN)
    shift = np.maximum(jb + P - NC_pad // _GRAN, 0)
    jb = jb - shift

    # re-check coverage after the clamp (a shifted window still covers all
    # cols iff the span fits in P sub-tiles; guaranteed when P was clamped
    # to the full col space, re-derivable otherwise)
    loc = np.full((B, k, T_r), -1, np.int32)
    vals = np.zeros((B, k, br, bc, T_r))
    rows = np.repeat(np.arange(NRn), nnz_row)
    pos = np.arange(len(indices)) - indptr[rows]
    b_of = rows // T_r
    t_of = rows % T_r
    loc[b_of, pos, t_of] = (indices - jb[b_of] * _GRAN).astype(np.int32)
    vals[b_of, pos, :, :, t_of] = data
    assert loc.max() < P * _GRAN, "window does not cover a row's columns"
    assert (loc >= -1).all()

    return WindowedBsr(
        loc=jnp.asarray(loc),
        vals=to_device(vals.reshape(B, k * br * bc, T_r), dtype),
        jb=to_device(jb, jnp.int32),
        br=br, bc=bc, k=k, T_r=T_r, P=P, B=B,
        n_rnodes=NRn, n_cnodes=NCn, NR_pad=NR_pad, NC_pad=NC_pad,
        select_passes=select_passes,
    )
