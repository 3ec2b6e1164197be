"""Fused Mosaic kernels for the windowed exchange (ops/windowed.py).

The gather/scatter between node rows ``[K, M]`` and cell-local rows
``[B, K, Rn]`` is expressed as a two-level one-hot select over each block's
node window:

  gather:  out[k, r] = u_win[k, hi[r], lo[r]]
         = sum_hi ( sum_lo u3[k, hi, lo] * mask_lo[lo, r] ) * mask_hi[hi, r]

The MXU level contracts over the LANE axis ``W2 = 128`` (a native MXU
contraction width) with the stacked ``[K * W1, W2]`` window as the other
operand, and the remaining ``W1``-term select runs as a VPU multiply-sum.
The scatter is the transpose contraction with the same orientation
(``mask_lo [W2, RT]`` against ``[W1 * K, RT]`` masked cell rows).

Exactness without the 6-pass f32 tax: the masks are exact 0/1 in bfloat16,
and the f32 VALUES are split into an exact 3-term bfloat16 decomposition
(24 mantissa bits = 3 x 8; `_split3`), so three native bf16 MXU passes with
f32 accumulation reconstruct every selected f32 value bit-exactly — each
output element receives exactly one nonzero product per pass. This is 2x
fewer passes than HIGHEST and runs at native bf16 MXU rate (pinned against
the XLA reference in tests/ops/test_windowed.py and on-chip by
scripts/check_windowed_tpu.py). Sub-2^-133 magnitudes lose bits to bf16
subnormal granularity — physically-zero territory for displacement/residual
fields.

All mask tensors live only in VMEM: HBM traffic is indices + node values +
cell values. The window of block ``b`` starts at node ``b*T``, so the input
window is expressed as P shifted block views of the same array (BlockSpec
offsets must be block-aligned) and the scatter emits per-block partials that
are combined by a static shift-and-add in XLA — no scatter instruction
anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["windowed_gather", "windowed_scatter"]


def _split3(x: jnp.ndarray):
    """Exact 3-term bf16 decomposition of f32: x == h1 + h2 + h3.

    Round-to-nearest bf16 leaves a residual with >= 8 fewer significant
    bits; two rounds cover all 24 f32 mantissa bits. Each partial sum is
    representable in f32, so summing the three one-hot dot results in f32
    reconstructs x exactly (for |x| >= ~2^-130; below that bf16 subnormal
    granularity drops ulps).
    """
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _row_tile(Rn: int) -> int:
    for rt in (2048, 1024, 512, 256, 128):
        if Rn % rt == 0:
            return min(rt, Rn)
    return Rn


def _pad_u3(ex, u2: jnp.ndarray) -> jnp.ndarray:
    """[K, M_pad] -> [K, MT_ext, W2] sub-tile view covering the last window."""
    K = u2.shape[0]
    ext = (ex.B + ex.P - 1) * ex.T - ex.M_pad
    u_ext = jnp.concatenate([u2, jnp.zeros((K, ext), u2.dtype)], axis=1)
    return u_ext.reshape(K, -1, ex.W2)


def _check_mosaic(ex, interpret: bool) -> None:
    # Mosaic: the last two dims of every VMEM block must be divisible by
    # (8, 128) or equal the array dims. u3 blocks are (K, T/W2, W2).
    # ValueError, not assert: asserts vanish under ``python -O`` and the
    # Mosaic lowering error a direct caller would hit instead is opaque.
    if not interpret and not ex.pallas_ok:
        msg = (
            f"windowed Pallas kernels need tile % (8 * w2) == 0; got "
            f"T={ex.T}, W2={ex.W2} (use tile=1024 or the XLA ref path)"
        )
        raise ValueError(msg)


def windowed_gather(ex, u2: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """u2 [K, M_pad] -> [B, K, Rn] cell-local rows (pads -> 0)."""
    _check_mosaic(ex, interpret)
    K = u2.shape[0]
    Rn, W1, W2 = ex.Rn, ex.W1, ex.W2
    TT = ex.T // W2  # sub-tiles per node tile
    RT = _row_tile(Rn)
    u3 = _pad_u3(ex, u2)
    loc3 = ex.loc.reshape(ex.B, 1, Rn)  # middle axis: Mosaic block alignment

    def kernel(loc_ref, *refs):
        u_refs, out_ref = refs[:-1], refs[-1]
        loc = loc_ref[0]  # [1, RT] int32
        hi = loc // W2  # -1 -> -1 (no mask_hi match: pads read 0)
        lo = loc % W2  # -1 -> 127: harmless, the hi level zeroes it
        u_win = jnp.concatenate([r[:, :, :] for r in u_refs], axis=1)
        # [K, W1, W2] -> stacked [K * W1, W2]: one bf16 dot per split term,
        # MXU-contracting over the native 128-lane axis
        uf = u_win.reshape(K * W1, W2)
        mask_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (W2, RT), 0) == lo
        ).astype(jnp.bfloat16)  # exact 0/1
        tmp = None
        for h in _split3(uf):
            d = jax.lax.dot_general(
                h, mask_lo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [K * W1, RT]
            tmp = d if tmp is None else tmp + d
        # remaining W1-way select: VPU multiply-sum (exact f32)
        mask_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (W1, RT), 0) == hi
        ).astype(jnp.float32)
        rows = [
            (tmp[k * W1 : (k + 1) * W1] * mask_hi).sum(axis=0)
            for k in range(K)
        ]
        out_ref[0] = jnp.stack(rows, axis=0).astype(out_ref.dtype)

    in_specs = [
        pl.BlockSpec(
            (1, 1, RT), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
        ),
    ] + [
        pl.BlockSpec(
            (K, TT, W2),
            (lambda p: lambda b, j: (0, b + p, 0))(p),
            memory_space=pltpu.VMEM,
        )
        for p in range(ex.P)
    ]
    return pl.pallas_call(
        kernel,
        grid=(ex.B, Rn // RT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, K, RT), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ex.B, K, Rn), u2.dtype),
        interpret=interpret,
    )(loc3, *([u3] * ex.P))


def windowed_scatter(ex, f: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """f [B, K, Rn] cell-local rows -> [K, M_pad] node rows (dups summed)."""
    _check_mosaic(ex, interpret)
    B, K, Rn = f.shape
    W1, W2 = ex.W1, ex.W2
    TT = ex.T // W2
    RT = _row_tile(Rn)
    NJ = Rn // RT
    loc3 = ex.loc.reshape(ex.B, 1, Rn)

    def kernel(loc_ref, f_ref, out_ref):
        j = pl.program_id(1)
        loc = loc_ref[0]  # [1, RT]
        hi = loc // W2  # -1 -> -1: padded rows match no mask_hi slot
        lo = loc % W2
        mask_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (W2, RT), 0) == lo
        ).astype(jnp.bfloat16)  # exact 0/1 (pads masked via mask_hi below)
        mask_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (W1, RT), 0) == hi
        ).astype(jnp.bfloat16)
        # rhs[k * W1 + hi, r] = f[k, r] * mask_hi[hi, r]; padded rows -> 0.
        # ONE MXU contraction over RT against mask_lo: output [W2, K * W1]
        # (M = 128 native). The 3-term split runs on the SMALL [K, RT] value
        # rows; multiplying each bf16 term by the exact-0/1 bf16 mask is
        # exact (the product IS the term or zero). K-MAJOR row stacking:
        # each [W1, RT] block stays 8-sublane-aligned (W1 = 8 * P), so the
        # concat is tile stacking, not a cross-sublane interleave.
        fm = f_ref[0]  # [K, RT]
        part = None
        for fh in _split3(fm):
            rhs = jnp.concatenate(
                [fh[k][None, :] * mask_hi for k in range(K)], axis=0
            )  # [K * W1, RT] bf16
            d = jax.lax.dot_general(
                mask_lo, rhs,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W2, K * W1]
            part = d if part is None else part + d
        part = part.astype(out_ref.dtype)

        @pl.when(j == 0)
        def _():
            out_ref[0] = part

        @pl.when(j > 0)
        def _():
            out_ref[0] = out_ref[0] + part

    parts = pl.pallas_call(
        kernel,
        grid=(B, NJ),
        in_specs=[
            pl.BlockSpec(
                (1, 1, RT), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K, RT), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, W2, K * W1), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, W2, K * W1), f.dtype),
        interpret=interpret,
    )(loc3, f)

    # combine the per-block window partials: window b covers node tiles
    # [b, b+P) — a static shift-and-add over P (deterministic, no scatter).
    # parts [B, W2(lo), K * W1] -> [K, B, P, TT, W2]
    part5 = (
        parts.reshape(B, W2, K, W1)
        .transpose(2, 0, 3, 1)
        .reshape(K, B, ex.P, TT, W2)
    )
    acc = jnp.zeros((K, B + ex.P - 1, TT, W2), f.dtype)
    for p in range(ex.P):
        acc = acc.at[:, p : p + B].add(part5[:, :, p])
    return acc.reshape(K, -1)[:, : ex.M_pad]


def windowed_bsr_matvec(w, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Windowed BSR SpMV (ops/windowed_bsr.WindowedBsr) as a fused kernel.

    Row tiles own their outputs (no scatter); the column select is the same
    two-level one-hot contraction as the element gather, with the window
    start per row tile scalar-prefetched into the BlockSpec index maps.

    ``w.select_passes`` controls the bf16 split depth of the column select:
    3 reconstructs f32 exactly (default; parity tests); 1 rounds the
    gathered x to bf16 (~2^-9 relative) at a third of the MXU cost — right
    for AMG preconditioner levels, where flexible CG absorbs the error
    (measured: V(2,2) cycle 6.1 -> ~4 ms at 1M QPs).
    """
    from jax.experimental.pallas import tpu as _pltpu

    from .windowed_bsr import _GRAN

    bc, br, k, T_r, P = w.bc, w.br, w.k, w.T_r, w.P
    W2 = 128
    GT = _GRAN // W2  # sub-tiles per column granule (8: Mosaic alignment)
    WS = P * GT  # window width in sub-tiles
    x4 = x.reshape(bc, w.NC_pad // _GRAN, GT, W2)
    # the slot index is a GRID dim: every ref access is block-granular (no
    # dynamic slices — Mosaic requires provable 8-alignment of those)
    loc4 = w.loc.reshape(w.B, k, 1, T_r)
    vals4 = w.vals.astype(x.dtype).reshape(w.B, k, br * bc, T_r)

    def kernel(jb_ref, loc_ref, vals_ref, *refs):
        x_refs, y_ref = refs[:-1], refs[-1]
        a = pl.program_id(1)
        x_win = jnp.concatenate([r[:, 0] for r in x_refs], axis=1)
        # [bc, WS, W2] -> stacked [bc * WS, W2]: bf16 3-split MXU dots over
        # the native 128-lane axis, then a WS-way VPU select (see
        # windowed_gather; exact for the same reason)
        dtype = x_win.dtype
        l = loc_ref[0, 0]  # [1, T_r]
        hi = l // W2
        lo = l % W2
        mask_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (W2, T_r), 0) == lo
        ).astype(jnp.bfloat16)
        xf = x_win.reshape(bc * WS, W2)
        tmp = None
        for h in _split3(xf)[: getattr(w, "select_passes", 3)]:
            d = jax.lax.dot_general(
                h, mask_lo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bc * WS, T_r]
            tmp = d if tmp is None else tmp + d
        tmp = tmp.astype(dtype)
        mask_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (WS, T_r), 0) == hi
        ).astype(dtype)
        sel = jnp.stack(
            [
                (tmp[jc * WS : (jc + 1) * WS] * mask_hi).sum(axis=0)
                for jc in range(bc)
            ],
            axis=0,
        )  # [bc, T_r]
        vblk = vals_ref[0, 0]  # [br * bc, T_r]
        contrib = (vblk.reshape(br, bc, T_r) * sel[None]).sum(axis=1)

        @pl.when(a == 0)
        def _():
            y_ref[0] = contrib

        @pl.when(a > 0)
        def _():
            y_ref[0] = y_ref[0] + contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(w.B, k),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, T_r), lambda b, a, jb: (b, a, 0, 0),
                memory_space=_pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, br * bc, T_r), lambda b, a, jb: (b, a, 0, 0),
                memory_space=_pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                (bc, 1, GT, W2),
                (lambda p: lambda b, a, jb: (0, jb[b] + p, 0, 0))(p),
                memory_space=_pltpu.VMEM,
            )
            for p in range(P)
        ],
        out_specs=pl.BlockSpec(
            (1, br, T_r), lambda b, a, jb: (b, 0, 0), memory_space=_pltpu.VMEM
        ),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w.B, br, T_r), x.dtype),
        interpret=interpret,
    )(w.jb, loc4, vals4, *([x4] * P))
    return jnp.transpose(y, (1, 0, 2)).reshape(-1)
