"""Pallas TPU kernel: fused multigrid Jacobi smoothing chains.

The V-cycle's cost is dominated by its smoothing sweeps: each damped-Jacobi
iteration ``x <- x + omega D^-1 (b - A x)`` applies the constant-coefficient
elastic operator (corner gather -> folded [n*vs, n*vs] element matmul ->
corner scatter) and, at the XLA level, round-trips the [vs, M] iterate and the
[n*vs, M] corner-force field through HBM between sweeps (measured ~0.10 ms per
fine apply at 50^3, ~4x the pure-bandwidth cost, plus fixed op overhead that
dwarfs the arithmetic on coarse levels).

This kernel keeps the ENTIRE level state in VMEM for the whole chain: the
padded iterate and force accumulator are scratch buffers ([vs, M + maxoff]
~1.7 MB each at 50^3), the corner-channel blocks are built chunk-by-chunk
([n*vs, CM] slabs, MXU matmul against the element matrix), and ``nu``
smoothing sweeps plus the post-smoothing residual run back-to-back with zero
HBM traffic between them. HBM cost of a whole pre-smoothing phase collapses
to: read b + inv_d + mask (+ x), write x (+ r).

Semantics match multigrid.MultigridPreconditioner's non-fused chain exactly
(free-dof masking via the zeroed rows of inv_d; cell validity via the origin
mask; zero-start chains skip the known-zero first operator apply).

Used by build_multigrid(fused_smoothing=True); numerics pinned against the
XLA chain in tests/solver/test_pallas_smoother.py (interpret mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_fused_smoother"]


def build_fused_smoother(
    geo,
    ke: np.ndarray,
    inv_d,
    mask,
    *,
    nu: int,
    zero_start: bool,
    emit_residual: bool,
    chunk: int = 16384,
    interpret: bool | None = None,
):
    """Build a fused Jacobi-chain apply for one multigrid level.

    Args:
        geo: ops.structured.StructuredGeometry of the level (supplies vs, M,
            corner offsets).
        ke: [n*vs, n*vs] constant-coefficient element matrix (host numpy;
            beta*KE_I + (kappa - beta/3)*KE_V at the level moduli).
        inv_d: [vs*M] damped inverse Jacobi diagonal, ZERO at Dirichlet dofs
            (grid-major; omega / diag with the free mask folded in).
        mask: [M] cell-origin validity mask (geo.mask).
        nu: number of smoothing sweeps in the chain.
        zero_start: chain starts from x = 0 (the first sweep is inv_d * b —
            no operator apply; matches the XLA chain's x=None start).
        emit_residual: also return the free-masked residual b - A x after the
            sweeps (the restriction input of the V-cycle).

    Returns:
        ``fn(b_gm) -> ...`` (zero_start) or ``fn(x_gm, b_gm) -> ...``; result
        is ``x_gm`` or ``(x_gm, r_gm)`` per ``emit_residual``. All vectors are
        grid-major [vs*M].
    """
    vs = geo.vs
    M = geo.M
    offsets = tuple(int(o) for o in geo.offsets)
    ncorner = len(offsets)
    ncn = ncorner * vs
    moff = max(offsets)
    dtype = geo.KEPS_c.dtype

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    CM = min(chunk, ((M + 127) // 128) * 128)
    NCH = (M + CM - 1) // CM
    L = NCH * CM
    XT = L + ((moff + 127) // 128) * 128  # padded scratch row length

    ke_j = jnp.asarray(ke, dtype)
    inv_d_rows = jnp.reshape(jnp.asarray(inv_d, dtype), (vs, M))
    inv_d_p = jnp.pad(inv_d_rows, ((0, 0), (0, L - M)))
    mask_p = jnp.pad(jnp.asarray(mask, dtype)[None, :], ((0, 0), (0, L - M)))

    n_in = (2 if zero_start else 3) + 2  # b, invd [, x], ke, mask
    n_out = 2 if emit_residual else 1

    def kernel(*refs):
        if zero_start:
            b_ref, invd_ref = refs[0], refs[1]
            x_ref = None
            rest = refs[2:]
        else:
            b_ref, invd_ref, x_ref = refs[0], refs[1], refs[2]
            rest = refs[3:]
        ke_ref, mask_ref = rest[0], rest[1]
        outs = rest[2 : 2 + n_out]
        xs, rs, uc = rest[2 + n_out :]

        b = b_ref[:]
        invd = invd_ref[:]

        # initialize the padded iterate (pad region must stay zero)
        xs[:, :] = jnp.zeros((vs, XT), dtype)
        if zero_start:
            if nu >= 1:
                xs[:, :L] = invd * b
            sweeps = max(nu - 1, 0)
        else:
            xs[:, :L] = x_ref[:]
            sweeps = nu

        def apply_A():
            """rs[:, :L] <- raw elastic operator applied to xs (masked cells)."""
            rs[:, :] = jnp.zeros((vs, XT), dtype)
            for c in range(NCH):
                c0 = c * CM
                m_c = mask_ref[:, c0 : c0 + CM]
                for a in range(ncorner):
                    uc[a * vs : (a + 1) * vs, :] = (
                        xs[:, c0 + offsets[a] : c0 + offsets[a] + CM] * m_c
                    )
                fc = jnp.dot(ke_ref[:], uc[:], preferred_element_type=dtype)
                for a in range(ncorner):
                    lo = c0 + offsets[a]
                    rs[:, lo : lo + CM] = (
                        rs[:, lo : lo + CM] + fc[a * vs : (a + 1) * vs, :]
                    )

        for _ in range(sweeps):
            apply_A()
            xs[:, :L] = xs[:, :L] + invd * (b - rs[:, :L])

        outs[0][:, :] = xs[:, :L]
        if emit_residual:
            apply_A()
            freef = jnp.where(
                invd != 0.0, jnp.ones((), dtype), jnp.zeros((), dtype)
            )
            outs[1][:, :] = freef * (b - rs[:, :L])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((vs, L), dtype)] * n_out
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * n_in,
        out_specs=[vspec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((vs, XT), dtype),
            pltpu.VMEM((vs, XT), dtype),
            pltpu.VMEM((ncn, CM), dtype),
        ],
        interpret=interpret,
    )

    def pad_rows(v):
        return jnp.pad(v.reshape(vs, M).astype(dtype), ((0, 0), (0, L - M)))

    def unpack(outs):
        if emit_residual:
            x, r = outs
            return x[:, :M].reshape(-1), r[:, :M].reshape(-1)
        return outs[0][:, :M].reshape(-1)

    if zero_start:

        def fn(b_gm):
            return unpack(call(pad_rows(b_gm), inv_d_p, ke_j, mask_p))

    else:

        def fn(x_gm, b_gm):
            return unpack(
                call(pad_rows(b_gm), inv_d_p, pad_rows(x_gm), ke_j, mask_p)
            )

    return fn
