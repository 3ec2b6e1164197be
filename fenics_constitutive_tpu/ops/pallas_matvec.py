"""Pallas TPU kernel: fused flat-layout tangent contraction.

The flat structured engine (ops/structured.py) expresses the CG matvec as

    corner-shift gather -> [s*Q, n*vs] MXU contraction -> factored-tangent
    apply -> [n*vs, s*Q] MXU contraction -> corner-shift scatter

XLA runs this well, but materializes the [48, M] strain and stress channel
fields in HBM between the matmuls and the elementwise tangent apply
(~50 MB/matvec extra traffic). This kernel fuses the two channel
contractions and the tangent apply into one VMEM pass over M-chunks: HBM
traffic is exactly (corner dofs in + tangent fields in + corner forces out).
The chunked M axis is lane-dense (full 128-lane tiles) — the round-1 kernel
iterated [Y=50, Z=50] tiles at ~40% lane utilization, which capped it at
1.76 ms/matvec where bandwidth allows ~0.2 ms.

The shift gather/scatter stay at the XLA level (static slices fuse into the
pad/add pass); the kernel sees pre-gathered [n*vs, M] corner channels.

Works for any gdim/Q/vs of the flat engine; the hot path is 3D P1-hex
2x2x2-Gauss ([24 x M] in, [48 x M] internal, [24 x M] out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structured import StructuredGeometry

__all__ = ["build_pallas_matvec"]


def _pad_to(x, mp, axis=-1):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mp - x.shape[axis])
    return jnp.pad(x, pad)


def build_pallas_matvec(
    geo: StructuredGeometry, kappa_scalar: float | None = None, tm: int = 2048
):
    """Return ``matvec(u_gm, tangent) -> r_gm`` with a fused Pallas core.

    ``tangent`` is an ops.packed.IsotropicTangent with fields in the flat
    engine's native layout (beta/gamma [Q, M], n [6, Q, M]; scalars
    broadcast). kappa rides in as a scalar-prefetch value so parameter
    changes do not retrace. ``kappa_scalar`` is accepted for backward
    compatibility and ignored.
    """
    del kappa_scalar
    Q = geo.n_qp
    vs = geo.vs
    sdim = geo.sdim
    ncn = geo.n_nodes * vs  # corner dof channels
    nch = sdim * Q  # strain/stress channels
    M = geo.M
    dtype = geo.KEPS_c.dtype
    TM = min(tm, ((M + 127) // 128) * 128)
    MP = ((M + TM - 1) // TM) * TM
    n_blocks = MP // TM

    KEPS_c = jnp.asarray(geo.KEPS_c, dtype)  # [nch, ncn]
    KDIV_c = jnp.asarray(geo.KDIV_c, dtype)  # [ncn, nch]

    def kernel(kappa_ref, keps_ref, kdiv_ref, U_ref, beta_ref, gamma_ref,
               n_ref, mask_ref, F_ref):
        kappa = kappa_ref[0]
        # strain channels [nch, TM] on the MXU
        e = jnp.dot(keps_ref[:], U_ref[:], preferred_element_type=dtype)
        beta = beta_ref[:]  # [Q, TM]
        gamma = gamma_ref[:]
        nfield = n_ref[:]  # [sdim*Q, TM], rows s*Q+q

        # factored isotropic tangent apply per QP, channels on sublanes
        sig_rows = [None] * nch
        for q in range(Q):
            eq = [e[s * Q + q] for s in range(sdim)]
            nq = [nfield[s * Q + q] for s in range(sdim)]
            bq = beta[q]
            gq = gamma[q]
            tr = eq[0] + eq[1] + eq[2]
            ndote = nq[0] * eq[0]
            for s in range(1, sdim):
                ndote = ndote + nq[s] * eq[s]
            gn = gq * ndote
            corr = (kappa - bq / 3.0) * tr
            for s in range(sdim):
                v = bq * eq[s] + gn * nq[s]
                if s < 3:
                    v = v + corr
                sig_rows[s * Q + q] = v
        sig = jnp.stack(sig_rows, axis=0) * mask_ref[:]  # [nch, TM]

        # per-corner nodal forces [ncn, TM] on the MXU
        F_ref[:] = jnp.dot(kdiv_ref[:], sig, preferred_element_type=dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((nch, ncn), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ncn, nch), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ncn, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ncn, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM
        ),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncn, MP), dtype),
    )

    mask_p = _pad_to(geo.mask.astype(dtype)[None], MP)

    def matvec(u_gm, tangent):
        u_cm = u_gm.reshape(vs, M)
        U = _pad_to(geo._corner_dofs(u_cm), MP)
        beta = _pad_to(jnp.broadcast_to(tangent.beta, (Q, M)).astype(dtype), MP)
        gamma = _pad_to(jnp.broadcast_to(tangent.gamma, (Q, M)).astype(dtype), MP)
        n = _pad_to(
            jnp.broadcast_to(tangent.n, (sdim, Q, M)).reshape(nch, M).astype(dtype),
            MP,
        )
        kappa = jnp.reshape(jnp.asarray(tangent.kappa, dtype), (-1,))[:1]
        F = call(kappa, KEPS_c, KDIV_c, U, beta, gamma, n, mask_p)
        return geo._scatter_corners(F[:, :M]).reshape(-1)

    return matvec
