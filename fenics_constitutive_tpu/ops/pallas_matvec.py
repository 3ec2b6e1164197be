"""Pallas TPU kernel: fused structured-grid tangent matvec.

The XLA conv formulation of the matvec (ops/structured.py) is correct and
fast, but the compiled HLO surrounds each convolution with layout-change
copies of the 48-channel strain/stress fields (~8 copies x ~24 MB per
matvec) because TPU convs prefer a different internal tiling than the
elementwise ops. This kernel fuses the whole chain

    u -> corner gather -> Mandel strain (x8 QP) -> factored-tangent apply
      -> weighted divergence -> per-corner nodal forces

into one pass over x-slabs of the grid, with every intermediate living in
VMEM: HBM traffic is exactly (u + tangent params + two output slabs) and the
two small channel contractions run on the MXU.

Grid iteration is over x-slabs (sequential on a TensorCore); outputs are the
low/high x-row nodal force fields which XLA combines with two shifted adds.

Only the FULL-constraint 3D case (P1 hex, 2x2x2 Gauss) is implemented — the
benchmark/production hot path; everything else uses the conv engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structured import StructuredGeometry, _corner_offsets

__all__ = ["build_pallas_matvec"]


def _coef_matrices(geo: StructuredGeometry):
    """(KEPS_c [48, 24], KDIV_c [24, 48]) channel-contraction matrices.

    KEPS_c[(s,q), (a,j)]: Mandel strain channel from corner dof values.
    KDIV_c[(a,j), (s,q)]: per-corner nodal force from weighted stress channels
    (quadrature weights already folded by build_structured_geometry).
    """
    Q = geo.n_qp
    vs = geo.vs
    offs = _corner_offsets(geo.gdim)
    KEPS = np.asarray(geo.KEPS)  # [s*Q, vs, 2,2,2]
    KDIV = np.asarray(geo.KDIV)  # [vs, s*Q, 2,2,2]
    n_ch = KEPS.shape[0]
    n_cn = len(offs) * vs
    KEPS_c = np.zeros((n_ch, n_cn))
    KDIV_c = np.zeros((n_cn, n_ch))
    for a, off in enumerate(offs):
        koff = tuple(1 - o for o in off)
        for j in range(vs):
            KEPS_c[:, a * vs + j] = KEPS[(slice(None), j) + off]
            KDIV_c[a * vs + j, :] = KDIV[(j, slice(None)) + koff]
    return KEPS_c, KDIV_c


def build_pallas_matvec(geo: StructuredGeometry, kappa_scalar: float | None = None):
    """Return ``matvec(u_gm, tangent) -> r_gm`` as a fused kernel.

    ``tangent`` is an ops.packed.IsotropicTangent with fields in the
    structured engine's native layout (beta/gamma [Q, X, Y, Z], n
    [6, Q, X, Y, Z]; scalars broadcast). kappa rides in as an SMEM scalar so
    parameter changes do not retrace. ``kappa_scalar`` is accepted for
    backward compatibility and ignored (kappa comes from the tangent).
    """
    assert geo.gdim == 3 and geo.n_qp == 8 and geo.vs == 3, (
        "pallas matvec supports the 3D P1-hex 2x2x2-Gauss hot path"
    )
    X, Y, Z = geo.grid
    Q = geo.n_qp
    NYZ = (Y + 1) * (Z + 1)
    CYZ = Y * Z
    KEPS_c, KDIV_c = _coef_matrices(geo)
    dtype = geo.KEPS.dtype
    KEPS_j = jnp.asarray(KEPS_c, dtype)
    KDIV_j = jnp.asarray(KDIV_c, dtype)
    offs = _corner_offsets(3)

    # Mosaic cannot reshape/matmul across an unaligned lane dim (Y, Z tiles),
    # so the two channel contractions are unrolled as zero-skipping FMA chains
    # with the (sparse: 50%) coefficients baked in as Python floats.
    KEPS_list = [
        [(k, float(KEPS_c[c, k])) for k in range(24) if abs(KEPS_c[c, k]) > 1e-300]
        for c in range(6 * Q)
    ]
    KDIV_list = [
        [(c, float(KDIV_c[m, c])) for c in range(6 * Q) if abs(KDIV_c[m, c]) > 1e-300]
        for m in range(24)
    ]

    def kernel(kappa_ref, u_lo_ref, u_hi_ref, beta_ref, gamma_ref, n_ref,
               rlo_ref, rhi_ref):
        kappa_scalar = kappa_ref[0]
        # corner dof values U [(a, j) = 24] of [Y, Z] tiles
        U = []
        for a, (ax, ay, az) in enumerate(offs):
            src = u_hi_ref if ax else u_lo_ref
            for j in range(3):
                U.append(src[j, 0, ay : ay + Y, az : az + Z])

        # strain channels e[(s, q)] [Y, Z]
        e = []
        for c in range(6 * Q):
            acc = None
            for k, w in KEPS_list[c]:
                term = w * U[k]
                acc = term if acc is None else acc + term
            e.append(acc)

        beta = beta_ref[:, 0]  # [Q, Y, Z]
        gamma = gamma_ref[:, 0]

        sig = [None] * (6 * Q)
        for q in range(Q):
            eq = [e[s * Q + q] for s in range(6)]
            bq = beta[q]
            gq = gamma[q]
            nq = [n_ref[s, q, 0] for s in range(6)]
            tr = eq[0] + eq[1] + eq[2]
            ndote = nq[0] * eq[0]
            for s in range(1, 6):
                ndote = ndote + nq[s] * eq[s]
            gn = gq * ndote
            corr = (kappa_scalar - bq / 3.0) * tr
            for s in range(6):
                v = bq * eq[s] + gn * nq[s]
                if s < 3:
                    v = v + corr
                sig[s * Q + q] = v

        # per-corner nodal forces F[(a, j)] [Y, Z]
        rlo_ref[...] = jnp.zeros_like(rlo_ref)
        rhi_ref[...] = jnp.zeros_like(rhi_ref)
        for a, (ax, ay, az) in enumerate(offs):
            tgt = rhi_ref if ax else rlo_ref
            for j in range(3):
                m = a * 3 + j
                acc = None
                for c, w in KDIV_list[m]:
                    term = w * sig[c]
                    acc = term if acc is None else acc + term
                cur = tgt[j, 0, ay : ay + Y, az : az + Z]
                tgt[j, 0, ay : ay + Y, az : az + Z] = cur + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X,),
        in_specs=[
            pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i, k: (0, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1, Y, Z), lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1, Y, Z), lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, Q, 1, Y, Z), lambda i, k: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((3, X, Y + 1, Z + 1), dtype),
            jax.ShapeDtypeStruct((3, X, Y + 1, Z + 1), dtype),
        ),
    )

    def matvec(u_gm, tangent):
        beta = jnp.broadcast_to(tangent.beta, (Q, X, Y, Z))
        gamma = jnp.broadcast_to(tangent.gamma, (Q, X, Y, Z))
        n = jnp.broadcast_to(tangent.n, (6, Q, X, Y, Z))
        kappa = jnp.reshape(
            jnp.asarray(tangent.kappa, u_gm.dtype), (-1,)
        )[:1]
        ug = u_gm.reshape(3, X + 1, Y + 1, Z + 1)
        r_lo, r_hi = call(kappa, ug, ug, beta, gamma, n)
        r = jnp.zeros((3, X + 1, Y + 1, Z + 1), u_gm.dtype)
        r = r.at[:, :X].add(r_lo)
        r = r.at[:, 1:].add(r_hi)
        return r.reshape(-1)

    return matvec
