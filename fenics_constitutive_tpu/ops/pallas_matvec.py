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


def build_pallas_matvec(geo: StructuredGeometry, kappa_scalar: float):
    """Return ``matvec(u_gm, beta, gamma, n) -> r_gm`` as a fused kernel.

    beta, gamma: [Q, X, Y, Z]; n: [6, Q, X, Y, Z] (IsotropicTangent fields in
    the structured engine's native layout); kappa is a compile-time scalar
    (the volumetric modulus of the factored tangent).
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

    def kernel(u_lo_ref, u_hi_ref, beta_ref, gamma_ref, n_ref,
               keps_ref, kdiv_ref, rlo_ref, rhi_ref):
        # corner dof values U [(a, j) = 24, Y*Z]
        rows = []
        for a, (ax, ay, az) in enumerate(offs):
            src = u_hi_ref if ax else u_lo_ref
            for j in range(3):
                rows.append(
                    src[j, 0, ay : ay + Y, az : az + Z].reshape(CYZ)
                )
        U = jnp.stack(rows, axis=0)  # [24, CYZ]

        # strain channels: [48, 24] @ [24, CYZ] on the MXU
        eps = jnp.dot(keps_ref[:, :], U, preferred_element_type=dtype)
        e = eps.reshape(6, Q, CYZ)

        beta = beta_ref[:, 0].reshape(Q, CYZ)
        gamma = gamma_ref[:, 0].reshape(Q, CYZ)
        nvec = n_ref[:, :, 0].reshape(6, Q, CYZ)

        tr = e[0] + e[1] + e[2]
        ndote = (nvec * e).sum(axis=0)
        sig = beta * e + (gamma * ndote) * nvec
        sig = sig.at[:3].add((kappa_scalar - beta / 3.0) * tr)

        # per-corner nodal forces: [24, 48] @ [48, CYZ] on the MXU
        F = jnp.dot(
            kdiv_ref[:, :], sig.reshape(6 * Q, CYZ),
            preferred_element_type=dtype,
        ).reshape(8, 3, Y, Z)

        rlo_ref[...] = jnp.zeros_like(rlo_ref)
        rhi_ref[...] = jnp.zeros_like(rhi_ref)
        for a, (ax, ay, az) in enumerate(offs):
            tgt = rhi_ref if ax else rlo_ref
            for j in range(3):
                cur = tgt[j, 0, ay : ay + Y, az : az + Z]
                tgt[j, 0, ay : ay + Y, az : az + Z] = cur + F[a, j]

    grid = (X,)
    u_spec_lo = pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM)
    u_spec_hi = pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i: (0, i + 1, 0, 0),
                             memory_space=pltpu.VMEM)
    bg_spec = pl.BlockSpec((Q, 1, Y, Z), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((6, Q, 1, Y, Z), lambda i: (0, 0, i, 0, 0),
                          memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3, 1, Y + 1, Z + 1), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[u_spec_lo, u_spec_hi, bg_spec, bg_spec, n_spec,
                  coef_spec, coef_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((3, X, Y + 1, Z + 1), dtype),
            jax.ShapeDtypeStruct((3, X, Y + 1, Z + 1), dtype),
        ),
    )

    def matvec(u_gm, beta, gamma, n):
        ug = u_gm.reshape(3, X + 1, Y + 1, Z + 1)
        r_lo, r_hi = call(ug, ug, beta, gamma, n, KEPS_j, KDIV_j)
        r = jnp.zeros((3, X + 1, Y + 1, Z + 1), u_gm.dtype)
        r = r.at[:, :X].add(r_lo)
        r = r.at[:, 1:].add(r_hi)
        return r.reshape(-1)

    return matvec
