"""Pallas TPU kernel: fused Mises constitutive eval + element assembly.

``eval_assemble`` on the flat structured engine is three bandwidth-bound
stages with HBM round trips between them:

    strain:   e = KEPS @ U            ([s*Q, M] written to HBM)
    model:    radial return on e      (reads e, writes stress/tangent/history;
                                       whole-batch lax.while_loop Newton)
    residual: F = KDIV @ sigma        (reads stress again)

This kernel runs all three in one VMEM pass over M-chunks: the strain
channels never touch HBM, the per-QP Newton iteration is a fixed-trip
``fori``-style unrolled loop with per-lane convergence masking (identical
update rule to models/packed_models.py — a lane that converges stops
changing, so running the full trip count gives the same answer as the
batch-synchronized while_loop with the same cap), and the weighted
divergence contraction consumes the new stress directly from registers/VMEM.

The corner gather/scatter shifts stay at the XLA level (pad/slice fusion
beats Mosaic lane rotations for misaligned shifts — measured on both the
matvec kernel, ops/pallas_matvec.py, and the rejected fused smoother
configuration, scripts/ab_fused.py).

Covers the headline workload: VonMises3D (exponential isotropic hardening),
FULL constraint, degree-1 structured engine. Everything else uses the XLA
path. Numerics pinned in tests/solver/test_pallas_eval.py (interpret mode).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structured import StructuredGeometry

__all__ = ["build_pallas_eval"]

_SQ23 = math.sqrt(2.0 / 3.0)


def _pad_to(x, mp, axis=-1):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mp - x.shape[axis])
    return jnp.pad(x, pad)


def build_pallas_eval(geo: StructuredGeometry, model, tm: int = 2048):
    """Return ``eval_assemble(du_gm, stress, history) -> (F_corner, stress',
    tangent_fields, history')`` with a fused Pallas core.

    ``du_gm`` is the grid-major displacement increment; ``F_corner`` is the
    [n*vs, M] per-corner force field (caller applies geo._scatter_corners).
    ``tangent_fields`` is ``(beta, gamma, n)`` in the engine's QP layouts
    (kappa is the scalar model parameter). Model parameters ride in as
    scalar prefetch so traced parameter values do not retrace the kernel.
    """
    Q = geo.n_qp
    vs = geo.vs
    sdim = geo.sdim
    assert sdim >= 3, "fused eval supports FULL/3D constraints"
    ncn = geo.n_nodes * vs
    nch = sdim * Q
    M = geo.M
    dtype = geo.KEPS_c.dtype
    TM = min(tm, ((M + 127) // 128) * 128)
    MP = ((M + TM - 1) // TM) * TM
    n_blocks = MP // TM

    # geometry matrices are concrete arrays built outside any trace;
    # referencing them directly is safe (no conversion created here)
    KEPS_c = geo.KEPS_c  # [nch, ncn]
    KDIV_c = geo.KDIV_c  # [ncn, nch]

    eps_m = float(jnp.finfo(dtype).eps)
    newton_tol = float(model.newton_tol)
    newton_rtol = max(float(model.newton_rtol), 8.0 * eps_m)
    max_it = int(model.newton_max_iter) if eps_m < 1e-10 else min(
        int(model.newton_max_iter), 32
    )

    def kernel(params_ref, keps_ref, kdiv_ref, U_ref, sig_ref, epsn_ref,
               alpha_ref, mask_ref, F_ref, sig_out_ref, epsn_out_ref,
               alpha_out_ref, beta_out_ref, gamma_out_ref, n_out_ref):
        ka, mu, y0, y00, w = (params_ref[i] for i in range(5))

        m = mask_ref[:]  # [1, TM]
        e = jnp.dot(keps_ref[:], U_ref[:], preferred_element_type=dtype) * m

        for q in range(Q):
            eq = [e[s * Q + q] for s in range(sdim)]
            sq = [sig_ref[s * Q + q] for s in range(sdim)]
            epq = [epsn_ref[s * Q + q] for s in range(sdim)]
            alpha = alpha_ref[q]

            # deviatoric split of the strain increment and old stress
            tr_e = eq[0] + eq[1] + eq[2]
            ed = [eq[s] - (tr_e / 3.0) * (1.0 if s < 3 else 0.0)
                  for s in range(sdim)]
            tr_s = sq[0] + sq[1] + sq[2]
            sd = [sq[s] - (tr_s / 3.0) * (1.0 if s < 3 else 0.0)
                  for s in range(sdim)]

            # trial deviatoric stress
            sigtr = [sd[s] + 2.0 * mu * ed[s] for s in range(sdim)]
            n2 = sigtr[0] * sigtr[0]
            for s in range(1, sdim):
                n2 = n2 + sigtr[s] * sigtr[s]
            sigtrn = jnp.sqrt(n2)

            hard0 = y0 + (y00 - y0) * (1.0 - jnp.exp(-w * alpha))
            phitr = sigtrn - _SQ23 * hard0
            plastic = phitr > 0.0
            safe = jnp.where(sigtrn > 0.0, sigtrn, 1.0)
            xn = [jnp.where(plastic, sigtr[s] / safe, 0.0) for s in range(sdim)]

            tol_abs = jnp.maximum(newton_tol, 8.0 * eps_m * (y0 + sigtrn))

            # fixed-trip Newton with per-lane masking (same update rule and
            # trip cap as packed_models._vonmises_evaluate_packed; a lane
            # that converges stops changing, so the fixed trip count equals
            # the batch-synchronized while_loop's capped result). The active
            # mask is carried as f32 0/1 — Mosaic cannot legalize i1 vector
            # loop carries in scf.for.
            one = jnp.ones_like(sigtrn)
            act0 = jnp.where(plastic & (1.0 > tol_abs), one, 0.0 * one)

            def nbody(_, carry):
                g_prev, g, act = carry
                act_b = act > 0.5  # local i1 is fine; only the carry is f32
                g0 = jnp.where(act_b, g, g_prev)
                ex = jnp.exp(-w * (alpha + _SQ23 * g0))
                fx = sigtrn - 2.0 * mu * g0 - _SQ23 * (
                    y0 + (y00 - y0) * (1.0 - ex)
                )
                dfx = -2.0 * mu - (2.0 / 3.0) * (y00 - y0) * w * ex
                g_new = g0 - fx / dfx
                g_out = jnp.where(act_b, g_new, g)
                act_new = jnp.where(
                    act_b
                    & (jnp.abs(fx) > tol_abs)
                    & (jnp.abs(g_out - g0) > newton_rtol * jnp.abs(g_out)),
                    one,
                    0.0 * one,
                )
                return (g0, g_out, act_new)

            _, g, _ = jax.lax.fori_loop(
                0, max_it + 1, nbody, (one, jnp.zeros_like(sigtrn), act0)
            )
            gamma_p = jnp.where(plastic, g, 0.0)

            exg = jnp.exp(-w * (alpha + _SQ23 * gamma_p))
            xg = -2.0 * mu - (2.0 / 3.0) * (y00 - y0) * w * exg
            xc1 = jnp.where(plastic, -1.0 / xg, 0.0)
            xc2 = jnp.where(plastic, gamma_p / safe, 0.0)

            two_mu_g = 2.0 * mu * gamma_p
            for s in range(sdim):
                i2 = 1.0 if s < 3 else 0.0
                s_new = (
                    sq[s]
                    + ka * tr_e * i2
                    + 2.0 * mu * ed[s]
                    - two_mu_g * xn[s]
                )
                sig_out_ref[s * Q + q, :] = s_new
                epsn_out_ref[s * Q + q, :] = epq[s] + gamma_p * xn[s]
                n_out_ref[s * Q + q, :] = xn[s]
            alpha_out_ref[q, :] = alpha + _SQ23 * gamma_p
            beta_out_ref[q, :] = 2.0 * mu * (1.0 - 2.0 * mu * xc2)
            gamma_out_ref[q, :] = 4.0 * mu * mu * (xc2 - xc1)

        # weighted divergence of the new stress (mask folded once more to
        # match residual_gm's sig * mask)
        F_ref[:, :] = jnp.dot(
            kdiv_ref[:], sig_out_ref[:] * m, preferred_element_type=dtype
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((nch, ncn), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ncn, nch), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ncn, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ncn, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, TM), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ncn, MP), dtype),   # F corner forces
            jax.ShapeDtypeStruct((nch, MP), dtype),   # stress'
            jax.ShapeDtypeStruct((nch, MP), dtype),   # eps_n'
            jax.ShapeDtypeStruct((Q, MP), dtype),     # alpha'
            jax.ShapeDtypeStruct((Q, MP), dtype),     # beta
            jax.ShapeDtypeStruct((Q, MP), dtype),     # gamma
            jax.ShapeDtypeStruct((nch, MP), dtype),   # n
        ],
        interpret=jax.default_backend() != "tpu",
    )

    # HOST-side constant: build_pallas_eval may run inside a jit trace (lazy
    # build on first step call), so nothing jnp-valued may be cached in this
    # closure — a value created under one trace leaks into the next. Keep the
    # padded mask as numpy and convert freshly per call.
    mask_p_np = np.pad(
        np.asarray(geo.mask, np.float64)[None], ((0, 0), (0, MP - M))
    )

    def eval_assemble(du_gm, stress, history):
        """stress [s, Q, M], history {eps_n [s,Q,M], alpha [1,Q,M]}."""
        p = model.params
        params = jnp.stack(
            [
                jnp.asarray(p["p_ka"], dtype).reshape(()),
                jnp.asarray(p["p_mu"], dtype).reshape(()),
                jnp.asarray(p["p_y0"], dtype).reshape(()),
                jnp.asarray(p["p_y00"], dtype).reshape(()),
                jnp.asarray(p["p_w"], dtype).reshape(()),
            ]
        )
        U = _pad_to(geo._corner_dofs(du_gm.reshape(vs, M)), MP)
        sig = _pad_to(stress.reshape(nch, M).astype(dtype), MP)
        epsn = _pad_to(history["eps_n"].reshape(nch, M).astype(dtype), MP)
        alpha = _pad_to(history["alpha"].reshape(Q, M).astype(dtype), MP)
        F, s_new, epsn_new, alpha_new, beta, gmm, nfield = call(
            params, KEPS_c, KDIV_c, U, sig, epsn, alpha,
            jnp.asarray(mask_p_np, dtype),
        )
        s_new = s_new[:, :M].reshape(sdim, Q, M)
        hist = {
            "eps_n": epsn_new[:, :M].reshape(sdim, Q, M),
            "alpha": alpha_new[:, :M].reshape(1, Q, M),
        }
        tg = (
            beta[:, :M].reshape(Q, M),
            gmm[:, :M].reshape(Q, M),
            nfield[:, :M].reshape(sdim, Q, M),
        )
        return F[:, :M], s_new, tg, hist

    return eval_assemble
