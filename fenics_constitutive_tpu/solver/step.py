"""Fully-jitted load-step: the whole Newton-Krylov solve as ONE XLA program.

The interactive `IncrSmallStrainProblem.solve()` keeps the Newton loop in
Python (convenient convergence reporting, reference-style (niter, converged)).
For production stepping and benchmarking, `make_load_step` compiles the entire
step — constitutive evaluation, assembly, Jacobi diagonal, CG, state commit —
into a single program with `lax.while_loop` Newton iterations, so a time-step
costs one dispatch and XLA can fuse/overlap everything (HBM-bandwidth-bound
ops fuse into the surrounding einsums; collectives ride ICI when sharded).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fem.assembly import (
    assemble_jacobi_diag,
    assemble_residual,
    grad_at_qp,
    tangent_matvec,
)
from .linear import cg_solve

__all__ = ["StepState", "make_load_step"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepState:
    """Committed state threaded through load steps (the functional analog of
    the reference's u_prev/stress_0/history_0 buffers + SimulationTime)."""

    u: jnp.ndarray
    stress: jnp.ndarray  # [C, Q, s]
    histories: tuple  # per-law dict pytrees (or None)
    t: jnp.ndarray  # scalar time


def make_load_step(
    problem,
    *,
    newton_rtol: float = 1e-12,
    newton_atol: float = 1e-10,
    max_newton: int = 25,
    cg_rtol: float = 1e-14,
    cg_maxiter: int | None = None,
):
    """Build ``step(models, state, bc_dofs, bc_vals, f_ext, dt) -> (state, stats)``.

    The returned function is pure/jittable; ``problem`` supplies the static
    structure (law data, constraint, sizes). ``bc_dofs`` is static per trace.
    """
    constraint = problem.constraint
    ndofs = problem.ndofs
    law_data = problem._law_data
    sdim = constraint.stress_strain_dim
    g = constraint.geometric_dim
    cg_maxiter_ = cg_maxiter if cg_maxiter is not None else 4 * ndofs

    def eval_assemble(models, u, u_prev, stress_prev, histories, f_ext, t, dt):
        du = u - u_prev
        r = -f_ext
        stress_new = stress_prev
        tangents = []
        hists_new = []
        for model, (dofmap, geo, cells), hist in zip(models, law_data, histories):
            grad = grad_at_qp(du, dofmap, geo)
            n_l, Q = grad.shape[0], grad.shape[1]
            s_new, tg, h_new = model.evaluate(
                t, dt, grad.reshape(n_l * Q, g, g),
                stress_prev[cells].reshape(n_l * Q, sdim), hist,
            )
            stress_new = stress_new.at[cells].set(s_new.reshape(n_l, Q, sdim))
            r = r + assemble_residual(
                s_new.reshape(n_l, Q, sdim), dofmap, geo, constraint, ndofs
            )
            tangents.append(tg.reshape(n_l, Q, sdim, sdim))
            hists_new.append(h_new)
        return r, stress_new, tuple(tangents), tuple(hists_new)

    def linear_solve(tangents, r, free):
        diag = jnp.zeros_like(r)
        for (dofmap, geo, _), tg in zip(law_data, tangents):
            diag = diag + assemble_jacobi_diag(tg, dofmap, geo, constraint, ndofs)
        diag = jnp.where(free, diag, 1.0)

        def matvec(v):
            vm = jnp.where(free, v, 0.0)
            out = jnp.zeros_like(v)
            for (dofmap, geo, _), tg in zip(law_data, tangents):
                out = out + tangent_matvec(vm, tg, dofmap, geo, constraint, ndofs)
            return jnp.where(free, out, v)

        return cg_solve(
            matvec, jnp.where(free, r, 0.0), diag, rtol=cg_rtol, maxiter=cg_maxiter_
        )

    def step(models, state: StepState, bc_dofs, bc_vals, f_ext, dt):
        free = jnp.ones(ndofs, bool).at[bc_dofs].set(False)
        u0 = state.u.at[bc_dofs].set(bc_vals)

        def fnorm(r):
            return jnp.linalg.norm(jnp.where(free, r, 0.0))

        # carry: trial state at the current iterate — each Newton iteration
        # evaluates the models exactly once
        r0, stress0, tangents0, hists0 = eval_assemble(
            models, u0, state.u, state.stress, state.histories, f_ext, state.t, dt
        )
        r0_norm = fnorm(r0)

        def newton_cond(carry):
            u, it, r, *_ = carry
            not_conv = fnorm(r) > jnp.maximum(newton_atol, newton_rtol * r0_norm)
            return not_conv & (it < max_newton)

        def newton_body(carry):
            u, it, r, stress, tangents, hists = carry
            delta, _ = linear_solve(tangents, r, free)
            u_new = u - delta
            r2, stress2, tangents2, hists2 = eval_assemble(
                models, u_new, state.u, state.stress, state.histories, f_ext,
                state.t, dt,
            )
            return (u_new, it + 1, r2, stress2, tangents2, hists2)

        carry = (u0, jnp.asarray(0, jnp.int32), r0, stress0, tangents0, hists0)
        u, niter, r_f, stress_f, _, hists_f = jax.lax.while_loop(
            newton_cond, newton_body, carry
        )
        new_state = StepState(u=u, stress=stress_f, histories=hists_f, t=state.t + dt)
        stats = {"newton_iters": niter, "r_norm": fnorm(r_f), "r0_norm": r0_norm}
        return new_state, stats

    return step
