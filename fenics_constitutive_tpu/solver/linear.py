"""Matrix-free preconditioned conjugate-gradient solver.

The analog of the PETSc KSP the reference delegates to (SURVEY §3.2 'PETSc KSP
linear solve'). Written as a `lax.while_loop` so the whole Newton step fuses
into one XLA program; the reduction points (dots, norms) are the only places a
distributed version needs a `psum`, which `parallel.sharding` inserts via
shard_map.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["cg_solve"]


def cg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    diag: jnp.ndarray | None = None,
    *,
    rtol: float = 1e-14,
    atol: float = 0.0,
    maxiter: int | None = None,
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    flexible: bool = False,
    reduce_dtype: jnp.dtype | None = None,
    fixed_iters: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve A x = b with preconditioned CG.

    Args:
        matvec: SPD operator action.
        b: right-hand side.
        diag: diagonal of A for Jacobi preconditioning (None = identity).
        dot: inner product (overridable with a psum-ing version when sharded).
        precond: explicit M^-1 apply (e.g. a multigrid V-cycle); overrides diag.
        flexible: use the Polak-Ribiere beta ``z.(r - r_prev)/rz_prev``
            (flexible CG / FCG). Restores convergence when f32 round-off (or a
            nonconstant preconditioner) breaks exact conjugacy — the
            Fletcher-Reeves beta of textbook PCG stalls at deeply plastic
            states in f32 because accumulated round-off makes old search
            directions no longer A-conjugate; PR beta self-corrects by
            forgetting stale conjugacy.
        reduce_dtype: accumulate the scalar reductions (dots/norms) in this
            dtype (e.g. ``jnp.float64`` for an f32 state — dots are O(n)
            next to the O(n*stencil) matvec, so the emulated-f64 cost on TPU
            is negligible while removing the dominant round-off source).
        fixed_iters: run exactly this many iterations as a ``fori_loop``
            with NO per-iteration convergence test — drops the extra
            residual dot and the while-loop condition sync each iteration,
            which lets XLA pipeline the loop body. For production stepping
            where the iteration count at the target tolerance is known to be
            stable (e.g. a preconditioned operator whose spectrum barely
            moves between load steps), this trades the adaptive exit for
            per-iteration overhead; verify the achieved residual downstream.

    Returns:
        (x, n_iterations).
    """
    if dot is None:
        if reduce_dtype is not None:
            def dot(a, c):
                return jnp.vdot(a.astype(reduce_dtype), c.astype(reduce_dtype))
        else:
            def dot(a, c):
                return jnp.vdot(a, c)
    n = b.shape[0]
    maxiter = maxiter if maxiter is not None else 10 * n
    if precond is None:
        inv_diag = 1.0 if diag is None else jnp.where(diag != 0.0, 1.0 / diag, 1.0)
        precond = lambda r: r * inv_diag

    wdtype = b.dtype

    b_norm2 = dot(b, b)
    tol2 = jnp.maximum(rtol * rtol * b_norm2, atol * atol)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(state):
        _, r, _, _, _, rz, k = state
        return (dot(r, r) > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, r_prev, rz, k = state
        q = matvec(p)
        pq = dot(p, q)
        alpha = (rz / jnp.where(pq != 0.0, pq, 1.0)).astype(wdtype)
        x = x + alpha * p
        r_new = r - alpha * q
        z = precond(r_new)
        rz_new = dot(r_new, z)
        if flexible:
            num = dot(z, r_new - r)
        else:
            num = rz_new
        beta = (num / jnp.where(rz != 0.0, rz, 1.0)).astype(wdtype)
        p = z + beta * p
        return (x, r_new, z, p, r, rz_new, k + 1)

    state = (x0, r0, z0, z0, r0, rz0, jnp.asarray(0, jnp.int32))
    if fixed_iters is not None:
        state = jax.lax.fori_loop(
            0, fixed_iters, lambda i, s: body(s), state
        )
        x, _, _, _, _, _, k = state
        return x, k
    x, r, _, _, _, _, k = jax.lax.while_loop(cond, body, state)
    return x, k
