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
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve A x = b with preconditioned CG.

    Args:
        matvec: SPD operator action.
        b: right-hand side.
        diag: diagonal of A for Jacobi preconditioning (None = identity).
        dot: inner product (overridable with a psum-ing version when sharded).
        precond: explicit M^-1 apply (e.g. a multigrid V-cycle); overrides diag.

    Returns:
        (x, n_iterations).
    """
    if dot is None:
        dot = lambda a, c: jnp.vdot(a, c)
    n = b.shape[0]
    maxiter = maxiter if maxiter is not None else 10 * n
    if precond is None:
        inv_diag = 1.0 if diag is None else jnp.where(diag != 0.0, 1.0 / diag, 1.0)
        precond = lambda r: r * inv_diag

    b_norm2 = dot(b, b)
    tol2 = jnp.maximum(rtol * rtol * b_norm2, atol * atol)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(state):
        _, r, _, _, rz, k = state
        return (dot(r, r) > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        q = matvec(p)
        pq = dot(p, q)
        alpha = rz / jnp.where(pq != 0.0, pq, 1.0)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state = (x0, r0, z0, z0, rz0, jnp.asarray(0, jnp.int32))
    x, r, _, _, _, k = jax.lax.while_loop(cond, body, state)
    return x, k
