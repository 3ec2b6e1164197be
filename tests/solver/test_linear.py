"""cg_solve unit tests, including the f32-robustness options (flexible CG +
precision-decoupled reductions) added for deeply plastic states
(TODO r1 'CG robustness'; VERDICT r1 weak #6)."""

import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.solver.linear import cg_solve


def _spd(n, cond, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, np.log10(cond), n)
    return (Q * eigs) @ Q.T


def test_cg_solves_spd():
    A = _spd(50, 1e4)
    x_true = np.linspace(-1, 1, 50)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    x, k = cg_solve(lambda v: Aj @ v, b, jnp.diag(Aj), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-9)
    # finite-precision CG loses the n-step termination property; just check
    # it converged well before the 10n default cap
    assert int(k) < 500


def test_fixed_iters_matches_adaptive():
    """fixed_iters=k reproduces the adaptive solve's iterate exactly (same
    recurrence, no convergence test), and returns k."""
    A = _spd(50, 1e4, seed=3)
    x_true = np.sin(np.arange(50))
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    x_a, k_a = cg_solve(lambda v: Aj @ v, b, jnp.diag(Aj), rtol=1e-10)
    x_f, k_f = cg_solve(
        lambda v: Aj @ v, b, jnp.diag(Aj), fixed_iters=int(k_a)
    )
    assert int(k_f) == int(k_a)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_a), rtol=1e-12,
                               atol=1e-12)


def test_flexible_cg_f32_ill_conditioned():
    """On an ill-conditioned f32 system, PR-beta (flexible) CG with f64
    reductions reaches a residual plain f32 CG cannot hold reliably."""
    n, cond = 200, 1e6
    A = _spd(n, cond, seed=1)
    x_true = np.sin(np.arange(n))
    b32 = jnp.asarray(A @ x_true, jnp.float32)
    A32 = jnp.asarray(A, jnp.float32)
    diag = jnp.diag(A32)

    def matvec(v):
        return A32 @ v

    # rtol=2e-5 sits near the f32 round-off floor at cond 1e6 (conjugacy
    # loss): PR-beta + f64 reductions converge in fewer iterations than
    # plain f32 PCG, which grinds against the floor — the failure mode seen
    # at deeply plastic states
    x_plain, k_plain = cg_solve(matvec, b32, diag, rtol=2e-5, maxiter=4 * n)
    x_fcg, k_fcg = cg_solve(
        matvec,
        b32,
        diag,
        rtol=2e-5,
        maxiter=4 * n,
        flexible=True,
        reduce_dtype=jnp.float64,
    )

    def true_res(x):
        return float(jnp.linalg.norm(b32 - matvec(x)) / jnp.linalg.norm(b32))

    assert int(k_fcg) < 4 * n, int(k_fcg)  # flexible did not hit the cap
    assert int(k_fcg) <= int(k_plain), (int(k_fcg), int(k_plain))
    # the true residual (not just the recursion residual) reached the target;
    # x-error itself scales with cond * residual and is not asserted
    assert true_res(x_fcg) <= 4e-5, true_res(x_fcg)


def test_flexible_equals_plain_in_f64():
    """PR and FR betas coincide in exact arithmetic; in f64 at moderate
    conditioning both reach the same solution (trajectories may differ late
    in the iteration once round-off accumulates, so only the solution and a
    comparable iteration count are asserted)."""
    A = _spd(80, 1e3, seed=2)
    b = jnp.asarray(np.ones(80))
    Aj = jnp.asarray(A)
    x1, k1 = cg_solve(lambda v: Aj @ v, b, jnp.diag(Aj), rtol=1e-12)
    x2, k2 = cg_solve(
        lambda v: Aj @ v, b, jnp.diag(Aj), rtol=1e-12, flexible=True
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-8)
    assert int(k2) <= int(k1) * 1.5 + 5
