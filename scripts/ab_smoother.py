"""A/B the V-cycle smoother (damped Jacobi vs Chebyshev) at the bench state.

Measured (v5e, 50^3, K=6 scans, bench timing protocol — see bench_common):
Chebyshev cuts CG iterations (19 -> 14 at nu=3) but the extra cycle cost
loses on wall-clock (44 -> 48 ms/step), so damped Jacobi stays the default.
"""

from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.solver.packed_step import make_packed_step

from bench_common import MAT, build_bench_state, time_stepsK


def main():
    ctx = build_bench_state()
    mu, ka = MAT["p_mu"], MAT["p_ka"]
    configs = [
        ("jacobi nu=2 (baseline)", dict()),
        ("chebyshev nu=2", dict(smoother="chebyshev", nu=2)),
        ("chebyshev nu=3", dict(smoother="chebyshev", nu=3)),
    ]
    for name, kw in configs:
        mg = build_multigrid(ctx["geos"][0], mu, ka, ctx["free"], **kw)
        step = make_packed_step(
            ctx["geos"], max_newton=1, newton_rtol=0.0, newton_atol=0.0,
            cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
        )
        time_stepsK(ctx, name, step)


if __name__ == "__main__":
    main()
