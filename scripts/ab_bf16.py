"""A/B the bf16 preconditioner apply at the 1M-QP bench state.

Measured (v5e, 50^3, bench timing protocol): NEUTRAL — the grid-major
[3/24, M] blocks just repad at bf16 tile granularity (sublane tiles go
8 -> 16 rows), so halving element bytes does not halve tiles touched.
The option ships for topologies with tile-friendly block shapes.
"""

import jax.numpy as jnp

from fenics_constitutive_tpu.solver.packed_step import make_packed_step

from bench_common import build_bench_state, time_stepsK


def main():
    ctx = build_bench_state()
    configs = [
        ("f32 vcycle (baseline)", dict()),
        ("bf16 vcycle", dict(precond_dtype=jnp.bfloat16)),
        ("bf16 vcycle + flexible", dict(precond_dtype=jnp.bfloat16,
                                        cg_flexible=True)),
    ]
    for name, kw in configs:
        step = make_packed_step(
            ctx["geos"], max_newton=1, newton_rtol=0.0, newton_atol=0.0,
            cg_rtol=1e-5, cg_maxiter=400, preconditioner=ctx["mg"], **kw,
        )
        time_stepsK(ctx, name, step)


if __name__ == "__main__":
    main()
