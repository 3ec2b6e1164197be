"""A/B the bf16 preconditioner apply at the 1M-QP bench state.

The V-cycle apply dominates the converged-step cost (~1.0 ms of the ~1.5 ms
CG iteration, profile_r2.py); it is pure HBM-bandwidth. Running the whole
preconditioner in bf16 halves that traffic; CG's matvec/residual/dots stay
f32 so the 1e-5 convergence criterion is still measured in full precision.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.models import packed_models  # noqa: F401


def main():
    n = 50
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    law = VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
         "p_y00": 2500.0, "p_w": 200.0}
    )
    geos, models, state = build_packed_problem(V, law, q_degree=2)
    dtype = state.u.dtype
    print("backend:", jax.default_backend(), "dtype:", dtype)

    bc_dofs, bc_vals = combine_bcs(bcs)
    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, dtype)
    f_ext = jnp.zeros(V.ndofs, dtype)
    dt = jnp.asarray(1.0, dtype)
    free0 = jnp.ones(V.ndofs, bool).at[bc_dofs_j].set(False)
    mg = build_multigrid(geos[0], 80769.0, 175000.0, free0)

    step0 = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
    )
    jitted0 = jax.jit(
        lambda st, s: step0(models, st, bc_dofs_j, bc_vals_j * s, f_ext, dt)
    )
    st = state
    for k in (0.5, 1.0, 1.5):
        st, stats = jitted0(st, jnp.asarray(k, dtype))
    st = jax.block_until_ready(st)

    configs = [
        ("bf16 vcycle", dict(precond_dtype=jnp.bfloat16)),
        ("bf16 vcycle + flexible", dict(precond_dtype=jnp.bfloat16,
                                        cg_flexible=True)),
    ]
    for name, kw in configs:
        step = make_packed_step(
            geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
            cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg, **kw,
        )

        def body(carry, s):
            stt, _ = carry
            s2, stats = step(models, stt, bc_dofs_j, bc_vals_j * s, f_ext, dt)
            return (s2, stats["cg_iters_last"]), stats["r_norm"]

        K = 6
        scales = jnp.asarray([2.0 + 1e-6 * i for i in range(K)], dtype)
        scanned = jax.jit(
            lambda stt: jax.lax.scan(body, (stt, jnp.asarray(0, jnp.int32)), scales)
        )
        (out, cg_k), rn = jax.block_until_ready(scanned(st))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            (out, cg_k), rn = scanned(st)
            jax.block_until_ready(rn)
            best = min(best, (time.perf_counter() - t0) / K * 1000)
        print(f"{name:26s} {best:8.2f} ms/step  cg_last={int(cg_k):3d} "
              f"r_norm={float(rn[-1]):.3e}")


if __name__ == "__main__":
    main()
