"""A/B cg_fixed_iters under the tuned V(3,3)+direct-coarse cycle.

The bench's "converged" claim requires the fixed-count solve to reach the
same Newton residual as the adaptive rtol-1e-5 CG; prints both so the floor
is visible.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)
from fenics_constitutive_tpu.models import packed_models  # noqa: F401

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}


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
    law = VonMises3D(MAT)
    geos, models, state = build_packed_problem(V, law, 2)
    geo = geos[0]
    dtype = state.u.dtype
    bc_dofs, bc_vals = combine_bcs(bcs)
    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, dtype)
    f_ext = jnp.zeros(V.ndofs, dtype)
    dt = jnp.asarray(1.0, dtype)
    free0 = jnp.ones(V.ndofs, bool).at[bc_dofs_j].set(False)
    mg = build_multigrid(
        geo, MAT["p_mu"], MAT["p_ka"], free0, nu=3, nu_coarse=2, coarse_direct=True
    )

    step0 = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
    )
    jitted0 = jax.jit(
        lambda st, s: step0(models, st, bc_dofs_j, bc_vals_j * s, f_ext, dt)
    )
    st = state
    for k in (0.5, 1.0, 1.5, 2.0):
        st, stats = jitted0(st, jnp.asarray(k, dtype))
    st = jax.block_until_ready(st)
    sa = stats
    print(
        f"adaptive: cg={int(sa['cg_iters_last'])} r={float(sa['r_norm']):.4f}",
        flush=True,
    )

    for fk in (8, 10, 11, 12):
        step = make_packed_step(
            geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
            cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg, cg_fixed_iters=fk,
        )
        jF = jax.jit(
            lambda st_, s: step(models, st_, bc_dofs_j, bc_vals_j * s, f_ext, dt)
        )
        _, sf = jax.block_until_ready(jF(st, jnp.asarray(2.0, dtype)))

        def step_body(carry, step=step):
            stt, s = carry
            s2, _ = step(models, stt, bc_dofs_j, bc_vals_j * s, f_ext, dt)
            return (s2, s * 1.000001)

        def scanned(c):
            return jax.lax.scan(
                lambda cc, _: (step_body(cc), None), c, None, length=12
            )[0]

        f = jax.jit(scanned)
        init = (st, jnp.asarray(2.0, dtype))
        jax.block_until_ready(f(init))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(init))
            best = min(best, (time.perf_counter() - t0) / 12 * 1000)
        print(
            f"fixed{fk:2d}: r={float(sf['r_norm']):8.4f} | step={best:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
