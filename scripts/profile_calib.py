"""Calibrate the scan-amortized timing floor and re-measure hot ops at K=120."""

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


def timed_scan(name, body, init, iters, reps=4):
    def scanned(c):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=iters)[0]

    f = jax.jit(scanned)
    jax.block_until_ready(f(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(init))
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    print(f"{name:42s} K={iters:4d} {best:9.4f} ms", flush=True)
    return best


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
    model = models[0]
    dtype = state.u.dtype
    bc_dofs, bc_vals = combine_bcs(bcs)
    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, dtype)
    f_ext = jnp.zeros(V.ndofs, dtype)
    dt = jnp.asarray(1.0, dtype)
    free0 = jnp.ones(V.ndofs, bool).at[bc_dofs_j].set(False)
    mg = build_multigrid(geo, MAT["p_mu"], MAT["p_ka"], free0)

    step = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
    )
    jitted = jax.jit(lambda st, s: step(models, st, bc_dofs_j, bc_vals_j * s, f_ext, dt))
    st = state
    for k in (0.5, 1.0, 1.5, 2.0):
        st, stats = jitted(st, jnp.asarray(k, dtype))
    st = jax.block_until_ready(st)

    eps = jax.jit(geo.strain)(st.u)
    sig0, h0 = st.stress[0], st.histories[0]
    _, tg, _ = jax.jit(lambda e: model.evaluate_packed(st.t, dt, e, sig0, h0))(eps)
    tg = jax.block_until_ready(tg)
    free_gm = geo.to_grid_major(free0)
    v0 = geo.to_grid_major(st.u)

    # floor: trivial body on the same carry
    for K in (30, 120):
        timed_scan("floor (v*0.9999)", lambda v: v * 0.9999, v0, K)

    def mv_body(v):
        vm = jnp.where(free_gm, v, 0.0)
        return jnp.where(free_gm, geo.matvec_gm(vm, tg), v) * 0.9999

    def vc_body(r):
        rm = jnp.where(free_gm, r, 0.0)
        return jnp.where(free_gm, mg(rm), r) * 0.9999

    def ea_body(u):
        e = geo.strain(u)
        s2, tg2, h2 = model.evaluate_packed(st.t, dt, e, sig0, h0)
        r = geo.residual(s2)
        return u * 0.9999 + 1e-18 * r

    for K in (120,):
        timed_scan("matvec (true tangent)", mv_body, v0, K)
        timed_scan("V-cycle apply", vc_body, v0, K)
        timed_scan("eval_assemble", ea_body, st.u, K)
        timed_scan(
            "fine elastic_matvec_gm",
            lambda v: v * 0.9999 + 1e-18 * geo.elastic_matvec_gm(v, 175000.0, 161538.0),
            v0, K,
        )

    # whole step at K=12 (the bench pattern) for cross-check
    def step_body(carry):
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
    print(f"{'FULL STEP (scan12, incl tunnel/12)':42s} {best:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
