"""Time the bench workload piecewise on the real TPU: constitutive eval,
matvec (XLA flat vs Pallas), BPX apply, full converged step. Guides the
optimization order (TODO.md perf levers)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}


def timeit(fn, *args, n=20, label=""):
    out = jax.block_until_ready(fn(*args))  # compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    print(f"{label::<44} {best:8.3f} ms")
    return out, best


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
    bc_dofs, bc_vals = combine_bcs(bcs)
    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, state.u.dtype)
    f_ext = jnp.zeros(V.ndofs, state.u.dtype)
    dt = jnp.asarray(1.0, state.u.dtype)
    free0 = jnp.ones(V.ndofs, bool).at[bc_dofs_j].set(False)
    mg = build_multigrid(geo, MAT["p_mu"], MAT["p_ka"], free0)

    # drive to the plastic bench state
    step0 = make_packed_step(geos, max_newton=1, newton_rtol=0.0,
                             newton_atol=0.0, cg_rtol=1e-5, cg_maxiter=400,
                             preconditioner=mg.bpx)
    jst = jax.jit(lambda st, s: step0(models, st, bc_dofs_j, bc_vals_j * s,
                                      f_ext, dt))
    st = state
    for k in (0.5, 1.0, 1.5, 2.0):
        st, stats = jst(st, jnp.asarray(k, state.u.dtype))
    jax.block_until_ready(st.u)
    print("bench state ready; cg_iters_last =", int(stats["cg_iters_last"]))

    # pieces at that state
    du = jnp.zeros_like(st.u).at[bc_dofs_j].set(bc_vals_j * 1e-5)

    @jax.jit
    def const_eval(stt, d):
        eps = geo.strain(d)
        s_new, tg, h = models[0].evaluate_packed(stt.t, dt, eps, stt.stress[0],
                                                 stt.histories[0])
        return s_new, tg

    (s_new, tg), t_eval = timeit(const_eval, st, du, label="constitutive eval (strain+radial return+tg)")

    @jax.jit
    def resid(s):
        return geo.residual(s)

    _, t_res = timeit(resid, s_new, label="residual assembly")

    v_gm = geo.to_grid_major(jnp.where(free0, st.u + 1e-3, 0.0))
    free_gm = geo.to_grid_major(free0)

    @jax.jit
    def mv_xla(v):
        return geo.matvec_gm(jnp.where(free_gm, v, 0.0), tg)

    _, t_mv = timeit(mv_xla, v_gm, label="matvec_gm (flat XLA)")

    try:
        from fenics_constitutive_tpu.ops.pallas_matvec import build_pallas_matvec

        pmv = build_pallas_matvec(geo)

        @jax.jit
        def mv_pl(v):
            return pmv(jnp.where(free_gm, v, 0.0), tg)

        _, t_pl = timeit(mv_pl, v_gm, label="matvec_gm (pallas v2)")
    except Exception as e:
        print("pallas matvec unavailable:", e)

    @jax.jit
    def bpx(v):
        return mg.bpx(jnp.where(free_gm, v, 0.0))

    _, t_bpx = timeit(bpx, v_gm, label="BPX apply")

    @jax.jit
    def jd(tgt):
        return geo.jacobi_diag_gm(tgt)

    _, t_jd = timeit(jd, tg, label="jacobi_diag_gm")

    # full converged step (the bench metric)
    _, t_step = timeit(lambda s: jst(st, s)[0].u,
                       jnp.asarray(2.0 + 1e-4, state.u.dtype),
                       n=6, label="full converged step (bench metric)")
    ncg = int(stats["cg_iters_last"])
    print(f"\nbreakdown: eval {t_eval:.2f} + resid {t_res:.2f} + "
          f"{ncg} CG x (mv {t_mv:.3f} + bpx {t_bpx:.3f}) = "
          f"{t_eval + t_res + ncg * (t_mv + t_bpx):.1f} ms vs step {t_step:.1f} ms")


if __name__ == "__main__":
    main()
