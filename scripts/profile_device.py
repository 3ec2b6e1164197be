"""Amortized device timing through the tunnel: run each op 50x inside one
jitted lax.scan so the ~29 ms dispatch latency divides away. This is the
honest way to see device-side per-op cost on the remote chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
K = 50


def timeloop(fn, x, label, n=8):
    @jax.jit
    def scanned(x0):
        def body(c, _):
            return fn(c), None

        y, _ = lax.scan(body, x0, None, length=K)
        return y

    jax.block_until_ready(scanned(x))  # compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(x))
        best = min(best, time.perf_counter() - t0)
    # one extra dispatch measures the tunnel floor on a trivial op
    per = best * 1e3 / K
    print(f"{label:<46} {per:8.3f} ms/op   ({best*1e3:7.1f} ms / {K})")
    return per


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

    # tunnel floor
    timeloop(lambda x: x + 1.0, jnp.zeros(8, state.u.dtype), "tunnel floor (x+1 on [8])")

    # constitutive eval iterated on the stress carry
    eps = geo.strain(jnp.zeros_like(st.u).at[bc_dofs_j].set(bc_vals_j * 1e-5))
    h0 = st.histories[0]

    def eval_once(sig):
        s_new, tg, h = models[0].evaluate_packed(st.t, dt, eps, sig, h0)
        return s_new

    timeloop(eval_once, st.stress[0], "constitutive eval (radial return + tg fields)")

    # matvec: strain+apply+residual, grid-major
    _, tg, _ = models[0].evaluate_packed(st.t, dt, eps, st.stress[0], h0)
    free_gm = geo.to_grid_major(free0)
    v0 = geo.to_grid_major(jnp.where(free0, st.u + 1e-3, 0.0))

    timeloop(lambda v: geo.matvec_gm(jnp.where(free_gm, v, 0.0), tg),
             v0, "matvec_gm (flat XLA)")

    from fenics_constitutive_tpu.ops.pallas_matvec import build_pallas_matvec

    try:
        pmv = build_pallas_matvec(geo)
        timeloop(lambda v: pmv(jnp.where(free_gm, v, 0.0), tg),
                 v0, "matvec_gm (pallas v2)")
    except Exception as e:
        print("pallas unavailable:", e)

    timeloop(lambda v: mg.bpx(jnp.where(free_gm, v, 0.0)), v0, "BPX apply")
    timeloop(lambda v: geo.strain_gm(v).reshape(-1)[: v.shape[0]], v0,
             "strain_gm only")


if __name__ == "__main__" and "--vcycle" not in sys.argv:
    main()


def vcycle_compare():
    """V-cycle vs BPX now that the fine matvec is ~free (flat XLA engine)."""
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

    which = sys.argv[-1] if sys.argv[-1] in ("bpx", "vcycle") else "vcycle"
    for name, pc in [(which, {"bpx": mg.bpx, "vcycle": mg}[which])]:
        stepk = make_packed_step(geos, max_newton=1, newton_rtol=0.0,
                                 newton_atol=0.0, cg_rtol=1e-5, cg_maxiter=400,
                                 preconditioner=pc)
        jstk = jax.jit(lambda st, s, _stepk=stepk: _stepk(
            models, st, bc_dofs_j, bc_vals_j * s, f_ext, dt))
        st = state
        for k in (0.5, 1.0, 1.5, 2.0):
            st, stats = jstk(st, jnp.asarray(k, state.u.dtype))
        jax.block_until_ready(st.u)

        best = np.inf
        for j in range(6):
            s = jnp.asarray(2.0 + 1e-4 * (j + 1), state.u.dtype)
            t0 = time.perf_counter()
            s2, stats = jstk(st, s)
            jax.block_until_ready(s2.u)
            best = min(best, (time.perf_counter() - t0) * 1e3)
        print(f"converged step [{name}]: {best:7.1f} ms  "
              f"cg_iters={int(stats['cg_iters_last'])}")


if __name__ == "__main__" and "--vcycle" in sys.argv:
    vcycle_compare()
