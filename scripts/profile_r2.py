"""Round-2 device-side timing: scan-amortized per-component costs on real TPU.

Each component is timed as `lax.scan` over K iterations inside ONE jitted
dispatch, so the remote-tunnel latency amortizes to ~nothing and the numbers
are true device costs.
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

K = 20


def timed_scan(name, body, init, iters=K, reps=3):
    """body(carry) -> carry; returns ms per body application."""

    def scanned(c):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=iters)[0]

    f = jax.jit(scanned)
    out = jax.block_until_ready(f(init))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(init))
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    print(f"{name:38s} {best:9.3f} ms")
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
    law = VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}
    )
    geos, models, state = build_packed_problem(V, law, q_degree=2)
    geo = geos[0]
    model = models[0]
    dtype = state.u.dtype
    print("backend:", jax.default_backend(), "dtype:", dtype)

    bc_dofs, bc_vals = combine_bcs(bcs)
    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, dtype)
    f_ext = jnp.zeros(V.ndofs, dtype)
    dt = jnp.asarray(1.0, dtype)
    free0 = jnp.ones(V.ndofs, bool).at[bc_dofs_j].set(False)
    mg = build_multigrid(geo, 80769.0, 175000.0, free0)

    # drive to a plastic state first (2 steps)
    step = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg.bpx,
    )
    jitted = jax.jit(lambda st, s: step(models, st, bc_dofs_j, bc_vals_j * s, f_ext, dt))
    st = state
    for k in (0.5, 1.0, 1.5, 2.0):
        st, stats = jitted(st, jnp.asarray(k, dtype))
    st = jax.block_until_ready(st)
    print("state ready; r_norm:", float(stats["r_norm"]), "cg:", int(stats["cg_iters_last"]))

    # representative inputs
    u_pert = st.u + 1e-6
    eps = jax.jit(geo.strain)(st.u)
    sig0, h0 = st.stress[0], st.histories[0]
    _, tg, _ = jax.jit(lambda e: model.evaluate_packed(st.t, dt, e, sig0, h0))(eps)
    tg = jax.block_until_ready(tg)

    # 1. strain conv
    def strain_body(u):
        e = geo.strain(u)
        return u * 0.999 + 1e-18 * e.sum()
    timed_scan("strain (conv)", strain_body, st.u)

    # 2. constitutive eval: eps -> (stress, tangent, hist)
    def eval_body(e):
        s2, tg2, h2 = model.evaluate_packed(st.t, dt, e, sig0, h0)
        return e + 1e-18 * s2  # keep live
    timed_scan("mises evaluate_packed", eval_body, eps)

    # 3. full eval_assemble: u -> residual (strain + eval + divergence conv)
    def ea_body(u):
        e = geo.strain(u)
        s2, tg2, h2 = model.evaluate_packed(st.t, dt, e, sig0, h0)
        r = geo.residual(s2)
        return u + 1e-18 * r
    timed_scan("eval_assemble (strain+eval+resid)", ea_body, st.u)

    # 4. conv matvec (grid-major)
    free_gm = geo.to_grid_major(free0)
    v0 = geo.to_grid_major(st.u)
    timed_scan("matvec conv (gm)", lambda v: geo.matvec_gm(v, tg) * 1e-9 + v * 0.99, v0)

    # 5. pallas matvec
    from fenics_constitutive_tpu.ops.pallas_matvec import build_pallas_matvec
    pmv = build_pallas_matvec(geo)
    timed_scan("matvec pallas (gm)", lambda v: pmv(v, tg) * 1e-9 + v * 0.99, v0)

    # 6. BPX apply
    timed_scan("BPX apply", lambda v: mg.bpx(v) * 1e-9 + v * 0.99, v0)

    # 7. V-cycle apply
    timed_scan("V-cycle apply", lambda v: mg(v) * 1e-9 + v * 0.99, v0)

    # 8. one full CG iteration (pallas matvec + bpx + vector ops)
    def cg_iter(carry):
        x, r, z, p, rz = carry
        q = jnp.where(free_gm, pmv(jnp.where(free_gm, p, 0.0), tg), p)
        pq = jnp.vdot(p, q)
        alpha = rz / pq
        x = x + alpha * p
        r = r - alpha * q
        z = jnp.where(free_gm, mg.bpx(jnp.where(free_gm, r, 0.0)), r)
        rz2 = jnp.vdot(r, z)
        p = z + (rz2 / rz) * p
        return (x, r, z, p, rz2)
    r0 = v0 * 1e-3
    z0 = mg.bpx(r0)
    timed_scan("CG iteration (pallas+BPX)", cg_iter,
               (jnp.zeros_like(v0), r0, z0, z0, jnp.vdot(r0, z0)))

    # 9. the full converged step, scanned (the real per-step device cost)
    def step_body(stt):
        s2, _ = step(models, stt, bc_dofs_j, bc_vals_j * 2.0, f_ext, dt)
        return s2
    timed_scan("FULL converged step (device)", step_body, st, iters=5)


if __name__ == "__main__":
    main()
