"""Roofline accounting for the headline bench steps (VERDICT r3 item 4).

Measures each phase of the 1M-QP Mises Newton step in isolation on the real
chip and compares against the HBM-bandwidth floor (v5e-1: ~819 GB/s peak;
sustained ~0.8 of peak on large streams) and the MXU compute floor. The
analytic bytes-moved numbers count each materialized [.., M]-wide array once
per read/write at f32; XLA fusion can only do better, while_loop state
round-trips do worse — the measurement shows which regime each phase is in.

Phases (hex bench, fixed-9 CG + V(3,3) multigrid, grid-major):
  A eval_assemble   strain -> radial return -> residual (+ tangent factors)
  B pallas matvec   one fused CG operator apply
  C V-cycle         one multigrid preconditioner apply
  D cg_iteration    matvec + cycle + dots (the per-iteration unit)
  E full step        1 Newton iteration, end to end (bench unit, K=1)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py [n]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

HBM_GBS = 819.0  # v5e chip spec


def timeit(name, fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for i in range(reps):
        a0 = jax.tree.map(lambda x: x * (1.0 + 1e-7 * (i + 1)), args[0])
        t0 = time.perf_counter()
        jax.block_until_ready(fn(a0, *args[1:]))
        w = (time.perf_counter() - t0) * 1000.0
        if w >= 5.0:
            best = min(best, w)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from fenics_constitutive_tpu.fem import (
        DirichletBC, FunctionSpace, unit_cube_mesh,
    )
    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.ops.pallas_matvec import build_pallas_matvec
    from fenics_constitutive_tpu.solver.multigrid import build_multigrid
    from fenics_constitutive_tpu.solver.packed_step import (
        build_packed_problem, make_packed_step,
    )

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
    law = VonMises3D({"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
                      "p_y00": 2500.0, "p_w": 200.0})
    geos, models, state = build_packed_problem(V, law, q_degree=2)
    geo = geos[0]
    M, Q, s = geo.M, geo.qp_layout, geo.sdim
    f32 = 4
    print(f"{geo.N} QPs, M={M} node-grid slots, layout [k, {Q}, M]")

    bc_dofs, bc_vals = combine_bcs(bcs)
    free0 = jnp.ones(V.ndofs, bool).at[jnp.asarray(bc_dofs)].set(False)
    mg = build_multigrid(geo, 80769.0, 175000.0, free0, nu=3, nu_coarse=2,
                         coarse_direct=True)
    step = make_packed_step(geos, max_newton=1, newton_rtol=0.0,
                            newton_atol=0.0, cg_rtol=1e-5, cg_maxiter=400,
                            preconditioner=mg, cg_fixed_iters=9)
    dj = jnp.asarray(bc_dofs)
    vj = jnp.asarray(bc_vals, state.u.dtype)
    f0 = jnp.zeros(V.ndofs, state.u.dtype)
    dt = jnp.asarray(1.0, state.u.dtype)
    jitted = jax.jit(lambda st, sc: step(models, st, dj, vj * sc, f0, dt))
    st = state
    for k in (0.5, 1.0, 1.5, 2.0):
        st, _ = jitted(st, jnp.asarray(k, state.u.dtype))
    jax.block_until_ready(st.u)

    rows = []

    def row(name, ms, bytes_moved, flops=0.0):
        bw_floor = bytes_moved / HBM_GBS / 1e6  # ms
        rows.append((name, ms, bytes_moved / 1e6, bw_floor,
                     ms / bw_floor if bw_floor else float("inf"), flops / 1e9))

    # --- A: eval_assemble (strain + radial return + residual + factors) ----
    model = models[0]
    u_gm = geo.to_grid_major(st.u)
    sig0, h0 = st.stress[0], st.histories[0]

    def eval_assemble(u_gm):
        eps = geo.strain_gm(u_gm)
        s_new, tg, h_new = model.evaluate_packed(st.t, dt, eps, sig0, h0)
        return geo.residual_gm(s_new), s_new, tg, h_new

    msA = timeit("eval", jax.jit(eval_assemble), u_gm * 1.01)
    # bytes: u[3M] r + eps[sQM] w+r + stress in/out + alpha in/out +
    # factors (beta,gamma[QM], n[sQM]) w + residual w + corner channels
    bytesA = f32 * M * (
        3 + 2 * s * Q + 2 * s * Q + 2 * Q + 2 * Q + s * Q + 3 + 24
    )
    row("A eval_assemble", msA, bytesA)

    # --- B: one fused matvec ------------------------------------------------
    _, _, tg, _ = jax.jit(eval_assemble)(u_gm)
    pmv = build_pallas_matvec(geo)
    msB = timeit("matvec", jax.jit(lambda v: pmv(v, tg)), u_gm)
    # reads v[3M] + factors (beta,gamma [QM], n [sQM]) + writes out[3M]
    bytesB = f32 * M * (3 + 2 * Q + s * Q + 3)
    flopsB = M * Q * (24 * 2 + 25)  # strain+div matmuls + factored apply
    row("B pallas matvec", msB, bytesB, flopsB)

    # --- C: one V-cycle ------------------------------------------------------
    msC = timeit("vcycle", jax.jit(mg), u_gm)
    # per fine smoothing sweep: elastic apply (corner channels 24M r+w) +
    # diag scale + residual; 2*(nu)+1 fine applies + coarse levels (~1/8)
    n_apply = 2 * 3 + 1
    bytesC = f32 * M * (n_apply * (24 + 24 + 6) + 9) * 1.14  # + coarse ~14%
    row("C V(3,3) cycle", msC, bytesC)

    # --- D: one CG iteration (matvec + cycle + 2 dots + 3 axpys) ------------
    bytesD = bytesB + bytesC + f32 * M * 3 * (2 * 2 + 3 * 3)
    row("D cg_iteration", msB + msC + 0.0, bytesD)

    # --- E: full Newton step -------------------------------------------------
    msE = timeit("step", jitted, st, jnp.asarray(2.0, state.u.dtype))
    bytesE = 2 * bytesA + 9 * bytesD
    row("E full step (1 Newton)", msE, bytesE)

    print(f"\n{'phase':26s} {'ms':>8s} {'MB moved':>10s} {'bw-floor ms':>12s}"
          f" {'x floor':>8s} {'GFLOP':>8s}")
    for name, ms, mb, floor, ratio, gf in rows:
        print(f"{name:26s} {ms:8.3f} {mb:10.1f} {floor:12.3f} {ratio:8.2f}"
              f" {gf:8.2f}")


if __name__ == "__main__":
    main()
