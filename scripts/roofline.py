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


_RTT = [0.0]


def measure_rtt() -> float:
    """Per-dispatch tunnel latency, measured in-session on a trivial op."""
    tiny = jax.jit(lambda x: x * 1.000001 + 1.0)
    z = jax.block_until_ready(tiny(jnp.zeros(8, jnp.float32)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        z = jax.block_until_ready(tiny(z))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    _RTT[0] = best
    return best


def timeit(name, body, x0, inner=20, reps=3):
    """ms per op: ``body`` (shape-preserving) runs ``inner`` times inside ONE
    jitted fori_loop dispatch, so sub-ms phases resolve above the tunnel's
    per-dispatch latency (subtracted via the in-session RTT measurement)."""
    f = jax.jit(
        lambda x: jax.lax.fori_loop(0, inner, lambda i, a: body(a), x)
    )
    jax.block_until_ready(f(x0))
    best = float("inf")
    for i in range(reps):
        a0 = jax.tree.map(lambda x: x * (1.0 + 1e-7 * (i + 1)), x0)
        t0 = time.perf_counter()
        jax.block_until_ready(f(a0))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return max(best - _RTT[0], 1e-9) / inner


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

    rtt = measure_rtt()
    print(f"tunnel rtt: {rtt:.2f} ms")

    # --- A: eval_assemble (strain + radial return + residual + factors) ----
    model = models[0]
    u_gm = geo.to_grid_major(st.u)
    sig0, h0 = st.stress[0], st.histories[0]

    def eval_assemble(u_gm):
        eps = geo.strain_gm(u_gm)
        s_new, tg, h_new = model.evaluate_packed(st.t, dt, eps, sig0, h0)
        return geo.residual_gm(s_new), s_new, tg, h_new

    def bodyA(u):
        r, s_new, tg, h_new = eval_assemble(u)
        # tap every output so the factor/history writes aren't DCE'd (the
        # production step materializes them across the CG while_loop)
        tap = (
            s_new.sum() + tg.beta.sum() + tg.gamma.sum() + tg.n.sum()
            + h_new["alpha"].sum()
        )
        return u * 0.999999 + r * 1e-20 + tap * 1e-30

    msA = timeit("eval", bodyA, u_gm * 1.01)
    # bytes: u[3M] r + eps[sQM] w+r + stress in/out + alpha in/out +
    # factors (beta,gamma[QM], n[sQM]) w + residual w + corner channels
    bytesA = f32 * M * (
        3 + 2 * s * Q + 2 * s * Q + 2 * Q + 2 * Q + s * Q + 3 + 24
    )
    row("A eval_assemble", msA, bytesA)

    # --- B: one fused matvec ------------------------------------------------
    _, _, tg, _ = jax.jit(eval_assemble)(u_gm)
    pmv = build_pallas_matvec(geo)
    msB = timeit(
        "matvec", lambda v: pmv(v, tg) * jnp.float32(1e-6) + v * 0.5, u_gm
    )
    # reads v[3M] + factors (beta,gamma [QM], n [sQM]) + writes out[3M]
    bytesB = f32 * M * (3 + 2 * Q + s * Q + 3)
    flopsB = M * Q * (24 * 2 + 25)  # strain+div matmuls + factored apply
    row("B pallas matvec", msB, bytesB, flopsB)

    # --- C: one V-cycle ------------------------------------------------------
    msC = timeit("vcycle", lambda v: mg(v) * jnp.float32(1e-6) + v * 0.5, u_gm)
    # per fine smoothing sweep: elastic apply (corner channels 24M r+w) +
    # diag scale + residual; 2*(nu)+1 fine applies + coarse levels (~1/8)
    n_apply = 2 * 3 + 1
    bytesC = f32 * M * (n_apply * (24 + 24 + 6) + 9) * 1.14  # + coarse ~14%
    row("C V(3,3) cycle", msC, bytesC)

    # --- D: one CG iteration (matvec + cycle + 2 dots + 3 axpys) ------------
    bytesD = bytesB + bytesC + f32 * M * 3 * (2 * 2 + 3 * 3)
    row("D cg_iteration", msB + msC + 0.0, bytesD)

    # --- E: full Newton step (real ramp: +0.05 load scale per step, the
    # bench's own granularity, so every step does representative work) ------
    def bodyE(carry):
        st_i, k = carry
        st2, _ = step(
            models, st_i, dj, vj * (2.0 + 0.05 * k), f0, dt
        )
        return (st2, k + 1.0)

    msE = timeit("step", bodyE, (st, jnp.asarray(0.0, state.u.dtype)))
    bytesE = 2 * bytesA + 9 * bytesD
    row("E full step (1 Newton)", msE, bytesE)

    print(f"\n{'phase':26s} {'ms':>8s} {'MB moved':>10s} {'bw-floor ms':>12s}"
          f" {'x floor':>8s} {'GFLOP':>8s}")
    for name, ms, mb, floor, ratio, gf in rows:
        print(f"{name:26s} {ms:8.3f} {mb:10.1f} {floor:12.3f} {ratio:8.2f}"
              f" {gf:8.2f}")


def main_windowed() -> None:
    """Roofline for the WINDOWED engine (general unstructured meshes).

    The exchange primitives are MXU-bound one-hot contractions (3 bf16
    passes, ops/pallas_window.py), so the table carries both the HBM floor
    and the MXU floor (issued FLOPs at bf16 peak, incl. the 72->128 M-dim
    padding); 'x floor' is against max(bw, mxu).
    """
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 35
    from fenics_constitutive_tpu.fem import (
        DirichletBC, FunctionSpace, unit_cube_mesh,
    )
    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.fem.mesh import Mesh
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver.packed_step import (
        build_packed_problem, make_packed_step,
    )

    m0 = unit_cube_mesh(n, n, n, "tetra")
    rng = np.random.default_rng(0)
    pi = rng.permutation(m0.num_nodes)
    nodes = np.empty_like(m0.nodes)
    nodes[pi] = m0.nodes
    mesh = Mesh(nodes, pi[m0.cells].astype(np.int32), "tetra")
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
    geos, models, state = build_packed_problem(
        V, law, q_degree=2, engine="windowed"
    )
    geo, model = geos[0], models[0]
    ex = geo.ex
    f32 = 4
    K = geo.vs
    print(f"{mesh.num_cells} tets, {geo.N} QPs | T={ex.T} B={ex.B} "
          f"C_B={ex.C_B} P={ex.P} W1={ex.W1} Rn={ex.Rn}")
    rtt = measure_rtt()
    print(f"tunnel rtt: {rtt:.2f} ms")

    MXU_BF16 = 197e12  # v5e peak
    # issued MXU FLOPs for one exchange op: 3 split passes, M padded to 128
    grid = ex.B * (ex.Rn // min(ex.Rn, 2048 if ex.Rn % 2048 == 0 else 1024))
    m_pad = -(-K * ex.W1 // 128) * 128
    mxu_flops = 3 * grid * m_pad * ex.W2 * min(ex.Rn, 1024) * 2

    rows = []

    def row(name, ms, bytes_moved, flops=0.0):
        bw_floor = bytes_moved / HBM_GBS / 1e6
        mxu_floor = flops / MXU_BF16 * 1e3
        floor = max(bw_floor, mxu_floor)
        rows.append((name, ms, bytes_moved / 1e6, floor,
                     ms / floor if floor else float("inf"), flops / 1e9))

    phases = __import__("os").environ.get(
        "ROOF_PHASES", "gather,scatter,matvec,eval,step"
    ).split(",")
    rng2 = np.random.default_rng(1)
    u2 = jnp.asarray(rng2.standard_normal((K, ex.M_pad)).astype(np.float32))
    f_rows = jnp.asarray(
        rng2.standard_normal((ex.B, K, ex.Rn)).astype(np.float32)
    )
    ui = jnp.asarray(rng2.standard_normal(geo.ndofs_int).astype(np.float32))

    bytes_g = f32 * (ex.B * K * ex.P * ex.T + ex.B * ex.Rn + ex.B * K * ex.Rn)
    if "gather" in phases:
        msG = timeit(
            "gather", lambda u: u * 0.999999 + ex.gather(u).sum() * 1e-20, u2
        )
        row("gather", msG, bytes_g, mxu_flops)

    if "scatter" in phases:
        msS = timeit(
            "scatter", lambda f: f * 0.999999 + ex.scatter(f)[0, 0] * 1e-20,
            f_rows,
        )
        row("scatter", msS, bytes_g, mxu_flops)

    from fenics_constitutive_tpu.ops.packed import IsotropicTangent

    tg = IsotropicTangent(
        kappa=jnp.float32(175000.0),
        beta=jnp.full(geo.N, 2 * 80769.0, jnp.float32),
        gamma=jnp.zeros(geo.N, jnp.float32),
        n=jnp.zeros((6, geo.N), jnp.float32),
    )
    # dN [4, 3, N] read twice (strain + residual) + tangent factors + exchanges
    bytes_mv = f32 * (
        2 * 12 * geo.N + 8 * geo.N + 2 * geo.N  # dN x2, n+beta+gamma, w
    ) + 2 * bytes_g
    if "matvec" in phases:
        msM = timeit(
            "matvec",
            lambda v: geo.matvec(v, tg) * jnp.float32(1e-6) + v * 0.5, ui,
        )
        row("matvec", msM, bytes_mv, 2 * mxu_flops)

    sig0, h0 = state.stress[0], state.histories[0]
    dtj = jnp.asarray(1.0, jnp.float32)

    def bodyEv(u):
        eps = geo.strain(u)
        s2, tg2, h2 = model.evaluate_packed(jnp.float32(0.0), dtj, eps, sig0, h0)
        r = geo.residual(s2)
        tap = s2.sum() + tg2.beta.sum() + tg2.n.sum() + h2["alpha"].sum()
        return u * 0.999999 + r * 1e-20 + tap * 1e-30

    # stress/history in+out + factors + eps + dN x2 + exchanges
    bytes_ev = f32 * geo.N * (6 * 4 + 7 * 2 + 8 + 2 * 12 + 2) + 2 * bytes_g
    if "eval" in phases:
        msEv = timeit("eval", bodyEv, ui)
        row("eval_assemble", msEv, bytes_ev, 2 * mxu_flops)

    bc_dofs, bc_vals = combine_bcs(bcs)
    step = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400,
        cg_fixed_iters=int(
            __import__("os").environ.get("ROOF_FIXED", "40")
        ),
    )
    dj = jnp.asarray(bc_dofs)
    vj = jnp.asarray(bc_vals, jnp.float32)
    f0 = jnp.zeros_like(state.u)  # windowed f_ext is INTERNAL-layout
    jitted = jax.jit(lambda st, sc: step(models, st, dj, vj * sc, f0, dtj))
    st = state
    for k in (0.5, 1.0, 1.5, 2.0):
        st, _ = jitted(st, jnp.asarray(k, jnp.float32))
    jax.block_until_ready(st.u)

    fixed = int(__import__("os").environ.get("ROOF_FIXED", "40"))

    def bodyE(carry):
        st_i, k = carry
        st2, _ = step(models, st_i, dj, vj * (2.0 + 0.05 * k), f0, dtj)
        return (st2, k + 1.0)

    if "step" in phases:
        msE = timeit(
            "step", bodyE, (st, jnp.asarray(0.0, jnp.float32)), inner=5
        )
        bytes_E = 2 * bytes_ev + fixed * bytes_mv
        row(f"full step (fixed-{fixed} CG)", msE, bytes_E,
            (2 + 2 * fixed) * mxu_flops)

    print(f"\n{'phase':26s} {'ms':>8s} {'MB moved':>10s} {'floor ms':>12s}"
          f" {'x floor':>8s} {'GFLOP':>8s}")
    for name, ms, mb, floor, ratio, gf in rows:
        print(f"{name:26s} {ms:8.3f} {mb:10.1f} {floor:12.3f} {ratio:8.2f}"
              f" {gf:8.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "windowed":
        main_windowed()
    else:
        main()
