"""A/B the windowed engine's preconditioner on the real chip (VERDICT r4 #7).

Measures, at the unstructured-bench scale (imported-style tet mesh):
  1. one windowed-AMG V-cycle apply (in-dispatch loop timing);
  2. adaptive-CG iteration counts per Newton iteration, Jacobi vs AMG
     (bounded maxiter so dispatches stay short — the round-4 'windowed
     full-step crash' was over-long dispatches being killed, see
     docs/performance.md);
  3. wall-clock per Newton iteration for both.

Run: python scripts/ab_windowed_pc.py [n]
Env: NU (V-cycle smoothing sweeps, default 2), MAXIT (CG cap, default 150)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    nu = int(os.environ.get("NU", "2"))
    maxit = int(os.environ.get("MAXIT", "150"))
    from fenics_constitutive_tpu.fem import (
        DirichletBC, FunctionSpace, unit_cube_mesh,
    )
    from fenics_constitutive_tpu.fem.mesh import Mesh
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver import PackedSimulation

    m0 = unit_cube_mesh(n, n, n, "tetra")
    rng = np.random.default_rng(0)
    pi = rng.permutation(m0.num_nodes)
    nodes = np.empty_like(m0.nodes)
    nodes[pi] = m0.nodes
    mesh = Mesh(nodes, pi[m0.cells].astype(np.int32), "tetra")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    def mkbcs():
        bm = DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
        )
        return bm, [
            DirichletBC(
                V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0
            ),
            bm,
            DirichletBC(
                V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0
            ),
            DirichletBC(
                V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0
            ),
        ]

    # --- V-cycle apply cost (in-dispatch loop) -------------------------------
    bm, bcs = mkbcs()
    t0 = time.time()
    sim = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2, engine="windowed",
        preconditioner="amg", dtype=jnp.float32,
        newton_rtol=1e-6, newton_atol=1e-3,
        cg_rtol=1e-5, cg_maxiter=maxit,
        mg_options={
            "nu": nu,
            "tile_rows": int(os.environ.get("TR", "512")),
        },
    )
    print(f"build (incl AMG hierarchy): {time.time() - t0:.1f}s", flush=True)
    geo = sim._geos[0]
    pc = sim._operands[1]
    apply_int = pc.wrap_internal(geo.ex.M_pad)

    reps = int(os.environ.get("REPS", "50"))
    ui = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal(geo.ndofs_int)
        .astype(np.float32)
    )

    def loop_vc(u):
        def body(i, acc):
            return apply_int(acc) * jnp.float32(1e-3) + acc * 0.5

        return jax.lax.fori_loop(0, reps, body, u)

    f = jax.jit(loop_vc)
    jax.block_until_ready(f(ui))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(ui * (1.0 + 1e-6 * i)))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    print(f"V({nu},{nu}) windowed-AMG cycle: {best / reps:.3f} ms/apply",
          flush=True)

    # same cycle with the hierarchy crossing jit as an ARGUMENT (the
    # production step's operand pattern) instead of closure constants —
    # isolates whether the in-step cycle's ~2x cost vs the isolated apply
    # (roofline r5) comes from argument-passing/layout or from context
    def loop_vc_arg(pc_a, u):
        apply_a = pc_a.wrap_internal(geo.ex.M_pad)

        def body(i, acc):
            return apply_a(acc) * jnp.float32(1e-3) + acc * 0.5

        return jax.lax.fori_loop(0, reps, body, u)

    fa = jax.jit(loop_vc_arg)
    jax.block_until_ready(fa(pc, ui))
    best_a = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fa(pc, ui * (1.0 + 1e-6 * i)))
        best_a = min(best_a, (time.perf_counter() - t0) * 1000.0)
    print(
        f"V({nu},{nu}) cycle, hierarchy as jit ARG: {best_a / reps:.3f} "
        "ms/apply", flush=True,
    )

    # --- adaptive-CG counts + step wall, AMG --------------------------------
    def drive(sim, bm, label):
        for k in (1, 2, 3):
            bm.value = 0.004 * k
            t0 = time.perf_counter()
            niter, conv = sim.solve()
            w = (time.perf_counter() - t0) * 1000.0
            st = sim.last_stats
            print(
                f"  {label} step {k}: {w:9.1f} ms newton={int(st['newton_iters'])}"
                f" cg_last={int(st['cg_iters_last'])}"
                f" r/r0={float(st['r_norm']) / max(float(st['r0_norm']), 1e-30):.2e}"
                f" conv={conv}",
                flush=True,
            )

    drive(sim, bm, "amg")

    if os.environ.get("JACOBI", "1") != "0":
        bm2, bcs2 = mkbcs()
        sim2 = PackedSimulation(
            VonMises3D(MAT), V, bcs2, 2, engine="windowed",
            dtype=jnp.float32, preconditioner=None,  # explicit Jacobi arm
            newton_rtol=1e-6, newton_atol=1e-3,
            cg_rtol=1e-5, cg_maxiter=maxit,
        )
        drive(sim2, bm2, "jacobi")


if __name__ == "__main__":
    main()
