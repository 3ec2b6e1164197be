"""Separate COMPILE time from RUN time for the windowed engine's core ops.

The n=35 repro stages run 35-370 s wall including jit; this script lowers +
compiles each op explicitly (timed) and then times pure device execution,
so we know whether the windowed matvec is fast enough for sub-second
1M-QP Newton steps and where the compile time goes.

Run: python scripts/profile_windowed_compile.py [n] [op ...]
ops: gather scatter strain matvec mvloop eval diag cg
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    jax.block_until_ready(compiled(*args))  # warm (alloc, transfer)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    print(
        f"  {name:28s} lower {t_lower:7.2f}s  compile {t_compile:7.2f}s  "
        f"run {best * 1000:9.2f} ms",
        flush=True,
    )
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    ops = set(sys.argv[2:]) or {"gather", "strain", "matvec", "mvloop"}
    from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh
    from fenics_constitutive_tpu.fem.mesh import Mesh
    from fenics_constitutive_tpu.ops.mandel import Constraint
    from fenics_constitutive_tpu.ops.packed import IsotropicTangent
    from fenics_constitutive_tpu.ops.windowed import build_windowed_geometry

    m0 = unit_cube_mesh(n, n, n, "tetra")
    rng = np.random.default_rng(0)
    pi = rng.permutation(m0.num_nodes)
    nodes = np.empty_like(m0.nodes)
    nodes[pi] = m0.nodes
    mesh = Mesh(nodes, pi[m0.cells].astype(np.int32), "tetra")
    V = FunctionSpace(mesh, 1, 3)
    t0 = time.perf_counter()
    geo = build_windowed_geometry(V, 2, Constraint.FULL, dtype=jnp.float32)
    ex = geo.ex
    print(
        f"{mesh.num_cells} tets, N={geo.N} B={ex.B} C_B={ex.C_B} P={ex.P} "
        f"Rn={ex.Rn} build {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    ui = jnp.asarray(rng.standard_normal(geo.ndofs_int).astype(np.float32))
    u2 = ui.reshape(geo.vs, ex.M_pad)
    tg = IsotropicTangent(
        kappa=jnp.float32(175000.0),
        beta=jnp.full(geo.N, 2 * 80769.0, jnp.float32),
        gamma=jnp.zeros(geo.N, jnp.float32),
        n=jnp.zeros((6, geo.N), jnp.float32),
    )

    if "gather" in ops:
        bench("gather", ex.gather, u2)
    if "scatter" in ops:
        rows = jax.jit(ex.gather)(u2)
        bench("scatter", ex.scatter, rows)
    if "strain" in ops:
        bench("strain", geo.strain, ui)
    if "matvec" in ops:
        bench("matvec x1", lambda v: geo.matvec(v, tg), ui)
    if "mvloop" in ops:
        def loop_mv(u):
            def body(i, acc):
                return geo.matvec(acc, tg) / jnp.float32(1e6)

            return jax.lax.fori_loop(0, 100, body, u)

        t = bench("matvec x100 (fori)", loop_mv, ui)
        print(f"    -> {t * 10:.2f} ms per matvec", flush=True)
    if "diag" in ops:
        bench("jacobi_diag", lambda t_: geo.jacobi_diag(t_), tg)
    if "eval" in ops:
        from fenics_constitutive_tpu.models import VonMises3D
        from fenics_constitutive_tpu.solver.packed_step import (
            build_packed_problem,
        )

        mat = {
            "p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
            "p_y00": 2500.0, "p_w": 200.0,
        }
        geos, models, state0 = build_packed_problem(
            V, VonMises3D(mat), 2, jnp.float32, engine="windowed"
        )
        g, model = geos[0], models[0]
        sig0 = state0.stress[0]
        h0 = state0.histories[0]

        def eval_once(d):
            eps = g.strain(d)
            s2, tg2, h2 = model.evaluate_packed(
                jnp.float32(0.0), jnp.float32(1.0), eps, sig0, h0
            )
            return g.residual(s2), tg2.beta, h2["p_eps"]

        bench("eval_assemble x1", eval_once, ui * jnp.float32(1e-3))
    if "cg" in ops:
        from fenics_constitutive_tpu.solver import linear

        free = jnp.ones(geo.ndofs_int, bool)

        def cg_once(b):
            diag = jnp.where(free, geo.jacobi_diag(tg), 1.0)
            x, k = linear.cg_solve(
                lambda v: geo.matvec(v, tg), b, diag, rtol=1e-5,
                maxiter=100, reduce_dtype=jnp.float64,
            )
            return x, k

        bench("cg_solve(100)", cg_once, ui)


if __name__ == "__main__":
    main()
