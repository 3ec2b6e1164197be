"""Bisect the n=35 windowed full-step TPU worker crash.

Stages (each one jitted dispatch, scale = the crashing config):
  1. gather+scatter chained 100x in a fori_loop
  2. full matvec (strain -> tangent -> residual) 100x in a fori_loop
  3. matvec loop + f64-reduction dots (the CG loop's scalar pattern)
  4. the real jitted Newton step via make_packed_step (the crasher)
  5. eval chain (strain -> VonMises3D.evaluate_packed -> residual) x10
  6. jacobi_diag x10
  7. real linear.cg_solve (adaptive while_loop + jacobi diag), one dispatch
  8. cg_solve nested in an outer 2-iteration while_loop (Newton skeleton,
     no model eval)
  9. cg_solve followed by the model eval chain in ONE dispatch (a full
     Newton iteration's work, no outer loop)
 10. stage-9 body nested in a 2-iteration while_loop (the exact Newton
     skeleton of make_packed_step's windowed path — the suspected crasher)

Run: python scripts/repro_windowed_fault.py [n] [stage]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    stage = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = all
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
    geo = build_windowed_geometry(V, 2, Constraint.FULL, dtype=jnp.float32)
    ex = geo.ex
    print(
        f"{mesh.num_cells} tets, B={ex.B} C_B={ex.C_B} P={ex.P} W1={ex.W1} "
        f"Rn={ex.Rn} N={geo.N}",
        flush=True,
    )

    ui = jnp.asarray(
        rng.standard_normal(geo.ndofs_int).astype(np.float32)
    )
    tg = IsotropicTangent(
        kappa=jnp.float32(175000.0),
        beta=jnp.full(geo.N, 2 * 80769.0, jnp.float32),
        gamma=jnp.zeros(geo.N, jnp.float32),
        n=jnp.zeros((6, geo.N), jnp.float32),
    )

    def run(name, fn, *args):
        t0 = time.time()
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"  {name}: OK {time.time() - t0:.1f}s", flush=True)
        return out

    if stage in (0, 1):
        def loop_gs(u):
            u2 = u.reshape(geo.vs, ex.M_pad)

            def body(i, acc):
                rows = ex.gather(acc)
                return ex.scatter(rows) * (1.0 / 28.0)

            return jax.lax.fori_loop(0, 100, body, u2)

        run("stage1 gather+scatter x100", loop_gs, ui)

    if stage in (0, 2):
        def loop_mv(u):
            def body(i, acc):
                mv = geo.matvec(acc, tg)
                return mv / jnp.float32(1e6)

            return jax.lax.fori_loop(0, 100, body, u)

        with jax.default_matmul_precision("highest"):
            run("stage2 matvec x100 (highest)", loop_mv, ui)

    if stage in (0, 3):
        import os

        reps = int(os.environ.get("REPS", "100"))

        def loop_cgish(u):
            def body(i, carry):
                p, r = carry
                q = geo.matvec(p, tg)
                a = (
                    jnp.vdot(r.astype(jnp.float64), r.astype(jnp.float64))
                    / jnp.vdot(p.astype(jnp.float64), q.astype(jnp.float64))
                ).astype(jnp.float32)
                r2 = r - a * q
                return (r2 + 0.5 * p, r2)

            p, r = jax.lax.fori_loop(0, reps, body, (u, u))
            return r

        with jax.default_matmul_precision("highest"):
            run(f"stage3 cg-ish x{reps} (f64 dots)", loop_cgish, ui)

    if stage in (0, 5, 6, 7, 8, 9, 10):
        from fenics_constitutive_tpu.models import VonMises3D
        from fenics_constitutive_tpu.solver import linear
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
        g = geos[0]
        model = models[0]
        sig0 = state0.stress[0]
        h0 = state0.histories[0]
        du = ui * jnp.float32(1e-3)

        if stage in (0, 5):
            def loop_eval(d):
                def body(i, carry):
                    acc, s, h = carry
                    eps = g.strain(acc)
                    s2, tg2, h2 = model.evaluate_packed(
                        jnp.float32(0.0), jnp.float32(1.0), eps, s, h
                    )
                    r = g.residual(s2)
                    return (r * jnp.float32(1e-9), s2, h2)

                out, _, _ = jax.lax.fori_loop(0, 10, body, (d, sig0, h0))
                return out

            run("stage5 eval chain x10", loop_eval, du)

        if stage in (0, 6, 7, 8, 9, 10):
            eps = jax.jit(g.strain)(du)
            _, tg, _ = jax.jit(
                lambda e: model.evaluate_packed(
                    jnp.float32(0.0), jnp.float32(1.0), e, sig0, h0
                )
            )(eps)
            tg = jax.block_until_ready(tg)

        if stage in (0, 6):
            def loop_diag(t):
                def body(i, acc):
                    return acc + g.jacobi_diag(t)

                return jax.lax.fori_loop(
                    0, 10, body, jnp.zeros(g.ndofs_int, jnp.float32)
                )

            run("stage6 jacobi_diag x10", loop_diag, tg)

        if stage in (0, 7, 8, 9, 10):
            free = jnp.ones(g.ndofs_int, bool)

            def cg_once(t, b):
                diag = jnp.where(free, g.jacobi_diag(t), 1.0)

                def mv(v):
                    return g.matvec(v, t)

                x, k = linear.cg_solve(
                    mv, b, diag, rtol=1e-5, maxiter=100,
                    reduce_dtype=jnp.float64,
                )
                return x, k

            if stage in (0, 7):
                x, k = run("stage7 cg_solve(maxiter=100)", cg_once, tg, du)
                print(f"    cg iters: {int(k)}", flush=True)

            if stage in (0, 9, 10):
                def newton_iter(u, r, s, h):
                    """One full Newton iteration's work: solve then re-eval."""
                    delta, _ = cg_once(tg, r)
                    u2 = u - delta
                    eps2 = g.strain(u2)
                    s2, _tg2, h2 = model.evaluate_packed(
                        jnp.float32(0.0), jnp.float32(1.0), eps2, s, h
                    )
                    r2 = g.residual(s2)
                    return u2, r2, s2, h2

                if stage == 9:
                    run(
                        "stage9 cg+eval one dispatch",
                        lambda u, r: newton_iter(u, r, sig0, h0)[1],
                        du, du,
                    )

                if stage == 10:
                    def newton_skel2(u0, r0):
                        def cond(carry):
                            return carry[4] < 2

                        def body(carry):
                            u, r, s, h, it = carry
                            u2, r2, s2, h2 = newton_iter(u, r, s, h)
                            return (u2, r2, s2, h2, it + 1)

                        out = jax.lax.while_loop(
                            cond, body,
                            (u0, r0, sig0, h0, jnp.asarray(0, jnp.int32)),
                        )
                        return out[1]

                    run("stage10 (cg+eval) in while x2", newton_skel2, du, du)

            if stage in (0, 8):
                def newton_skel(t, b):
                    def cond(carry):
                        it = carry[1]
                        return it < 2

                    def body(carry):
                        u, it = carry
                        x, _ = cg_once(t, u)
                        return (b + x * jnp.float32(1e-9), it + 1)

                    out, _ = jax.lax.while_loop(
                        cond, body, (b, jnp.asarray(0, jnp.int32))
                    )
                    return out

                run("stage8 cg in while_loop x2", newton_skel, tg, du)

    if stage in (0, 4):
        from fenics_constitutive_tpu.fem import DirichletBC
        from fenics_constitutive_tpu.models import VonMises3D
        from fenics_constitutive_tpu.solver import PackedSimulation

        def close(axis, v):
            return lambda x: np.isclose(x[:, axis], v)

        bm = DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004
        )
        bcs = [
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
        mat = {
            "p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
            "p_y00": 2500.0, "p_w": 200.0,
        }
        sim = PackedSimulation(
            VonMises3D(mat), V, bcs, 2, engine="windowed",
            dtype=jnp.float32, newton_rtol=1e-6, newton_atol=1e-3,
            cg_rtol=1e-5, cg_maxiter=2000,
        )
        t0 = time.time()
        niter, conv = sim.solve()
        print(
            f"  stage4 full step: OK {time.time() - t0:.1f}s conv={conv}",
            flush=True,
        )


if __name__ == "__main__":
    main()
