"""Bisect the n=35 windowed full-step TPU worker crash.

Stages (each one jitted dispatch, scale = the crashing config):
  1. gather+scatter chained 100x in a fori_loop
  2. full matvec (strain -> tangent -> residual) 100x in a fori_loop
  3. matvec loop + f64-reduction dots (the CG loop's scalar pattern)
  4. the real jitted Newton step via make_packed_step (the crasher)

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
