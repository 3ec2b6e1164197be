"""Honest windowed-engine primitive timings: K reps inside ONE dispatch.

The remote-TPU tunnel adds per-dispatch latency (measured 80-150 ms in some
sessions), so single-dispatch timings (bench_unstructured._primitives) are
upper bounds only. Here each primitive runs REPS times in a fori_loop inside
one jitted dispatch; per-op ms = (window_wall - rtt) / REPS with the tunnel
round trip measured in-session on a trivial op.

Run: python scripts/micro_windowed.py [n] [reps]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
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
    tile = int(os.environ.get("BENCH_TILE", "1024"))
    geo = build_windowed_geometry(
        V, 2, Constraint.FULL, dtype=jnp.float32, tile=tile
    )
    ex = geo.ex
    print(
        f"{mesh.num_cells} tets, B={ex.B} C_B={ex.C_B} P={ex.P} W={ex.W} "
        f"W1={ex.W1} Rn={ex.Rn} N={geo.N} M_pad={ex.M_pad}",
        flush=True,
    )

    # tunnel round trip: tiny op, distinct inputs so nothing memoizes
    tiny = jax.jit(lambda x: x * 1.000001 + 1.0)
    z = jnp.zeros(8, jnp.float32)
    z = jax.block_until_ready(tiny(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        z = jax.block_until_ready(tiny(z))
        rtts.append((time.perf_counter() - t0) * 1000.0)
    rtt = min(rtts)
    print(f"tunnel rtt: {rtt:.1f} ms (min of {[round(r,1) for r in rtts]})",
          flush=True)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))  # compile
        best = float("inf")
        for i in range(3):
            a0 = jax.tree.map(lambda x: x * (1.0 + 1e-7 * (i + 1)), args[0])
            t0 = time.perf_counter()
            jax.block_until_ready(f(a0, *args[1:]))
            best = min(best, (time.perf_counter() - t0) * 1000.0)
        per = (best - rtt) / reps
        print(f"  {name:40s} {per:9.3f} ms/op   (window {best:8.1f} ms)",
              flush=True)
        return out

    u2 = jnp.asarray(rng.standard_normal((3, ex.M_pad)).astype(np.float32))
    rows = jnp.asarray(
        rng.standard_normal((ex.B, 3, ex.Rn)).astype(np.float32)
    )
    ui = jnp.asarray(rng.standard_normal(geo.ndofs_int).astype(np.float32))
    tg = IsotropicTangent(
        kappa=jnp.float32(175000.0),
        beta=jnp.full(geo.N, 2 * 80769.0, jnp.float32),
        gamma=jnp.zeros(geo.N, jnp.float32),
        n=jnp.zeros((6, geo.N), jnp.float32),
    )

    which = os.environ.get("OPS", "gather,scatter,matvec").split(",")

    if "gather" in which:
        def loop_gather(u):
            def body(i, acc):
                r = ex.gather(acc)
                # serialize iterations via a scalar (cost: one 13 MB read,
                # ~16 us at HBM peak — negligible vs the gather itself)
                return acc * 0.999999 + r.sum() * 1e-20

            return jax.lax.fori_loop(0, reps, body, u)

        timed(f"gather x{reps}", loop_gather, u2)

    if "scatter" in which:
        def loop_scatter(r):
            def body(i, acc):
                u = ex.scatter(acc)
                return acc * 0.999999 + u[0, 0] * 1e-20

            return jax.lax.fori_loop(0, reps, body, r)

        timed(f"scatter x{reps}", loop_scatter, rows)

    if "matvec" in which:
        def loop_mv(u):
            def body(i, acc):
                return geo.matvec(acc, tg) * jnp.float32(1e-6) + acc * 0.5

            return jax.lax.fori_loop(0, reps, body, u)

        timed(f"matvec x{reps}", loop_mv, ui)

    if "perm" in which:
        ue = jnp.asarray(
            rng.standard_normal(geo.ndofs).astype(np.float32)
        )

        def loop_perm(u):
            def body(i, acc):
                return geo.from_internal(geo.to_internal(acc))[: u.shape[0]] * 0.999999

            return jax.lax.fori_loop(0, reps, body, u)

        timed(f"to_internal+from_internal x{reps}", loop_perm, ue)

    if "strain" in which:
        def loop_strain(u):
            def body(i, acc):
                eps = geo.strain(acc)
                return acc * 0.999999 + geo.residual(eps) * 1e-20

            return jax.lax.fori_loop(0, reps, body, u)

        timed(f"strain+residual x{reps}", loop_strain, ui)


if __name__ == "__main__":
    main()
