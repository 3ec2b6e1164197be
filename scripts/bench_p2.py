"""Measure the P2 (27-node hex) packed-engine Newton step at ~1M QPs on TPU.

The structured stencil engine is degree-1; P2 runs on the gather-based packed
engine (ops/packed.py). This script documents its measured cost at the
benchmark scale (VERDICT r1 #6: 'either a P2 structured path or a measured-
and-documented efficient packed path').

Run: python scripts/bench_p2.py [n_cells_per_edge] [q_degree]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)
from fenics_constitutive_tpu.fem.bcs import combine_bcs

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 2, 3)  # P2

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(
        V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004
    )
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    law = VonMises3D(MAT)
    t0 = time.perf_counter()
    geos, models, state = build_packed_problem(V, law, q)
    import dataclasses
    import os
    prec = os.environ.get("P2PREC")  # A/B the operator-conv precision
    if prec:
        geos = (dataclasses.replace(geos[0], conv_precision=prec),)
    print(
        f"P2 {n}^3 hex, q_degree={q}: QPs={geos[0].N:,} dofs={V.ndofs:,} "
        f"uniform={geos[0].uniform} (setup {time.perf_counter() - t0:.1f}s)"
    )
    # the refined-P1 lattice multigrid preconditions the P2 operator
    # (spectral equivalence; identical dof ordering so the grid-major
    # vectors coincide); without it f32 Jacobi-CG loses conjugacy on the
    # ill-conditioned P2 operator and Newton receives unusable directions
    from fenics_constitutive_tpu.fem.mesh import unit_cube_mesh as _ucm
    from fenics_constitutive_tpu.ops.structured import (
        build_structured_geometry,
    )
    from fenics_constitutive_tpu.solver.multigrid import build_multigrid

    free = jnp.ones(V.ndofs, bool)
    bc_dofs0, _ = combine_bcs(bcs)
    free = free.at[jnp.asarray(bc_dofs0)].set(False)
    geo = geos[0]
    m1 = _ucm(*(2 * g for g in geo.grid), "hex")
    V1 = FunctionSpace(m1, 1, 3)
    geo1 = build_structured_geometry(V1, 2, geo.constraint, geo.KEPS_c.dtype)
    pc = build_multigrid(geo1, MAT["p_mu"], MAT["p_ka"], free)
    # same metric as the P1 bench: ONE Newton iteration with a CONVERGED
    # (rtol 1e-5 recursion) preconditioned CG. In f32 the P2 operator's
    # true-residual floor is ~2e-2 (docs/performance.md); tight-tolerance
    # P2 runs should enable x64.
    step = make_packed_step(
        geos, newton_rtol=0.0, newton_atol=0.0, max_newton=1,
        cg_rtol=1e-5, cg_maxiter=250, preconditioner=pc,
    )
    jitted = jax.jit(step)
    bc_dofs, bc_vals = combine_bcs(bcs)
    args = lambda v: (
        models, state, jnp.asarray(bc_dofs),
        jnp.asarray(bc_vals, state.u.dtype) * 0 + v,
        jnp.zeros(V.ndofs, state.u.dtype), jnp.asarray(1.0, state.u.dtype),
    )
    # warmup/compile
    t0 = time.perf_counter()
    new_state, stats = jitted(*args(0.004))
    jax.block_until_ready(new_state.u)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"niter={int(stats['newton_iters'])} cg_last={int(stats['cg_iters_last'])}")
    # timed converged steps from the committed plastic state (vary load to
    # defeat tunnel memoization)
    best = np.inf
    for k in range(5):
        v = 0.004 * (1.0 + 1e-4 * (k + 1))
        t0 = time.perf_counter()
        s2, stats = jitted(*args(v))
        jax.block_until_ready(s2.u)
        dt_ms = (time.perf_counter() - t0) * 1e3
        best = min(best, dt_ms)
        print(f"  step: {dt_ms:8.1f} ms  niter={int(stats['newton_iters'])} "
              f"cg_last={int(stats['cg_iters_last'])} r={float(stats['r_norm']):.2e} "
              f"r/r0={float(stats['r_norm']) / max(float(stats['r0_norm']), 1e-30):.2e}")
    per_qp = best / geos[0].N * 1e6
    print(f"best converged P2 step: {best:.1f} ms  ({per_qp:.1f} ns/QP)")


if __name__ == "__main__":
    main()
