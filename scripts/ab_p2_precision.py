"""A/B: does TPU matmul/conv precision set the f32 P2 true-residual floor?

Hypothesis (round 3): the documented ~2e-2 relative f32 floor on the P2
operator (docs/performance.md) is NOT inherent f32 round-off — it is the TPU
MXU's DEFAULT precision, which computes f32 einsum/conv via bfloat16
multiplies (eps ~ 8e-3). The P2 strain/divergence operators are stride-2
convs + folded matmuls, so every matvec perturbs the operator at bf16 level;
Krylov can never produce corrections below ~eps_matvec * cond.

Protocol: 32^3 P2 (the documented config), drive one load step past yield,
then run repeated single-Newton-iteration steps at constant load (= Newton
iterations with converged rtol-1e-5 V-cycle CG) and record the residual
trajectory, under (a) default precision and (b)
jax.default_matmul_precision('highest') (f32-accurate bf16_6x passes).
Also times the step to price the fix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_p2_precision.py [n] [q]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.ops.structured import build_structured_geometry
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def run_case(precision: str | None, n: int, q: int) -> None:
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 2, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    geos, models, state = build_packed_problem(V, VonMises3D(MAT), q)
    geo = geos[0]
    free = jnp.ones(V.ndofs, bool)
    bc_dofs, bc_vals = combine_bcs(bcs)
    free = free.at[jnp.asarray(bc_dofs)].set(False)
    m1 = unit_cube_mesh(*(2 * g for g in geo.grid), "hex")
    V1 = FunctionSpace(m1, 1, 3)
    geo1 = build_structured_geometry(V1, 2, geo.constraint, state.u.dtype)
    pc = build_multigrid(geo1, MAT["p_mu"], MAT["p_ka"], free)

    step = make_packed_step(
        geos, newton_rtol=0.0, newton_atol=0.0, max_newton=1,
        cg_rtol=1e-5, cg_maxiter=250, preconditioner=pc,
    )
    jitted = jax.jit(step)
    args = lambda st: (
        models, st, jnp.asarray(bc_dofs),
        jnp.asarray(bc_vals, state.u.dtype),
        jnp.zeros(V.ndofs, state.u.dtype), jnp.asarray(1.0, state.u.dtype),
    )
    tag = precision or "default"
    st = state
    r0 = None
    t_best = np.inf
    for it in range(8):
        t0 = time.perf_counter()
        st, stats = jitted(*args(st))
        jax.block_until_ready(st.u)
        dt_ms = (time.perf_counter() - t0) * 1e3
        if it >= 1:
            t_best = min(t_best, dt_ms)
        r = float(stats["r_norm"])
        if r0 is None:
            r0 = float(stats["r0_norm"])
        print(f"  [{tag}] iter {it}: r={r:.4e} r/r0={r / r0:.3e} "
              f"cg={int(stats['cg_iters_last'])} ({dt_ms:.0f} ms)", flush=True)
    print(f"[{tag}] floor r/r0 = {float(stats['r_norm']) / r0:.3e}, "
          f"best step {t_best:.1f} ms", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(f"P2 {n}^3, q_degree={q}", flush=True)
    run_case(None, n, q)
    with jax.default_matmul_precision("highest"):
        run_case("highest", n, q)


if __name__ == "__main__":
    main()
