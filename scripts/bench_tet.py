"""1M-QP von Mises Newton step on a TET mesh — the structured-tet engine.

The r3 AMG bench measured the gather-path tet engine at ~29 s per Newton
step (29 us/QP; TPU scalar gathers). StructuredTetGeometry folds the Kuhn
6-tet classes onto the hex corner channels (zero gathers); this script
times the same workload class on it, with bench.py's protocol: real load
ramp, K-step lax.scan dispatches, fixed-count CG verified in-run against a
deep fixed count.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_tet.py
Env: TET_N (default 35 -> 1.029M QPs), TET_FIXED (default 14),
     TET_STEPS (default 16), TET_VERIFY (default 40).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.ops.structured import StructuredTetGeometry
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def main() -> None:
    n = int(os.environ.get("TET_N", "35"))
    # honest minimum on the tet spectrum (in-run deep-CG sweep, v5e):
    # fixed-14 +0.15% PASSES (15.44 ms), fixed-13 +3.5% FAILS, fixed-16
    # +0.75% (16.85 ms), fixed-11 +14% FAILS
    fixed = int(os.environ.get("TET_FIXED", "14"))
    K = int(os.environ.get("TET_STEPS", "16"))
    verify = int(os.environ.get("TET_VERIFY", "40"))

    mesh = unit_cube_mesh(n, n, n, "tetra")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    geos, models, state = build_packed_problem(V, VonMises3D(MAT), q_degree=2)
    geo = geos[0]
    assert isinstance(geo, StructuredTetGeometry), type(geo)
    dtype = state.u.dtype
    print(f"{mesh.num_cells} tets, {V.ndofs} dofs, {geo.N} QPs "
          f"(structured-tet engine)", flush=True)

    bc_dofs, bc_vals = combine_bcs(bcs)
    free0 = jnp.ones(V.ndofs, bool).at[jnp.asarray(bc_dofs)].set(False)
    mg = build_multigrid(
        geo, MAT["p_mu"], MAT["p_ka"], free0,
        nu=3, nu_coarse=2, coarse_direct=True,
    )

    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, dtype)
    f_ext = jnp.zeros(V.ndofs, dtype)
    dt = jnp.asarray(1.0, dtype)

    def make(fk):
        step = make_packed_step(
            geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
            cg_rtol=1e-5, cg_maxiter=400, preconditioner=mg,
            cg_fixed_iters=fk,
        )

        def runK(st, scales):
            def body(carry, scale):
                s_out, stats = step(
                    models, carry, bc_dofs_j, bc_vals_j * scale, f_ext, dt
                )
                return s_out, stats["r_norm"]

            return jax.lax.scan(body, st, scales)

        return jax.jit(step, static_argnums=()), jax.jit(runK)

    jitted, runK = make(fixed)
    st = state
    for k in (0.5, 1.0, 1.5):
        st, _ = jitted(models, st, bc_dofs_j, bc_vals_j * k, f_ext, dt)
    jax.block_until_ready(st.u)

    def mkscales(j):
        return jnp.asarray([2.0 + 1e-4 * j + 0.05 * i for i in range(K)], dtype)

    probes = jax.block_until_ready(runK(st, mkscales(0)))[1]
    best, j = float("inf"), 0
    for _w in range(4):
        j += 1
        t0 = time.perf_counter()
        _, probes = runK(st, mkscales(j))
        jax.block_until_ready(probes)
        w = (time.perf_counter() - t0) / K
        if w * K * 1000.0 >= 50.0:
            best = min(best, w)
    assert np.isfinite(best), "all windows under the memoization guard"
    r_settled = float(np.asarray(probes)[-1])

    _, runK_deep = make(verify)
    _, probes_ref = jax.block_until_ready(runK_deep(st, mkscales(j)))
    r_ref = float(np.asarray(probes_ref)[-1])
    converged = bool(r_settled <= 1.02 * r_ref)

    print(json.dumps({
        "metric": "mises_tet_1MQP_newton_step_structured",
        "value": round(best * 1000.0, 3), "unit": "ms",
        "n_qp": int(geo.N), "cg_fixed_iters": fixed,
        "r_norm": round(r_settled, 4), "r_norm_ref": round(r_ref, 4),
        "converged": converged,
    }))
    if not converged:
        sys.exit(1)


if __name__ == "__main__":
    main()
