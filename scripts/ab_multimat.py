"""Measure the multi-material structured fast path at bench scale on TPU.

Two-material 50^3 hex cube (soft elastic inclusion slab + von Mises matrix,
500k QPs each), PackedSimulation with the whole-grid V-cycle, 16-step
solve_schedule dispatches — the multi-law analog of bench.py's workload.
Before r3's restrict_structured_geometry, this configuration fell back to
the serialized-gather engine (~29 us/QP measured, docs/performance.md);
now it runs n_laws masked conv sweeps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_multimat.py
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

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import (
    Constraint,
    LinearElasticityModel,
    VonMises3D,
)
from fenics_constitutive_tpu.solver import PackedSimulation

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def main() -> None:
    n = int(os.environ.get("MM_N", "50"))
    K = int(os.environ.get("MM_STEPS", "16"))
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
    mid = mesh.cell_midpoints()
    cells_soft = np.flatnonzero(mid[:, 2] < 0.5).astype(np.int32)
    cells_hard = np.flatnonzero(mid[:, 2] >= 0.5).astype(np.int32)
    laws = [
        (LinearElasticityModel({"E": 150000.0, "nu": 0.3}, Constraint.FULL),
         cells_soft),
        (VonMises3D(MAT), cells_hard),
    ]
    fixed = os.environ.get("MM_FIXED")  # optional fixed CG count
    sim = PackedSimulation(
        laws, V, bcs, 2, preconditioner="vcycle",
        mg_options={"nu": 3, "nu_coarse": 2, "coarse_direct": True},
        newton_rtol=0.0, newton_atol=0.0, max_newton=1,
        cg_rtol=1e-5, cg_maxiter=400,
        cg_fixed_iters=int(fixed) if fixed else None,
    )
    for g in sim._geos:
        assert hasattr(g, "matvec_gm"), "fell off the structured path"
    print(f"2 laws on {mesh.num_cells} hexes "
          f"({len(cells_soft)}/{len(cells_hard)} cells), "
          f"{sim._geos[0].N + sim._geos[1].N} logical QPs", flush=True)

    bc_dofs, _ = combine_bcs(bcs)
    move = set(np.asarray(bcs[1].dofs).tolist())
    cols = [i for i, d in enumerate(bc_dofs) if d in move]

    # warm past yield with a COMMITTED ramp: solve_schedule commits state
    # (plain solve() with this zero-tolerance single-iteration config
    # reports unconverged and rolls back, leaving the state virgin)
    warm = np.zeros((3, len(bc_dofs)))
    warm[:, cols] = (0.004 * np.array([0.5, 1.0, 1.5]))[:, None]
    sim.solve_schedule(warm)
    jax.block_until_ready(sim.state.u)
    print("warmed (committed)", flush=True)

    def ramp_vals(j):
        # bench.py's real-ramp protocol: +0.05 load scale per step
        vals = np.zeros((K, len(bc_dofs)))
        vals[:, cols] = (
            0.004 * (2.0 + 1e-3 * j + 0.05 * np.arange(K))
        )[:, None]
        return vals

    stats = sim.solve_schedule(ramp_vals(0))  # compile
    best = float("inf")
    for j in range(1, 4):
        t0 = time.perf_counter()
        stats = sim.solve_schedule(ramp_vals(j))
        w = (time.perf_counter() - t0) / K
        if w * K * 1000.0 >= 50.0:
            best = min(best, w)
    assert np.isfinite(best), (
        "every timing window was under the 50 ms tunnel-memoization guard; "
        "no honest number exists — rerun with larger MM_N/MM_STEPS"
    )
    r = float(stats["r_norm"][-1])

    # in-run deep-CG self-verification (bench.py protocol, VERDICT r4 #5):
    # with a FIXED count, re-run one ramp from the settled state with 3x and
    # 6x deeper fixed counts — the settled Newton residual saturates at the
    # linearization error once the linear solve converges, so fixed-F is
    # converged iff it matches deep, and deep is trusted iff it matches
    # 2x-deep (this config is off the single-law calibration).
    verified = None
    r_ref = r_ref2 = None
    if fixed:
        st_v = sim.state

        def settled(fk: int) -> float:
            sim_k = PackedSimulation(
                laws, V, bcs, 2, preconditioner="vcycle",
                mg_options={"nu": 3, "nu_coarse": 2, "coarse_direct": True},
                newton_rtol=0.0, newton_atol=0.0, max_newton=1,
                cg_rtol=1e-5, cg_maxiter=400, cg_fixed_iters=fk,
            )
            sim_k.state = st_v
            stats_k = sim_k.solve_schedule(ramp_vals(99))
            return float(stats_k["r_norm"][-1])

        r_fixed = settled(int(fixed))
        r_ref = settled(3 * int(fixed))
        r_ref2 = settled(6 * int(fixed))
        verified = (r_fixed <= 1.02 * r_ref) and (r_ref <= 1.02 * r_ref2)
        print(
            f"verify: fixed-{fixed} {r_fixed:.4f} vs deep-{3*int(fixed)} "
            f"{r_ref:.4f} vs deep-{6*int(fixed)} {r_ref2:.4f} -> "
            f"{'OK' if verified else 'UNDER-CONVERGED'}",
            flush=True,
        )

    print(json.dumps({
        "metric": "mises_multimat_50cube_newton_step",
        "value": round(best * 1000.0, 3), "unit": "ms",
        "n_laws": 2, "r_norm": round(r, 4),
        "cg_iters_last": int(stats["cg_iters_last"][-1]),
        **({"fixed_iters": int(fixed), "r_norm_ref": round(r_ref, 4),
            "r_norm_ref2": round(r_ref2, 4), "converged": verified}
           if fixed else {}),
    }))
    if fixed and not verified:
        sys.exit(1)


if __name__ == "__main__":
    main()
