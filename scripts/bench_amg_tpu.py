"""AMG-on-TPU benchmark: the unstructured-mesh production path on the chip.

The headline bench (bench.py) runs the box-structured geometric-multigrid
fast path. This script measures the SAME 1M-QP-class von Mises Newton step
on a TETRAHEDRAL mesh — where the geometric hierarchy does not exist and the
smoothed-aggregation AMG (solver/amg.py, the PETSc-AMG analog of the
reference's petsc_options route, reference _solver.py:30-159) carries the
Krylov solve — and reports:

  * hierarchy build time (host, once per problem);
  * ms per converged Newton step with preconditioner=AMG vs plain Jacobi;
  * the same in-run deep-CG convergence verification as bench.py.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_amg_tpu.py
Env:  AMG_N (mesh n, default 35 -> 35^3*6=257k tets, 1.029M QPs at degree 2),
      AMG_FIXED (timed CG count, default 45), AMG_STEPS (default 16).
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
from fenics_constitutive_tpu.solver.amg import build_amg
from fenics_constitutive_tpu.solver.packed_step import make_packed_step

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def main() -> None:
    n = int(os.environ.get("AMG_N", "35"))
    fixed = int(os.environ.get("AMG_FIXED", "45"))
    K = int(os.environ.get("AMG_STEPS", "16"))

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
    # measure the GENERAL-mesh (gather) engine explicitly: box tets now
    # auto-route to the structured-tet engine (scripts/bench_tet.py measures
    # that one — 16.9 ms verified at this size), so build the gather
    # geometry directly to keep this script's unstructured-path claim honest
    import jax.numpy as _jnp

    from fenics_constitutive_tpu.ops.packed import build_packed_geometry
    from fenics_constitutive_tpu.solver.packed_step import PackedState

    cells_all = np.arange(mesh.num_cells, dtype=np.int32)
    law = VonMises3D(MAT)
    geo_g = build_packed_geometry(V, 2, law.constraint, cells_all, _jnp.float32)
    geos, models = (geo_g,), (law,)
    sdim = law.constraint.stress_strain_dim
    state = PackedState(
        u=_jnp.zeros(V.ndofs, _jnp.float32),
        stress=(_jnp.zeros(geo_g.qp_shape(sdim), _jnp.float32),),
        histories=({k: _jnp.zeros(geo_g.qp_shape(d), _jnp.float32)
                    for k, d in law.history_dim.items()},),
        t=_jnp.asarray(0.0, _jnp.float32),
    )
    dtype = state.u.dtype
    print(f"mesh: {mesh.num_cells} tets, {V.ndofs} dofs, "
          f"{geos[0].N} QPs, dtype {dtype} (GATHER engine, forced)", flush=True)

    bc_dofs, bc_vals = combine_bcs(bcs)
    free_np = np.ones(V.ndofs, bool)
    free_np[np.asarray(bc_dofs)] = False

    t0 = time.perf_counter()
    amg = build_amg(V, MAT["p_mu"], MAT["p_ka"], free_np, q_degree=2)
    t_build = time.perf_counter() - t0
    print(f"AMG hierarchy build: {t_build:.1f} s "
          f"({amg.n_levels} levels)", flush=True)

    bc_dofs_j = jnp.asarray(bc_dofs)
    bc_vals_j = jnp.asarray(bc_vals, dtype)
    f_ext = jnp.zeros(V.ndofs, dtype)
    dt = jnp.asarray(1.0, dtype)

    def mkscales(j, k_steps):
        return jnp.asarray(
            [2.0 + 1e-4 * j + 0.05 * i for i in range(k_steps)], dtype
        )

    # geometry (per-QP dN/dofmaps at 1M QPs) and the AMG levels are passed
    # as jit ARGUMENTS, not closed over: closure capture embeds them as HLO
    # constants, which overflows the remote-compile request (measured HTTP
    # 413 at 140k dofs) and bloats the executable. AmgPreconditioner and the
    # packed geometries are registered pytrees, so they cross jit cleanly.
    def make_step(fk):
        def one(geos_a, pc_a, st, scale):
            step = make_packed_step(
                geos_a, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
                cg_rtol=1e-5, cg_maxiter=1000, preconditioner=pc_a,
                cg_fixed_iters=fk,
            )
            return step(models, st, bc_dofs_j, bc_vals_j * scale, f_ext, dt)

        def make_runK(k_steps):
            # statically UNROLLED chain: a lax.scan over this step faults
            # the TPU backend at every tested size (works single-step and
            # under the CPU backend — tunnel/Mosaic issue); callers probe
            # descending k_steps and use the largest that executes
            def runK(geos_a, pc_a, st, scales):
                probes = []
                for i in range(k_steps):
                    st, stats = one(geos_a, pc_a, st, scales[i])
                    probes.append(stats["r_norm"])
                return st, jnp.stack(probes)

            return jax.jit(runK)

        return jax.jit(one), make_runK

    # tunnel dispatch floor: a trivial jitted op with varied inputs, best-of
    trivial = jax.jit(lambda x: x * 1.0001 + 1.0)
    xprobe = jnp.arange(1024.0, dtype=dtype)
    jax.block_until_ready(trivial(xprobe))
    floor = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(xprobe + i))
        floor = min(floor, time.perf_counter() - t0)
    dispatch_floor_ms = floor * 1000.0
    print(f"tunnel dispatch floor: {dispatch_floor_ms:.1f} ms", flush=True)

    results = {}
    for name, pc, fk in (
        ("amg", amg, fixed),
        ("jacobi", None, int(os.environ.get("JAC_FIXED", "400"))),
    ):
        jitted, make_runK = make_step(fk)
        st = state
        for k in (0.5, 1.0, 1.5):
            st, _ = jitted(geos, pc, st, jnp.asarray(k, dtype))
        jax.block_until_ready(st.u)

        # K-step chains (scan OR unrolled) of the AMG gather step fault the
        # TPU backend — and the first fault wedges the device for the rest
        # of the process, so in-process fallback probing is useless. Run
        # with AMG_STEPS=1 on the tunnel (single-step dispatches, no chain);
        # the separately measured dispatch floor above bounds the device-
        # side cost. Larger K works on backends without the fault (CPU).
        k_used = K
        runK = make_runK(k_used)
        _ = jax.block_until_ready(runK(geos, pc, st, mkscales(0, k_used)))[1]
        if k_used == 1:
            print(f"  [{name}] NOTE: single-step dispatches — ms_per_step "
                  "includes the tunnel wall (see dispatch_floor_ms)",
                  flush=True)

        best, j = float("inf"), 0
        for _w in range(3):
            j += 1
            t0 = time.perf_counter()
            _, probes = runK(geos, pc, st, mkscales(j, k_used))
            jax.block_until_ready(probes)
            w = (time.perf_counter() - t0) / k_used
            if w * k_used * 1000.0 >= 50.0:  # tunnel-memoization guard
                best = min(best, w)
        assert np.isfinite(best), (
            f"every timing window was under the 50 ms memoization guard "
            f"for {name}; no honest number exists — re-run"
        )
        r_settled = float(np.asarray(probes)[-1])

        # in-run convergence reference (deep CG from the same state/schedule)
        _, make_runK_deep = make_step(fk * 2)
        _, probes_ref = jax.block_until_ready(
            make_runK_deep(k_used)(geos, pc, st, mkscales(j, k_used))
        )
        r_ref = float(np.asarray(probes_ref)[-1])
        ok = r_settled <= 1.02 * r_ref
        results[name] = dict(
            ms_per_step=round(best * 1000.0, 2), cg_iters=fk,
            steps_per_dispatch=k_used,
            r_norm=round(r_settled, 4), r_norm_ref=round(r_ref, 4),
            converged=ok,
        )
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps({
        "metric": "mises_tet_1MQP_newton_step_amg",
        "n": n, "ndofs": V.ndofs, "n_qp": int(geos[0].N),
        "hierarchy_build_s": round(t_build, 1),
        "dispatch_floor_ms": round(dispatch_floor_ms, 1),
        **{f"{k}_{kk}": vv for k, v in results.items() for kk, vv in v.items()},
    }))


if __name__ == "__main__":
    main()
