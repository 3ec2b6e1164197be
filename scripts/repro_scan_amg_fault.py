"""Repro harness: lax.scan over packed steps with AMG pytree operands.

History: in r3 (re-confirmed r4), jitting ``lax.scan`` over
``make_packed_step`` on the GATHER-path geometry with an
``AmgPreconditioner`` pytree argument faulted the TPU backend through the
remote ("axon") tunnel at every problem size, while the identical program
ran fine as a single-step jit, as an unrolled chain, and on CPU.

RECORDED OUTCOME (r5, 2026-08-19, on the chip): **NOT REPRODUCIBLE** —
both stages print OK ("scan OK (fault not reproduced on this runtime)",
"windowed scan OK"). Changed since the r4 observation: AMG hierarchy
arrays now upload as pure device transfers (utils.to_device host-side
dtype conversion) instead of per-array convert programs, and/or the
runtime updated. PackedSimulation.solve_schedule keeps its unrolled-chain
fallback for the gather+AMG configuration (harmless; this script is the
canary to retire it).

Run: python scripts/repro_scan_amg_fault.py
Env: GATHER_SCAN=0 skips the historical faulting stage; WINDOWED=0 skips
the windowed-engine scan stage.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.amg import build_amg
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem, make_packed_step,
)

mesh = unit_cube_mesh(6, 6, 6, "tetra")
V = FunctionSpace(mesh, 1, 3)
bc = [
    DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)), np.zeros(3)),
    DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)), np.array([0.01, 0, 0])),
]
law = VonMises3D({"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0})
geos, models, state = build_packed_problem(V, law, 2, jnp.float32, engine="gather")
bc_dofs, bc_vals = combine_bcs(bc)
free = np.ones(V.ndofs, bool); free[bc_dofs] = False
amg = build_amg(V, 80769.0, 175000.0, free, q_degree=2)
dj, vj = jnp.asarray(bc_dofs), jnp.asarray(bc_vals, jnp.float32)
f0, dt = jnp.zeros(V.ndofs, jnp.float32), jnp.asarray(1.0, jnp.float32)

def step_amg(st, scale, pc):
    step = make_packed_step(geos, max_newton=1, cg_rtol=1e-5, preconditioner=pc)
    return step(models, st, dj, vj * scale, f0, dt)

st, _ = jax.jit(step_amg)(state, jnp.float32(1.0), amg)
jax.block_until_ready(st.u)
print("single-step jit OK", flush=True)

def scanned(st, scales, pc):
    return jax.lax.scan(lambda s, x: step_amg(s, x, pc), st, scales)

import os as _os

if _os.environ.get("GATHER_SCAN", "1") != "0":
    print("dispatching scan (this is the faulting call on TPU)...", flush=True)
    out, _ = jax.jit(scanned)(state, jnp.arange(1, 4, dtype=jnp.float32), amg)
    jax.block_until_ready(out.u)
    print("scan OK (fault not reproduced on this runtime)", flush=True)

# --- windowed-engine counterpart (r5): does scan over the WINDOWED step +
# windowed AMG fault too? (The production default engine for general
# meshes; solve_schedule's unrolled fallback currently triggers only on
# the gather+AMG configuration.)
import os

if os.environ.get("WINDOWED", "1") != "0":
    from fenics_constitutive_tpu.solver.amg import WindowedAmgPreconditioner

    from fenics_constitutive_tpu.fem.mesh import Mesh as _FeMesh

    _m0 = unit_cube_mesh(8, 8, 8, "tetra")
    _rng = np.random.default_rng(0)
    _pi = _rng.permutation(_m0.num_nodes)
    _nodes = np.empty_like(_m0.nodes)
    _nodes[_pi] = _m0.nodes
    mesh_w = _FeMesh(_nodes, _pi[_m0.cells].astype(np.int32), "tetra")
    Vw = FunctionSpace(mesh_w, 1, 3)
    bcw = [
        DirichletBC(
            Vw.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)),
            np.zeros(3),
        ),
        DirichletBC(
            Vw.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)),
            np.array([0.01, 0, 0]),
        ),
    ]
    geos_w, models_w, state_w = build_packed_problem(
        Vw, law, 2, jnp.float32, engine="windowed"
    )
    bdw, bvw = combine_bcs(bcw)
    free_w = np.ones(Vw.ndofs, bool)
    free_w[bdw] = False
    amg_w = build_amg(
        Vw, 80769.0, 175000.0, free_w, q_degree=2, spmv="windowed",
        node_perm=geos_w[0].ex.perm,
    )
    djw, vjw = jnp.asarray(bdw), jnp.asarray(bvw, jnp.float32)
    f0w = jnp.zeros_like(state_w.u)
    dtw = jnp.asarray(1.0, jnp.float32)

    def step_win(st, scale, pc):
        pc_call = pc.wrap_internal(geos_w[0].ex.M_pad)
        pc_call.internal_layout = True
        step = make_packed_step(
            geos_w, max_newton=1, cg_rtol=1e-5, preconditioner=pc_call,
            cg_fixed_iters=10,
        )
        return step(models_w, st, djw, vjw * scale, f0w, dtw)

    stw, _ = jax.jit(step_win)(state_w, jnp.float32(1.0), amg_w)
    jax.block_until_ready(stw.u)
    print("windowed single-step jit OK", flush=True)

    def scanned_w(st, scales, pc):
        return jax.lax.scan(lambda s, x: step_win(s, x, pc), st, scales)

    print("dispatching WINDOWED scan...", flush=True)
    outw, _ = jax.jit(scanned_w)(
        state_w, jnp.arange(1, 4, dtype=jnp.float32), amg_w
    )
    jax.block_until_ready(outw.u)
    print("windowed scan OK", flush=True)
