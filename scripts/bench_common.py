"""Shared 50^3 bench-state setup + timing harness for the A/B scripts.

bench.py (the driver-run artifact) intentionally stays self-contained; the
exploratory A/B scripts in scripts/ import from here so the bench state and
timing protocol can only drift in one place.

Timing caveat (measured): the remote-TPU tunnel memoizes byte-identical
dispatches and adds 80-150 ms per dispatch depending on session — only
trust timings whose inputs vary every dispatch (``time_stepsK`` below uses
bench.py's micro-varied load-scale protocol).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
from fenics_constitutive_tpu.models import packed_models  # noqa: F401

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def build_bench_state(n: int = 50, warm_scales=(0.5, 1.0, 1.5)):
    """Build the 1M-QP Mises problem and drive it past yield.

    Returns a dict with geos/models/state (warmed), bc/dof arrays, the free
    mask, and the default elastic multigrid.
    """
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
    geos, models, state = build_packed_problem(V, VonMises3D(MAT), q_degree=2)
    dtype = state.u.dtype
    bc_dofs, bc_vals = combine_bcs(bcs)
    ctx = {
        "V": V,
        "geos": geos,
        "models": models,
        "dtype": dtype,
        "bc_dofs": jnp.asarray(bc_dofs),
        "bc_vals": jnp.asarray(bc_vals, dtype),
        "f_ext": jnp.zeros(V.ndofs, dtype),
        "dt": jnp.asarray(1.0, dtype),
    }
    ctx["free"] = jnp.ones(V.ndofs, bool).at[ctx["bc_dofs"]].set(False)
    ctx["mg"] = build_multigrid(geos[0], MAT["p_mu"], MAT["p_ka"], ctx["free"])

    step0 = make_packed_step(
        geos, max_newton=1, newton_rtol=0.0, newton_atol=0.0,
        cg_rtol=1e-5, cg_maxiter=400, preconditioner=ctx["mg"],
    )
    jitted0 = jax.jit(
        lambda st, s: step0(
            ctx["models"], st, ctx["bc_dofs"], ctx["bc_vals"] * s,
            ctx["f_ext"], ctx["dt"],
        )
    )
    st = state
    for k in warm_scales:
        st, _ = jitted0(st, jnp.asarray(k, dtype))
    ctx["state"] = jax.block_until_ready(st)
    return ctx


def time_stepsK(ctx, name: str, step, K: int = 6, windows: int = 4):
    """min ms/step over `windows` K-step scans with micro-varied loads."""
    models, st = ctx["models"], ctx["state"]
    bc_dofs, bc_vals = ctx["bc_dofs"], ctx["bc_vals"]
    f_ext, dt, dtype = ctx["f_ext"], ctx["dt"], ctx["dtype"]

    def stepsK(stt, scales):
        probes = []
        for i in range(K):
            stt, stats = step(models, stt, bc_dofs, bc_vals * scales[i],
                              f_ext, dt)
            probes.append(stats["r_norm"])
        return jnp.stack(probes), stt

    jittedK = jax.jit(stepsK)

    def mkscales(j):
        return jnp.asarray(
            [2.0 + 1e-5 * j + 1e-6 * i for i in range(K)], dtype
        )

    probes, _ = jax.block_until_ready(jittedK(st, mkscales(0)))
    best = float("inf")
    for j in range(1, windows + 1):
        t0 = time.perf_counter()
        probes, _ = jittedK(st, mkscales(j))
        jax.block_until_ready(probes)
        best = min(best, (time.perf_counter() - t0) / K * 1000)
    print(f"{name:36s} {best:8.2f} ms/step  r_probe={float(probes[-1]):.3e}")
    return best
