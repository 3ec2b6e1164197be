"""Isolate WHERE the unstructured (tet) matvec spends its time on TPU.

The gather-path packed engine measures ~29 us/QP per Newton step
(scripts/bench_amg_tpu.py) vs ~19 ns/QP structured. The matvec has four
phases; this script times each in isolation on the real chip:

  A. u-gather:        u[dofmap_t]                [n, vs, C] scalar gather
  B. strain einsum:   dN x u_e                   (MXU, uniform-geometry path)
  C. tangent apply:   factored isotropic apply   (VPU elementwise)
  D. assembly-gather: flat[gather_idx].sum(1)    [ndofs, Vmax] scalar gather

plus layout variants of A and D:
  A2. node-row gather: u2d[node_idx] with u reshaped [nodes, vs] (row gather)
  D2. segment-sum assembly (scatter-add) for comparison.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_gather.py [n]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.ops.packed import build_packed_geometry
from fenics_constitutive_tpu.ops.mandel import Constraint


def timeit(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for i in range(reps):
        # vary an input microscopically so the tunnel cannot memoize
        a0 = args[0] * (1.0 + 1e-7 * (i + 1)) if args else None
        t0 = time.perf_counter()
        jax.block_until_ready(fn(a0, *args[1:]) if args else fn())
        w = time.perf_counter() - t0
        if w * 1000.0 >= 5.0:  # below one dispatch: memoized, skip
            best = min(best, w)
    print(f"  {name:28s} {best * 1000.0:9.2f} ms", flush=True)
    return out, best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    mesh = unit_cube_mesh(n, n, n, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    cells = np.arange(mesh.num_cells, dtype=np.int32)
    geo = build_packed_geometry(V, 2, Constraint.FULL, cells, jnp.float32)
    print(f"{mesh.num_cells} tets, {V.ndofs} dofs, {geo.N} QPs, "
          f"uniform={geo.uniform}", flush=True)

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (V.ndofs,), jnp.float32)

    # A: element dof gather (scalar gather over [n, vs, C] indices)
    gA = jax.jit(lambda x: x[geo.dofmap_t])
    u_e, _ = timeit("A u-gather [n,vs,C]", gA, u)

    # A2: node-ROW gather — gather whole [vs] rows per (cell, corner)
    node_idx = np.asarray(geo.dofmap_t)[:, 0, :] // 3  # [n, C] node ids
    node_idx_j = jnp.asarray(node_idx)

    def gA2(x):
        return x.reshape(-1, 3)[node_idx_j]  # [n, C, vs]

    timeit("A2 node-row gather [n,C,3]", jax.jit(gA2), u)

    # B: strain einsum (uniform dN [n, g, Q])
    dN = geo.dN

    def gB(ue):
        return jnp.einsum("ngq,njc->gjqc", dN, ue,
                          preferred_element_type=ue.dtype)

    grad, _ = timeit("B strain einsum (MXU)", jax.jit(gB), u_e)

    # C: elementwise tangent-ish apply on [6, N]
    eps = jax.random.normal(key, (6, geo.N), jnp.float32)

    def gC(e):
        tr = e[:3].sum(0)
        return 2.0 * e + 0.5 * jnp.concatenate(
            [jnp.broadcast_to(tr, (3, e.shape[1])), 0.0 * e[3:]], axis=0
        )

    timeit("C elementwise apply [6,N]", jax.jit(gC), eps)

    # D: assembly gather flat[gather_idx].sum(1)
    f_e = jax.random.normal(key, (geo.n_nodes, 3, geo.n_cells), jnp.float32)

    def gD(fe):
        flat = jnp.concatenate([fe.reshape(-1), jnp.zeros(1, fe.dtype)])
        return flat[geo.gather_idx].sum(axis=1)

    timeit("D assembly-gather [nd,Vmax]", jax.jit(gD), f_e)

    # D2: segment-sum (scatter-add) assembly for comparison
    seg_ids = np.asarray(geo.dofmap_t).reshape(-1)  # dof id per (n, vs, C)
    seg_ids_j = jnp.asarray(seg_ids)

    def gD2(fe):
        return jax.ops.segment_sum(
            fe.reshape(-1), seg_ids_j, num_segments=V.ndofs
        )

    timeit("D2 segment-sum scatter", jax.jit(gD2), f_e)

    # full matvec for reference
    from fenics_constitutive_tpu.ops.packed import IsotropicTangent

    tg = IsotropicTangent(
        kappa=jnp.asarray(175000.0, jnp.float32),
        beta=jnp.full((geo.N,), 80769.0, jnp.float32),
        gamma=jnp.zeros((geo.N,), jnp.float32),
        n=jnp.zeros((6, geo.N), jnp.float32),
    )
    timeit("FULL matvec", jax.jit(lambda x: geo.matvec(x, tg)), u)


if __name__ == "__main__":
    main()
