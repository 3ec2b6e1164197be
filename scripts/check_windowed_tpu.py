"""On-chip numerical validation of the windowed Pallas kernels.

Compares windowed_gather / windowed_scatter / windowed_bsr_matvec against
their pure-XLA reference implementations ON THE REAL TPU (the CPU test suite
runs the kernels only in interpret mode — this pins the Mosaic lowering).

Run: python scripts/check_windowed_tpu.py [n]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh
    from fenics_constitutive_tpu.fem.mesh import Mesh
    from fenics_constitutive_tpu.ops.pallas_window import (
        windowed_gather,
        windowed_scatter,
    )
    from fenics_constitutive_tpu.ops.windowed import build_windowed_exchange

    mesh0 = unit_cube_mesh(n, n, n, "tetra")
    rng = np.random.default_rng(0)
    pi = rng.permutation(mesh0.num_nodes)
    nodes = np.empty_like(mesh0.nodes)
    nodes[pi] = mesh0.nodes
    mesh = Mesh(nodes, pi[mesh0.cells].astype(np.int32), "tetra")

    ex = build_windowed_exchange(mesh.cells, mesh.num_nodes, tile=1024)
    print(
        f"{mesh.num_cells} tets, M={ex.M}, T={ex.T} B={ex.B} C_B={ex.C_B} "
        f"P={ex.P} W1={ex.W1} Rn={ex.Rn}"
    )

    u2 = jnp.asarray(
        rng.standard_normal((3, ex.M_pad)).astype(np.float32)
    )
    g_pl = np.asarray(jax.jit(lambda u: windowed_gather(ex, u))(u2))
    g_rf = np.asarray(jax.jit(ex.gather_ref)(u2))
    dg = np.abs(g_pl - g_rf).max()
    print(f"gather  max|pallas - ref| = {dg:.3e}  (ref max {np.abs(g_rf).max():.3f})")

    f = jnp.asarray(
        rng.standard_normal((ex.B, 3, ex.Rn)).astype(np.float32)
    )
    f_m = jnp.where((ex.loc >= 0)[:, None, :], f, 0.0)
    s_pl = np.asarray(jax.jit(lambda x: windowed_scatter(ex, x))(f))
    s_rf = np.asarray(jax.jit(ex.scatter_ref)(f_m))
    ds = np.abs(s_pl - s_rf).max()
    rs = ds / max(np.abs(s_rf).max(), 1e-30)
    print(f"scatter max|pallas - ref| = {ds:.3e}  rel {rs:.3e}")

    # BSR matvec via a small AMG hierarchy
    from fenics_constitutive_tpu.fem import DirichletBC
    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.solver.amg import build_amg

    V = FunctionSpace(mesh, 1, 3)
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 0], 0.0), component=0
            ),
            0.0,
        )
    ]
    free = np.ones(V.ndofs, bool)
    free[combine_bcs(bcs)[0]] = False
    # exact (3-pass) kernels for the parity pin; the production AMG default
    # is select_passes=1 (bf16-rounded select — preconditioner territory)
    win = build_amg(
        V, 80769.0, 175000.0, free, q_degree=2, spmv="windowed",
        select_passes=3,
    )
    w0 = win.A_win[0]
    x = jnp.asarray(
        rng.standard_normal(w0.bc * w0.NC_pad).astype(np.float32)
    )
    y_pl = np.asarray(jax.jit(w0.matvec)(x))
    y_rf = np.asarray(jax.jit(w0.matvec_ref)(x))
    db = np.abs(y_pl - y_rf).max()
    rb = db / max(np.abs(y_rf).max(), 1e-30)
    print(f"bsr     max|pallas - ref| = {db:.3e}  rel {rb:.3e}")

    import dataclasses

    w1 = dataclasses.replace(w0, select_passes=1)
    y_p1 = np.asarray(jax.jit(w1.matvec)(x))
    r1 = np.abs(y_p1 - y_rf).max() / max(np.abs(y_rf).max(), 1e-30)
    print(f"bsr 1-pass (preconditioner mode) rel = {r1:.3e} (~bf16 eps)")

    ok = dg == 0.0 and rs < 1e-6 and rb < 1e-5 and r1 < 1e-2
    print("OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
