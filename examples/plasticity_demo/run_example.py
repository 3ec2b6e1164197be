"""End-to-end demo: multi-material elastoplastic cube, ParaView output.

A stiff von Mises matrix with a soft elastic inclusion, stretched in 12 load
steps; writes a .pvd time series (displacement + per-cell von Mises stress)
you can open directly in ParaView. Demonstrates:

  * multi-material laws on cell subsets (reference _lawonsubmesh machinery),
  * the interactive solve/update loop on the packed production engines,
  * VTU/PVD field output (fem/io.py).

Run:  python examples/plasticity_demo/run_example.py  [out_dir]
"""

from __future__ import annotations

# allow running from a plain checkout: put the repo root on sys.path when
# the package is not installed (the reference's examples are instead built
# against an installed fenics_constitutive; we stay dependency-free)
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import pathlib
import sys

import jax


def main(out_dir: str) -> None:
    import numpy as np

    from fenics_constitutive_tpu.fem import (
        DirichletBC,
        FunctionSpace,
        unit_cube_mesh,
    )
    from fenics_constitutive_tpu.fem.io import PVDWriter
    from fenics_constitutive_tpu.models import (
        Constraint,
        LinearElasticityModel,
        VonMises3D,
    )
    from fenics_constitutive_tpu.ops import mandel
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

    mesh = unit_cube_mesh(6, 6, 6, "hex")
    V = FunctionSpace(mesh, 1, 3)

    # soft elastic sphere in a hardening von Mises matrix
    mid = mesh.cell_midpoints()
    inside = np.linalg.norm(mid - 0.5, axis=1) < 0.25
    cells_incl = np.flatnonzero(inside).astype(np.int32)
    cells_matrix = np.flatnonzero(~inside).astype(np.int32)
    matrix = VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
         "p_y00": 2500.0, "p_w": 200.0}
    )
    inclusion = LinearElasticityModel({"E": 20000.0, "nu": 0.3}, Constraint.FULL)
    laws = [(matrix, cells_matrix), (inclusion, cells_incl)]

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(
        V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
    )
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    problem = IncrSmallStrainProblem(laws, V, bcs, q_degree=2)

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pvd = PVDWriter(out / "plasticity_demo.pvd")
    material_id = inside.astype(float)

    for step, disp in enumerate(np.linspace(0.002, 0.024, 12), start=1):
        bc_move.value = float(disp)
        niter, converged = problem.solve(rtol=1e-10, atol=1e-8, cg_rtol=1e-10)
        problem.update()
        sig = problem.stress_0  # [C, Q, 6] Mandel
        mises = np.asarray(mandel.mises_norm(sig.reshape(-1, 6))).reshape(
            sig.shape[0], -1
        ).mean(axis=1)
        pvd.write(
            mesh,
            time=problem._time,
            point_data={"u": np.asarray(problem.u).reshape(-1, 3)},
            cell_data={
                "mises": mises,
                "sigma_xx": np.asarray(sig[..., 0].mean(axis=1)),
                "material": material_id,
            },
        )
        print(
            f"step {step:2d} disp={disp:.4f} iters={niter} "
            f"converged={converged} max_mises={mises.max():8.1f}"
        )
    pvd.close()
    print(f"wrote {out / 'plasticity_demo.pvd'} (+12 .vtu files)")


if __name__ == "__main__":
    # demo scale is tiny — run on CPU in f64 (TPU scale-up goes through
    # PackedSimulation; see docs/performance.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/plasticity_demo")
