"""matmul_precision plumbing: the MXU-precision override must reach every
jitted core and be a numerical no-op where the platform already multiplies
in full precision (CPU f64 — the TPU f32 accuracy effect is measured on-chip
in scripts/ab_p2_precision.py: default r/r0 floor 1.6e-4 vs 3.8e-7 at
"highest"; see docs/performance.md)."""

import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem, PackedSimulation

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
       "p_y00": 2500.0, "p_w": 200.0}


def _setup():
    mesh = unit_cube_mesh(3, 3, 3, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.004),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    return V, bcs


def test_problem_accepts_matmul_precision():
    V, bcs = _setup()
    p_hi = IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 2,
                                  matmul_precision="highest")
    n, c = p_hi.solve()
    assert c
    p_def = IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 2)
    n, c = p_def.solve()
    assert c
    np.testing.assert_allclose(
        np.asarray(p_hi.u), np.asarray(p_def.u), rtol=0, atol=1e-12
    )


def test_simulation_accepts_matmul_precision():
    V, bcs = _setup()
    sim = PackedSimulation(VonMises3D(MAT), V, bcs, 2,
                           matmul_precision="highest")
    n, c = sim.solve()
    assert c
    sim_def = PackedSimulation(VonMises3D(MAT), V, bcs, 2)
    n, c = sim_def.solve()
    assert c
    np.testing.assert_allclose(
        np.asarray(sim.u), np.asarray(sim_def.u), rtol=0, atol=1e-12
    )
