"""Smoothed-aggregation AMG: the unstructured-mesh multilevel preconditioner.

Reference parity point: the reference's linear solves go through PETSc,
which provides AMG on arbitrary meshes (dolfinx NewtonSolver KSP,
reference _solver.py:30-159); our geometric multigrid needs a box grid.
These tests pin the AMG path: same solution as Jacobi-CG, far fewer
iterations, on tet/tri meshes the geometric hierarchy cannot handle.
"""

import numpy as np

from fenics_constitutive_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    unit_cube_mesh,
    unit_square_mesh,
)
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import LinearElasticityModel, VonMises3D
from fenics_constitutive_tpu.ops.mandel import Constraint
from fenics_constitutive_tpu.solver import PackedSimulation
from fenics_constitutive_tpu.solver.amg import build_amg
import pytest

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def _cube_bcs(V):
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
    return bcs, bc_move


@pytest.mark.slow
def test_amg_tet_plasticity_matches_jacobi():
    """Tet-mesh plasticity: AMG-CG reaches the Jacobi-CG solution in far
    fewer iterations (the mesh the geometric V-cycle cannot handle)."""
    mesh = unit_cube_mesh(6, 6, 6, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    bcs_a, bm_a = _cube_bcs(V)
    bcs_j, bm_j = _cube_bcs(V)

    sim_a = PackedSimulation(
        VonMises3D(MAT), V, bcs_a, 2, preconditioner="amg",
        newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-10,
    )
    sim_j = PackedSimulation(
        VonMises3D(MAT), V, bcs_j, 2,
        newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-10,
    )
    for k in (1, 2):
        bm_a.value = bm_j.value = 0.004 * k
        _, conv_a = sim_a.solve()
        _, conv_j = sim_j.solve()
        assert conv_a and conv_j

    np.testing.assert_allclose(
        np.asarray(sim_a.u), np.asarray(sim_j.u), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(sim_a.stress, sim_j.stress, rtol=1e-6, atol=1e-8)
    it_a = int(sim_a.last_stats["cg_iters_last"])
    it_j = int(sim_j.last_stats["cg_iters_last"])
    assert it_a < it_j / 3, (it_a, it_j)


def test_amg_2d_triangles():
    """Plane-strain elasticity on a tri mesh solves under AMG."""
    mesh = unit_square_mesh(10, 10, "triangle")
    V = FunctionSpace(mesh, 1, 2)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bm = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.002)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bm,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
    ]
    law = LinearElasticityModel(
        {"E": 2000.0, "nu": 0.3}, Constraint.PLANE_STRAIN
    )
    sim = PackedSimulation(
        law, V, bcs, 2, preconditioner="amg", cg_rtol=1e-12,
    )
    niter, conv = sim.solve()
    assert conv
    # free top edge -> in-plane uniaxial stress: sigma_xx = E/(1-nu^2) eps
    E, nu = 2000.0, 0.3
    sxx = E / (1 - nu**2) * 0.002
    np.testing.assert_allclose(sim.stress[:, :, 0], sxx, rtol=1e-8)


def test_amg_hierarchy_is_linear_and_contracts():
    """M is a fixed linear operator and the stationary iteration with it
    contracts the elastic residual (preconditioner sanity)."""
    import jax.numpy as jnp

    mesh = unit_cube_mesh(5, 5, 5, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    bcs, _ = _cube_bcs(V)
    bc_dofs, _ = combine_bcs(bcs)
    free = np.ones(V.ndofs, bool)
    free[np.asarray(bc_dofs)] = False
    amg = build_amg(V, MAT["p_mu"], MAT["p_ka"], free)

    rng = np.random.default_rng(3)
    r1 = jnp.asarray(rng.standard_normal(V.ndofs) * free)
    r2 = jnp.asarray(rng.standard_normal(V.ndofs) * free)
    # linearity
    z12 = amg(r1 + 2.0 * r2)
    np.testing.assert_allclose(
        np.asarray(z12), np.asarray(amg(r1) + 2.0 * amg(r2)),
        rtol=1e-10, atol=1e-12,
    )
    # contraction of the richardson iteration on the ELL fine operator
    from fenics_constitutive_tpu.solver.amg import _ell_matvec

    Av, Ac = amg.A_ell[0]
    x = jnp.zeros(V.ndofs, Av.dtype)
    b = r1.astype(Av.dtype)
    r = b
    n0 = float(jnp.linalg.norm(r))
    for _ in range(10):
        x = x + amg(r)
        r = b - _ell_matvec(Av, Ac, x)
    assert float(jnp.linalg.norm(r)) < 1e-3 * n0


def test_amg_geometric_aggregation_matches_graph():
    """Vectorized box aggregation (the large-mesh default) preconditions as
    well as the greedy graph walk: same linear-operator contract, comparable
    Richardson contraction on the elastic operator."""
    import jax.numpy as jnp

    from fenics_constitutive_tpu.solver.amg import _ell_matvec

    mesh = unit_cube_mesh(6, 6, 6, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    bcs, _ = _cube_bcs(V)
    bc_dofs, _ = combine_bcs(bcs)
    free = np.ones(V.ndofs, bool)
    free[np.asarray(bc_dofs)] = False

    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(V.ndofs) * free)

    def contraction(amg):
        Av, Ac = amg.A_ell[0]
        x = jnp.zeros(V.ndofs, Av.dtype)
        r = b.astype(Av.dtype)
        n0 = float(jnp.linalg.norm(r))
        for _ in range(10):
            x = x + amg(r)
            r = b.astype(Av.dtype) - _ell_matvec(Av, Ac, x)
        return float(jnp.linalg.norm(r)) / n0

    amg_geo = build_amg(
        V, MAT["p_mu"], MAT["p_ka"], free, aggregation="geometric"
    )
    amg_gra = build_amg(V, MAT["p_mu"], MAT["p_ka"], free, aggregation="graph")
    assert amg_geo.n_levels >= 2
    c_geo, c_gra = contraction(amg_geo), contraction(amg_gra)
    assert c_geo < 1e-3, c_geo
    assert c_geo < 10.0 * c_gra, (c_geo, c_gra)
    # linearity of the geometric-aggregation cycle
    r2 = jnp.asarray(rng.standard_normal(V.ndofs) * free)
    np.testing.assert_allclose(
        np.asarray(amg_geo(b + 2.0 * r2)),
        np.asarray(amg_geo(b) + 2.0 * amg_geo(r2)),
        rtol=1e-10, atol=1e-12,
    )


@pytest.mark.slow
def test_amg_on_structured_mesh_via_simulation():
    """Explicit 'amg' on a box-hex mesh goes through the grid-major wrap."""
    mesh = unit_cube_mesh(4, 4, 4, "hex")
    V = FunctionSpace(mesh, 1, 3)
    bcs_a, bm_a = _cube_bcs(V)
    bcs_v, bm_v = _cube_bcs(V)
    sim_a = PackedSimulation(
        VonMises3D(MAT), V, bcs_a, 2, preconditioner="amg",
        newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-10,
    )
    sim_v = PackedSimulation(
        VonMises3D(MAT), V, bcs_v, 2, preconditioner="vcycle",
        newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-10,
    )
    bm_a.value = bm_v.value = 0.004
    _, conv_a = sim_a.solve()
    _, conv_v = sim_v.solve()
    assert conv_a and conv_v
    np.testing.assert_allclose(
        np.asarray(sim_a.u), np.asarray(sim_v.u), rtol=1e-8, atol=1e-12
    )


@pytest.mark.slow
def test_amg_on_interactive_problem():
    """IncrSmallStrainProblem(preconditioner='amg') matches the default
    Jacobi path on a tet mesh, with far fewer CG iterations."""
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

    mesh = unit_cube_mesh(5, 5, 5, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    bcs_a, bm_a = _cube_bcs(V)
    bcs_j, bm_j = _cube_bcs(V)
    prob_a = IncrSmallStrainProblem(
        VonMises3D(MAT), V, bcs_a, 2, preconditioner="amg"
    )
    prob_j = IncrSmallStrainProblem(VonMises3D(MAT), V, bcs_j, 2)
    for k in (1, 2):
        bm_a.value = bm_j.value = 0.004 * k
        _, conv_a = prob_a.solve()
        prob_a.update()
        _, conv_j = prob_j.solve()
        prob_j.update()
        assert conv_a and conv_j
    np.testing.assert_allclose(
        np.asarray(prob_a.u), np.asarray(prob_j.u), rtol=1e-8, atol=1e-12
    )


@pytest.mark.slow
def test_amg_anisotropic_slab_semi_coarsening():
    """Stretched (25:1) tet slab: both anisotropy mechanisms — strength-of-
    connection dropping on the graph walk and per-axis cell extents in the
    box aggregation — keep the cycle strongly contracting where plain
    aggregation (theta=0, isotropic boxes) degrades to ~0.9 per sweep.
    PETSc's GAMG gives the reference this robustness for free."""
    import dataclasses

    import jax.numpy as jnp

    from fenics_constitutive_tpu.solver.amg import _ell_matvec

    m = unit_cube_mesh(10, 10, 10, "tetra")
    nodes = np.asarray(m.nodes).copy()
    nodes[:, 2] *= 1.0 / 25.0
    mesh = dataclasses.replace(m, nodes=jnp.asarray(nodes))
    V = FunctionSpace(mesh, 1, 3)
    bcs, _ = _cube_bcs(V)
    bc_dofs, _ = combine_bcs(bcs)
    free = np.ones(V.ndofs, bool)
    free[np.asarray(bc_dofs)] = False
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(V.ndofs) * free)

    def contraction(amg):
        Av, Ac = amg.A_ell[0]
        x = jnp.zeros(V.ndofs, Av.dtype)
        r = b.astype(Av.dtype)
        n0 = float(jnp.linalg.norm(r))
        for _ in range(10):
            x = x + amg(r)
            r = b.astype(Av.dtype) - _ell_matvec(Av, Ac, x)
        return float(jnp.linalg.norm(r)) / n0

    args = (V, MAT["p_mu"], MAT["p_ka"], free)
    c_geo = contraction(build_amg(*args, aggregation="geometric"))
    c_graph = contraction(build_amg(*args, aggregation="graph"))
    c_plain = contraction(
        build_amg(*args, aggregation="graph", strength_theta=0.0)
    )
    # measured: geo 4.0e-6, graph(0.06) 3.4e-8, plain 0.27 (10 cycles)
    assert c_geo < 1e-4, c_geo
    assert c_graph < 1e-6, c_graph
    assert c_plain > 1e-3 * max(c_geo, c_graph), (c_plain, c_geo, c_graph)
