"""Packed (SoA) engine vs reference-parity (AoS) engine equivalence.

The packed engine is the TPU-optimized hot path (ops/packed.py,
solver/packed_step.py); the AoS path is the correctness baseline validated
against analytic BVPs. These tests pin them together to 1e-12 so layout
optimizations can never drift the numerics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import LinearElasticityModel, VonMises3D, Constraint
from fenics_constitutive_tpu.ops.packed import (
    IsotropicTangent,
    build_packed_geometry,
    packed_grad,
    packed_jacobi_diag,
    packed_matvec,
    packed_residual,
    packed_strain,
)
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def setup(cell_type="hex", n=2):
    mesh = unit_cube_mesh(n, n, n, cell_type)
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    return mesh, V, bcs, bc_move


@pytest.mark.parametrize("cell_type", ["hex", "tetra"])
def test_geometry_dedup_flag(cell_type):
    mesh, V, _, _ = setup(cell_type)
    geo = build_packed_geometry(V, 2, Constraint.FULL)
    if cell_type == "hex":
        assert geo.uniform  # structured grid: one Jacobian for all cells
        assert geo.dN.shape == (8, 3, 8)
    else:
        assert not geo.uniform  # Kuhn tets have 6 distinct shapes


@pytest.mark.parametrize("cell_type", ["hex", "tetra"])
def test_packed_ops_match_aos(cell_type):
    """grad/strain/residual/matvec/diag agree with fem.assembly on random data."""
    from fenics_constitutive_tpu.fem.assembly import (
        assemble_jacobi_diag,
        assemble_residual,
        grad_at_qp,
        tangent_matvec,
    )

    mesh, V, bcs, _ = setup(cell_type)
    q = 2
    law = LinearElasticityModel({"E": 42.0, "nu": 0.3}, Constraint.FULL)
    problem = IncrSmallStrainProblem(law, V, bcs, q, engine="aos")
    dofmap, geo_aos, cells = problem._law_data[0]
    geo = build_packed_geometry(V, q, Constraint.FULL)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=V.ndofs) * 1e-3)

    # gradient: AoS [C, Q, g, g] vs packed [g, j, N] with N = q*C + c
    g_aos = np.asarray(grad_at_qp(u, dofmap, geo_aos))  # [C, Q, i, j]
    g_soa = np.asarray(packed_grad(u, geo))  # [i, j, N]
    C, Q = g_aos.shape[0], g_aos.shape[1]
    g_soa_r = g_soa.reshape(3, 3, Q, C).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(g_soa_r, g_aos, atol=1e-14)

    # residual from a random Mandel stress field
    sig_aos = jnp.asarray(rng.normal(size=(C, Q, 6)))
    sig_soa = jnp.asarray(np.asarray(sig_aos).transpose(2, 1, 0).reshape(6, Q * C))
    r_aos = np.asarray(
        assemble_residual(sig_aos, dofmap, geo_aos, Constraint.FULL, V.ndofs)
    )
    r_soa = np.asarray(packed_residual(sig_soa, geo))
    np.testing.assert_allclose(r_soa, r_aos, rtol=1e-12, atol=1e-12)

    # matvec + jacobi with an isotropic factored tangent vs its dense AoS form
    N = Q * C
    beta = jnp.asarray(rng.uniform(1.0, 2.0, N))
    gamma = jnp.asarray(rng.uniform(0.1, 0.5, N))
    nvec = rng.normal(size=(6, N))
    nvec = jnp.asarray(nvec / np.linalg.norm(nvec, axis=0))
    tg = IsotropicTangent(kappa=jnp.asarray(3.0), beta=beta, gamma=gamma, n=nvec)
    dense = np.asarray(tg.full_matrix())  # [6, 6, N]
    dense_aos = jnp.asarray(dense.transpose(2, 0, 1).reshape(Q, C, 6, 6).transpose(1, 0, 2, 3))
    v = jnp.asarray(rng.normal(size=V.ndofs))
    av_aos = np.asarray(
        tangent_matvec(v, dense_aos, dofmap, geo_aos, Constraint.FULL, V.ndofs)
    )
    av_soa = np.asarray(packed_matvec(v, tg, geo))
    np.testing.assert_allclose(av_soa, av_aos, rtol=1e-11, atol=1e-11)

    d_aos = np.asarray(
        assemble_jacobi_diag(dense_aos, dofmap, geo_aos, Constraint.FULL, V.ndofs)
    )
    d_soa = np.asarray(packed_jacobi_diag(tg, geo))
    np.testing.assert_allclose(d_soa, d_aos, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("cell_type", ["hex", "tetra"])
@pytest.mark.slow
def test_packed_step_matches_problem_solve(cell_type):
    """Full multi-step plasticity: packed jitted step == AoS interactive solve."""
    import jax

    mesh, V, bcs, bc_move = setup(cell_type)
    q = 2
    law = VonMises3D(MAT)

    problem = IncrSmallStrainProblem(law, V, bcs, q, engine="aos")
    geos, models, state = build_packed_problem(V, law, q)
    step = make_packed_step(geos, newton_rtol=1e-12, cg_rtol=1e-14)
    jitted = jax.jit(step)

    for k in range(1, 4):
        disp = 0.015 * k
        bc_move.value = disp
        niter, converged = problem.solve()
        assert converged
        problem.update()

        bc_dofs, bc_vals = combine_bcs(bcs)
        state, stats = jitted(
            models,
            state,
            jnp.asarray(bc_dofs),
            jnp.asarray(bc_vals, state.u.dtype),
            jnp.zeros(V.ndofs, state.u.dtype),
            jnp.asarray(1.0, state.u.dtype),
        )

    np.testing.assert_allclose(
        np.asarray(state.u), np.asarray(problem.u), rtol=1e-10, atol=1e-12
    )
    # stress fields agree (packed is [6, N] q-major / flat-structured is
    # [6, Q, M] cell-at-origin; AoS is [C, Q, 6])
    C, Q = problem._stress_prev.shape[0], problem._stress_prev.shape[1]
    if hasattr(geos[0], "extract_cells"):
        s_soa = np.asarray(geos[0].extract_cells(state.stress[0])).transpose(2, 1, 0)
    else:
        s_soa = np.asarray(state.stress[0]).reshape(6, Q, C).transpose(2, 1, 0)
    np.testing.assert_allclose(
        s_soa, np.asarray(problem._stress_prev), rtol=1e-8, atol=1e-8
    )
    alpha = np.asarray(state.histories[0]["alpha"])
    assert alpha.max() > 0  # plasticity happened


@pytest.mark.parametrize("degree,q", [(1, 2), (2, 4)])
def test_uniform_folded_operators_match_general_path(degree, q):
    """The folded KEPS/KDIV uniform fast path (single MXU matmuls over
    element-dof blocks) is numerically the general einsum path."""
    import jax.numpy as jnp

    from fenics_constitutive_tpu.ops.mandel import Constraint

    mesh = unit_cube_mesh(3, 3, 3, "hex")
    V = FunctionSpace(mesh, degree, 3)
    geo = build_packed_geometry(V, q, Constraint.FULL)
    assert geo.uniform and geo.KEPS_c is not None

    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=V.ndofs) * 1e-3)

    eps_fast = np.asarray(geo.strain(u))
    eps_gen = np.asarray(packed_strain(packed_grad(u, geo), geo.constraint))
    np.testing.assert_allclose(eps_fast, eps_gen, rtol=1e-12, atol=1e-15)

    sig = jnp.asarray(rng.normal(size=(6, geo.N)))
    r_fast = np.asarray(geo.residual(sig))
    r_gen = np.asarray(packed_residual(sig, geo))
    np.testing.assert_allclose(r_fast, r_gen, rtol=1e-12, atol=1e-13)

    from fenics_constitutive_tpu.ops.packed import IsotropicTangent

    nvec = rng.normal(size=(6, geo.N))
    nvec /= np.linalg.norm(nvec, axis=0)
    tg = IsotropicTangent(
        kappa=jnp.asarray(rng.uniform(1.0, 2.0, geo.N)),
        beta=jnp.asarray(rng.uniform(1.0, 2.0, geo.N)),
        gamma=jnp.asarray(rng.uniform(-0.5, 0.5, geo.N)),
        n=jnp.asarray(nvec),
    )
    v = jnp.asarray(rng.normal(size=V.ndofs))
    av_fast = np.asarray(geo.matvec(v, tg))
    av_gen = np.asarray(packed_matvec(v, tg, geo))
    np.testing.assert_allclose(av_fast, av_gen, rtol=1e-11, atol=1e-12)

    d_fast = np.asarray(geo.jacobi_diag(tg))
    d_gen = np.asarray(packed_jacobi_diag(tg, geo))
    np.testing.assert_allclose(d_fast, d_gen, rtol=1e-11, atol=1e-12)


@pytest.mark.slow
def test_lattice_engine_matches_packed_general_path():
    """The degree-2 lattice stencil engine (static strided slices, dense
    [k, Q, C] cell fields) is numerically the general packed path."""
    from fenics_constitutive_tpu.ops.packed import IsotropicTangent
    from fenics_constitutive_tpu.ops.structured import build_lattice_geometry

    mesh = unit_cube_mesh(3, 2, 4, "hex")
    V = FunctionSpace(mesh, 2, 3)
    lat = build_lattice_geometry(V, 4, Constraint.FULL)
    pk = build_packed_geometry(V, 4, Constraint.FULL)
    assert lat.N == pk.N and lat.n_qp == pk.n_qp

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=V.ndofs) * 1e-3)

    eps_lat = np.asarray(lat.strain(u)).reshape(6, -1)
    eps_pk = np.asarray(pk.strain(u))
    # packed is q-major [s, Q*C]; lattice is [s, Q, C] -> same flat order
    np.testing.assert_allclose(eps_lat, eps_pk, rtol=1e-12, atol=1e-15)

    sig = rng.normal(size=(6, lat.n_qp, lat.n_cells))
    r_lat = np.asarray(lat.residual(jnp.asarray(sig)))
    r_pk = np.asarray(pk.residual(jnp.asarray(sig.reshape(6, -1))))
    np.testing.assert_allclose(r_lat, r_pk, rtol=1e-12, atol=1e-13)

    nvec = rng.normal(size=(6, lat.n_qp, lat.n_cells))
    nvec /= np.linalg.norm(nvec, axis=0)
    tg_lat = IsotropicTangent(
        kappa=jnp.asarray(rng.uniform(1, 2, (lat.n_qp, lat.n_cells))),
        beta=jnp.asarray(rng.uniform(1, 2, (lat.n_qp, lat.n_cells))),
        gamma=jnp.asarray(rng.uniform(-0.5, 0.5, (lat.n_qp, lat.n_cells))),
        n=jnp.asarray(nvec),
    )
    tg_pk = IsotropicTangent(
        kappa=tg_lat.kappa.reshape(-1),
        beta=tg_lat.beta.reshape(-1),
        gamma=tg_lat.gamma.reshape(-1),
        n=tg_lat.n.reshape(6, -1),
    )
    v = jnp.asarray(rng.normal(size=V.ndofs))
    np.testing.assert_allclose(
        np.asarray(lat.matvec(v, tg_lat)),
        np.asarray(pk.matvec(v, tg_pk)),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(lat.jacobi_diag(tg_lat)),
        np.asarray(pk.jacobi_diag(tg_pk)),
        rtol=1e-11, atol=1e-12,
    )

    # observation gradient too
    g_lat = np.asarray(lat.grad(u))
    from fenics_constitutive_tpu.ops.packed import packed_grad

    g_pk = np.asarray(packed_grad(u, pk))
    np.testing.assert_allclose(g_lat, g_pk, rtol=1e-12, atol=1e-15)


@pytest.mark.slow
def test_f32_problem_stays_f32_under_x64():
    """Model parameters are WEAK-typed scalars: an f32 problem in this
    x64-enabled session must not promote to f64 anywhere in the step.

    Regression: strongly-typed default-dtype (f64) parameters silently
    promoted the constitutive kernels to f64 and broke the f32 CG
    while_loop carry ("carry input and carry output must have equal types")
    on the P2 lattice engine."""
    import jax

    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 2, 3)  # P2 -> lattice engine
    law = VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
         "p_y00": 2500.0, "p_w": 200.0}
    )
    assert all(v.weak_type for v in law.params.values())

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 1e-4),
    ]
    geos, models, state = build_packed_problem(
        V, law, q_degree=4, dtype=jnp.float32
    )
    assert state.u.dtype == jnp.float32

    eps = geos[0].strain(state.u)
    s, tg, h = models[0].evaluate_packed(
        0.0, 1.0, eps, state.stress[0], state.histories[0]
    )
    assert s.dtype == jnp.float32
    assert tg.beta.dtype == jnp.float32

    bc_dofs, bc_vals = combine_bcs(bcs)
    step = make_packed_step(geos, max_newton=3, cg_rtol=1e-6, cg_maxiter=200)
    st2, stats = jax.jit(
        lambda s_: step(
            models, s_, jnp.asarray(bc_dofs),
            jnp.asarray(bc_vals, jnp.float32),
            jnp.zeros(V.ndofs, jnp.float32), jnp.asarray(1.0, jnp.float32),
        )
    )(state)
    assert st2.u.dtype == jnp.float32
    assert st2.stress[0].dtype == jnp.float32
    assert np.isfinite(float(stats["r_norm"]))
