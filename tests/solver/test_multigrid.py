"""Geometric multigrid / BPX preconditioner tests (structured grids).

Validates: exact Galerkin consistency of the transfer pair (R = P^T with
rediscretized coarse operators on nested levels), V-cycle contraction on the
constrained elastic operator, BPX symmetry, and that MG/BPX-preconditioned CG
reproduces the Jacobi-CG solution on a plastic tangent while using fewer
iterations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.ops.mandel import Constraint
from fenics_constitutive_tpu.ops.structured import build_structured_geometry
from fenics_constitutive_tpu.solver.linear import cg_solve
from fenics_constitutive_tpu.solver.multigrid import build_multigrid

MU, KAPPA = 80769.0, 175000.0
MAT = {"p_ka": KAPPA, "p_mu": MU, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}


@pytest.fixture(scope="module")
def setup():
    n = 12
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.01),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    geo = build_structured_geometry(V, 2, Constraint.FULL)
    bc_dofs, bc_vals = combine_bcs(bcs)
    free = jnp.ones(V.ndofs, bool).at[jnp.asarray(bc_dofs)].set(False)
    mg = build_multigrid(geo, MU, KAPPA, free)

    # a plastic tangent field from one trial evaluation
    law = VonMises3D(MAT)
    from fenics_constitutive_tpu.models import packed_models  # noqa: F401

    u0 = jnp.zeros(V.ndofs).at[jnp.asarray(bc_dofs)].set(jnp.asarray(bc_vals))
    eps = geo.strain(u0)
    hist = {
        "eps_n": jnp.zeros(geo.qp_shape(6)),
        "alpha": jnp.zeros(geo.qp_shape(1)),
    }
    s_new, tg, _ = law.evaluate_packed(0.0, 1.0, eps, jnp.zeros(geo.qp_shape(6)), hist)
    r = geo.residual(s_new)
    return geo, mg, free, tg, r


def test_galerkin_consistency(setup):
    """R A P == A_coarse exactly on the nested top level."""
    geo, mg, free, tg, r = setup
    rng = np.random.default_rng(1)
    nc = mg.node_grids[1]
    vc = jnp.asarray(rng.normal(size=mg.vs * nc[0] * nc[1] * nc[2]))
    tge = mg._tangent(0, jnp.float64)
    RAPv = mg.restrict(geo.matvec_gm(mg.prolong(vc, 0), tge), 0)
    Acv = mg.geos[1].matvec_gm(vc, mg._tangent(1, jnp.float64))
    np.testing.assert_allclose(np.asarray(RAPv), np.asarray(Acv), rtol=1e-10, atol=1e-9)


def test_vcycle_contracts_elastic(setup):
    geo, mg, free, tg, r = setup
    rng = np.random.default_rng(0)
    free_gm = geo.to_grid_major(free)
    tge = mg._tangent(0, jnp.float64)

    def A(v):
        vm = jnp.where(free_gm, v, 0.0)
        return jnp.where(free_gm, geo.matvec_gm(vm, tge), v)

    b = A(jnp.where(free_gm, jnp.asarray(rng.normal(size=geo.ndofs)), 0.0))
    x = jnp.zeros_like(b)
    rr = b
    norms = [float(jnp.linalg.norm(rr))]
    for _ in range(5):
        x = x + mg(rr)
        rr = b - A(x)
        norms.append(float(jnp.linalg.norm(rr)))
    # monotone contraction, overall factor well under 1 per cycle
    assert norms[5] < 0.05 * norms[0]
    assert all(b < a for a, b in zip(norms, norms[1:]))


def test_bpx_symmetric(setup):
    geo, mg, free, tg, r = setup
    rng = np.random.default_rng(2)
    free_gm = geo.to_grid_major(free)
    r1 = jnp.where(free_gm, jnp.asarray(rng.normal(size=geo.ndofs)), 0.0)
    r2 = jnp.where(free_gm, jnp.asarray(rng.normal(size=geo.ndofs)), 0.0)
    a = float(jnp.vdot(mg.bpx(r1), r2))
    b = float(jnp.vdot(r1, mg.bpx(r2)))
    assert abs(a - b) <= 1e-12 * max(abs(a), 1.0)


@pytest.mark.parametrize("which", ["vcycle", "bpx"])
def test_preconditioned_cg_matches_jacobi(setup, which):
    geo, mg, free, tg, r = setup
    free_gm = geo.to_grid_major(free)
    r_gm = geo.to_grid_major(jnp.where(free, r, 0.0))

    def matvec(v):
        vm = jnp.where(free_gm, v, 0.0)
        return jnp.where(free_gm, geo.matvec_gm(vm, tg), v)

    diag = jnp.where(free_gm, geo.jacobi_diag_gm(tg), 1.0)
    x_j, k_j = cg_solve(matvec, r_gm, diag, rtol=1e-10, maxiter=5000)

    pc = mg if which == "vcycle" else mg.bpx

    def precond(rr):
        z = pc(jnp.where(free_gm, rr, 0.0))
        return jnp.where(free_gm, z, rr)

    x_m, k_m = cg_solve(matvec, r_gm, rtol=1e-10, maxiter=2000, precond=precond)
    np.testing.assert_allclose(
        np.asarray(x_m), np.asarray(x_j), rtol=1e-6, atol=1e-12
    )
    assert int(k_m) < int(k_j), (int(k_m), int(k_j))


def test_elastic_matvec_folded_equivalence(setup):
    """elastic_matvec_gm (quadrature-folded element matmul) must equal the
    channel-path matvec with the equivalent constant IsotropicTangent."""
    from fenics_constitutive_tpu.ops.packed import IsotropicTangent

    geo, mg, free, tg, r = setup
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(size=geo.ndofs))
    tge = IsotropicTangent(
        kappa=jnp.asarray(KAPPA), beta=jnp.asarray(2.0 * MU),
        gamma=jnp.asarray(0.0), n=jnp.zeros((6, 1, 1)),
    )
    a = geo.matvec_gm(v, tge)
    b = geo.elastic_matvec_gm(v, jnp.asarray(KAPPA), jnp.asarray(2.0 * MU))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12, atol=1e-9)


@pytest.mark.slow
def test_chebyshev_smoother_cg(setup):
    """Chebyshev-smoothed V-cycle: correct solution, competitive iterations.

    Same A-applies per smooth as damped Jacobi, so beating the Jacobi-smoothed
    count means strictly cheaper solves; equality is accepted (the advantage
    grows with grid depth / plastic heterogeneity — measured at the 50^3 bench
    state, see docs/performance.md)."""
    geo, mg_j, free, tg, r = setup
    free_gm = geo.to_grid_major(free)
    r_gm = geo.to_grid_major(jnp.where(free, r, 0.0))
    mg_c = build_multigrid(geo, MU, KAPPA, free, smoother="chebyshev")
    assert len(mg_c.lmax) == mg_c.n_levels
    assert all(0.5 < l < 4.0 for l in mg_c.lmax), mg_c.lmax

    def matvec(v):
        vm = jnp.where(free_gm, v, 0.0)
        return jnp.where(free_gm, geo.matvec_gm(vm, tg), v)

    def precond_of(pc):
        def precond(rr):
            z = pc(jnp.where(free_gm, rr, 0.0))
            return jnp.where(free_gm, z, rr)
        return precond

    x_j, k_j = cg_solve(
        matvec, r_gm, rtol=1e-10, maxiter=2000, precond=precond_of(mg_j)
    )
    x_c, k_c = cg_solve(
        matvec, r_gm, rtol=1e-10, maxiter=2000, precond=precond_of(mg_c)
    )
    np.testing.assert_allclose(
        np.asarray(x_c), np.asarray(x_j), rtol=1e-6, atol=1e-12
    )
    assert int(k_c) <= int(k_j), (int(k_c), int(k_j))


@pytest.mark.slow
def test_direct_coarse_solve_cg(setup):
    """coarse_direct=True (dense inverse at the coarsest level) yields the
    same CG solution with no more iterations than iterative coarse smoothing."""
    geo, mg_it, free, tg, r = setup
    free_gm = geo.to_grid_major(free)
    r_gm = geo.to_grid_major(jnp.where(free, r, 0.0))
    mg_d = build_multigrid(geo, MU, KAPPA, free, coarse_direct=True)
    nC = mg_d.coarse_inv.shape[0]
    assert mg_d.coarse_inv.shape == (nC, nC)
    # the stored inverse actually inverts the constrained coarse operator
    gC, freeC = mg_d.geos[-1], mg_d.frees[-1]
    tangC = mg_d._tangent(mg_d.n_levels - 1, mg_d.coarse_inv.dtype)
    rng = np.random.default_rng(11)
    v = jnp.where(freeC, jnp.asarray(rng.normal(size=nC)), 0.0)
    Av = jnp.where(freeC, gC.matvec_gm(jnp.where(freeC, v, 0.0), tangC), v)
    np.testing.assert_allclose(
        np.asarray(mg_d.coarse_inv @ Av), np.asarray(v), rtol=1e-8, atol=1e-10
    )

    def matvec(w):
        wm = jnp.where(free_gm, w, 0.0)
        return jnp.where(free_gm, geo.matvec_gm(wm, tg), w)

    def precond_of(pc):
        def precond(rr):
            z = pc(jnp.where(free_gm, rr, 0.0))
            return jnp.where(free_gm, z, rr)
        return precond

    x_i, k_i = cg_solve(
        matvec, r_gm, rtol=1e-10, maxiter=2000, precond=precond_of(mg_it)
    )
    x_d, k_d = cg_solve(
        matvec, r_gm, rtol=1e-10, maxiter=2000, precond=precond_of(mg_d)
    )
    np.testing.assert_allclose(
        np.asarray(x_d), np.asarray(x_i), rtol=1e-6, atol=1e-12
    )
    assert int(k_d) <= int(k_i) + 1, (int(k_d), int(k_i))


def test_grid_major_roundtrip(setup):
    geo, *_ = setup
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=geo.ndofs))
    np.testing.assert_array_equal(
        np.asarray(geo.to_node_major(geo.to_grid_major(u))), np.asarray(u)
    )
    # gm matvec == node-major matvec
    tg = build_multigrid(geo, MU, KAPPA)._tangent(0, jnp.float64)
    a = geo.to_node_major(geo.matvec_gm(geo.to_grid_major(u), tg))
    b = geo.matvec(u, tg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12)
