"""Windowed exchange engine (ops/windowed.py + ops/pallas_window.py).

Pins the general-unstructured-mesh fast path against the gather engine and
the naive index ops. Mirrors the reference's mesh-agnostic solver coverage
(reference tests/solver/test_solver_mpi.py builds unstructured-partitioned
cubes through the same mesh-blind IncrSmallStrainProblem).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh, unit_square_mesh
from fenics_constitutive_tpu.fem.mesh import Mesh
from fenics_constitutive_tpu.ops.mandel import Constraint
from fenics_constitutive_tpu.ops.packed import build_packed_geometry
from fenics_constitutive_tpu.ops.windowed import (
    build_windowed_exchange,
    build_windowed_geometry,
    reverse_cuthill_mckee,
)


def shuffled_mesh(n=8, cell_type="tetra", seed=0):
    """A box mesh with randomly permuted node numbering — emulates an
    imported (Gmsh) mesh: no structured metadata, no banded numbering."""
    mesh = (
        unit_cube_mesh(n, n, n, cell_type)
        if cell_type in ("tetra", "hex")
        else unit_square_mesh(n, n, cell_type)
    )
    rng = np.random.default_rng(seed)
    pi = rng.permutation(mesh.num_nodes)  # old -> new
    nodes = np.empty_like(mesh.nodes)
    nodes[pi] = mesh.nodes
    cells = pi[mesh.cells].astype(np.int32)
    return Mesh(nodes, cells, mesh.cell_type)  # structured_shape=None


def test_rcm_reduces_bandwidth():
    mesh = shuffled_mesh(10)
    perm = reverse_cuthill_mckee(mesh.cells, mesh.num_nodes)
    assert sorted(perm) == list(range(mesh.num_nodes))
    cn = perm[mesh.cells]
    bw = int((cn.max(axis=1) - cn.min(axis=1)).max())
    cn0 = mesh.cells
    bw0 = int((cn0.max(axis=1) - cn0.min(axis=1)).max())
    assert bw < bw0 / 4  # shuffled numbering has O(M) bandwidth
    assert bw < 3 * (11 * 11)  # ~ a few grid planes


def test_exchange_roundtrip_matches_naive():
    mesh = shuffled_mesh(6)
    ex = build_windowed_exchange(mesh.cells, mesh.num_nodes, tile=128)
    rng = np.random.default_rng(3)
    K = 3
    u = rng.standard_normal((K, ex.M))
    u2 = jnp.asarray(np.pad(u, ((0, 0), (0, ex.M_pad - ex.M))))
    rows = ex.gather_ref(u2)  # [B, K, Rn]
    cn = ex.perm[mesh.cells]
    # every (cell, slot) row must equal the node value
    for slot in range(ex.C_pad):
        c = ex.cell_order[slot]
        b, r = slot // ex.C_B, slot % ex.C_B
        for a in range(ex.n):
            got = np.asarray(rows[b, :, a * ex.C_B + r])
            want = u[:, cn[c, a]] if c >= 0 else np.zeros(K)
            np.testing.assert_array_equal(got, want)

    # scatter is the exact adjoint of gather: <G u, f> == <u, G^T f>
    f = jnp.asarray(rng.standard_normal((ex.B, K, ex.Rn)))
    y = ex.scatter_ref(f)
    lhs = float((rows * f).sum())
    rhs = float((u2 * y).sum())
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)


def test_pallas_kernels_match_reference():
    from fenics_constitutive_tpu.ops.pallas_window import (
        windowed_gather,
        windowed_scatter,
    )

    mesh = shuffled_mesh(6)
    ex = build_windowed_exchange(mesh.cells, mesh.num_nodes, tile=128)
    rng = np.random.default_rng(4)
    K = 3
    u2 = jnp.asarray(
        rng.standard_normal((K, ex.M_pad)).astype(np.float32)
    )
    g_ref = ex.gather_ref(u2)
    g_pl = windowed_gather(ex, u2, interpret=True)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_pl))

    f = jnp.asarray(
        rng.standard_normal((ex.B, K, ex.Rn)).astype(np.float32)
    )
    f_masked = jnp.where((ex.loc >= 0)[:, None, :], f, 0.0)
    y_ref = ex.scatter_ref(f_masked)
    y_pl = windowed_scatter(ex, f, interpret=True)  # kernel masks pads itself
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


@pytest.mark.parametrize("cell_type", ["tetra", "triangle"])
def test_geometry_matches_gather_engine(cell_type):
    """strain / residual / matvec / jacobi_diag parity vs PackedGeometry."""
    from fenics_constitutive_tpu.ops.packed import IsotropicTangent

    mesh = shuffled_mesh(5, cell_type)
    vs = mesh.gdim
    V = FunctionSpace(mesh, 1, vs)
    constraint = Constraint.FULL if vs == 3 else Constraint.PLANE_STRAIN
    q = 2
    geo_g = build_packed_geometry(V, q, constraint)
    geo_w = build_windowed_geometry(V, q, constraint)
    sdim = constraint.stress_strain_dim

    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(V.ndofs))
    ui = geo_w.to_internal(u)
    np.testing.assert_allclose(
        np.asarray(geo_w.from_internal(ui)), np.asarray(u), rtol=0, atol=0
    )

    # strain parity per original cell (windowed is q-major over plan slots)
    eps_g = np.asarray(geo_g.strain(u)).reshape(sdim, q_pts := geo_g.n_qp, -1)
    eps_w = np.asarray(geo_w.extract_cells(geo_w.strain(ui)))
    np.testing.assert_allclose(eps_w, eps_g, rtol=1e-12, atol=1e-13)

    # residual parity (external layout)
    sig_cells = rng.standard_normal((sdim, q_pts, mesh.num_cells))
    sig_g = jnp.asarray(sig_cells.reshape(sdim, -1))
    sig_w = np.zeros((sdim, q_pts, geo_w.ex.C_pad))
    sig_w[:, :, np.asarray(geo_w.slot_of_cell)] = sig_cells
    r_g = np.asarray(geo_g.residual(sig_g))
    r_w = np.asarray(geo_w.from_internal(geo_w.residual(
        jnp.asarray(sig_w.reshape(sdim, -1))
    )))
    np.testing.assert_allclose(r_w, r_g, rtol=1e-11, atol=1e-12)

    # matvec + jacobi parity with a spatially varying isotropic tangent
    def tangent_for(geo, order_slots=None):
        N = geo.qp_shape(1)[1]
        beta = jnp.asarray(1.0 + rng.standard_normal(N) ** 2)
        return beta

    N_g = geo_g.N
    beta_cells = 1.0 + rng.standard_normal((q_pts, mesh.num_cells)) ** 2
    n_cells = rng.standard_normal((sdim, q_pts, mesh.num_cells))
    beta_w = np.zeros((q_pts, geo_w.ex.C_pad))
    beta_w[:, np.asarray(geo_w.slot_of_cell)] = beta_cells
    nf_w = np.zeros((sdim, q_pts, geo_w.ex.C_pad))
    nf_w[:, :, np.asarray(geo_w.slot_of_cell)] = n_cells

    tg_g = IsotropicTangent(
        kappa=jnp.asarray(2.0),
        beta=jnp.asarray(beta_cells.reshape(-1)),
        gamma=jnp.asarray(0.5 * beta_cells.reshape(-1)),
        n=jnp.asarray(n_cells.reshape(sdim, -1)),
    )
    tg_w = IsotropicTangent(
        kappa=jnp.asarray(2.0),
        beta=jnp.asarray(beta_w.reshape(-1)),
        gamma=jnp.asarray(0.5 * beta_w.reshape(-1)),
        n=jnp.asarray(nf_w.reshape(sdim, -1)),
    )
    v = jnp.asarray(rng.standard_normal(V.ndofs))
    mv_g = np.asarray(geo_g.matvec(v, tg_g))
    mv_w = np.asarray(
        geo_w.from_internal(geo_w.matvec(geo_w.to_internal(v), tg_w))
    )
    np.testing.assert_allclose(mv_w, mv_g, rtol=1e-11, atol=1e-12)

    d_g = np.asarray(geo_g.jacobi_diag(tg_g))
    d_w = np.asarray(geo_w.from_internal(geo_w.jacobi_diag(tg_w)))
    np.testing.assert_allclose(d_w, d_g, rtol=1e-11, atol=1e-12)


def _bar_bcs(V, stretch):
    from fenics_constitutive_tpu.fem import DirichletBC

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), stretch
        ),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
    ]
    if V.value_size == 3:
        bcs.append(
            DirichletBC(
                V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0
            )
        )
    return bcs


def test_windowed_bvp_matches_gather_engine():
    """Full plastic BVP through PackedSimulation: windowed == gather."""
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver import PackedSimulation

    mesh = shuffled_mesh(4)
    V = FunctionSpace(mesh, 1, 3)
    mat = {
        "p_ka": 175000.0,
        "p_mu": 80769.0,
        "p_y0": 1200.0,
        "p_y00": 2500.0,
        "p_w": 200.0,
    }
    bcs = _bar_bcs(V, 0.0)
    sims = {
        eng: PackedSimulation(
            VonMises3D(mat), V, bcs, 2, engine=eng,
            newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-12,
        )
        for eng in ("windowed", "gather")
    }
    for k in (1, 2, 3):
        bcs[1].value = 0.004 * k
        results = {}
        for eng, sim in sims.items():
            niter, conv = sim.solve()
            assert conv, eng
            results[eng] = np.asarray(sim.u)
        np.testing.assert_allclose(
            results["windowed"], results["gather"], rtol=1e-9, atol=1e-11
        )
    s_w, s_g = (np.asarray(sims[e].stress) for e in ("windowed", "gather"))
    np.testing.assert_allclose(s_w, s_g, rtol=1e-8, atol=1e-8)
    assert (np.abs(s_w) > 100.0).any()  # genuinely stressed


def test_windowed_multimaterial_bvp():
    """Two laws on cell subsets of a general mesh share the RCM plan."""
    from fenics_constitutive_tpu.models import LinearElasticityModel
    from fenics_constitutive_tpu.solver import PackedSimulation

    mesh = shuffled_mesh(4)
    V = FunctionSpace(mesh, 1, 3)
    mids = mesh.cell_midpoints()
    left = np.nonzero(mids[:, 0] < 0.5)[0].astype(np.int32)
    right = np.nonzero(mids[:, 0] >= 0.5)[0].astype(np.int32)
    laws_of = lambda: [
        (LinearElasticityModel({"E": 2000.0, "nu": 0.3}, Constraint.FULL), left),
        (LinearElasticityModel({"E": 1000.0, "nu": 0.3}, Constraint.FULL), right),
    ]
    bcs = _bar_bcs(V, 0.01)
    sim_w = PackedSimulation(
        laws_of(), V, bcs, 2, engine="windowed",
        newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-12,
    )
    sim_g = PackedSimulation(
        laws_of(), V, bcs, 2, engine="gather",
        newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-12,
    )
    for sim in (sim_w, sim_g):
        niter, conv = sim.solve()
        assert conv
    np.testing.assert_allclose(
        np.asarray(sim_w.u), np.asarray(sim_g.u), rtol=1e-9, atol=1e-12
    )
    # physics sanity (not just engine parity): the stiff half strains less,
    # so the interface displacement sits between the 1D series-spring value
    # (0.01/3) and the homogeneous-bar value (0.005), shifted by 3D Poisson
    # coupling at the interface
    u = np.asarray(sim_w.u).reshape(-1, 3)
    x = V.dof_coords[:, 0]
    mid = u[np.isclose(x, 0.5), 0].mean()
    assert 0.0030 < mid < 0.0046


def test_windowed_p2_matches_gather_engine():
    """Degree-2 general tets: the windowed plan runs on dof-nodes (10 per
    tet), so higher-order spaces ride the same engine."""
    from fenics_constitutive_tpu.ops.packed import IsotropicTangent

    mesh = shuffled_mesh(3)
    V = FunctionSpace(mesh, 2, 3)
    geo_g = build_packed_geometry(V, 2, Constraint.FULL)
    geo_w = build_windowed_geometry(V, 2, Constraint.FULL)
    assert geo_w.n_nodes == 10

    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal(V.ndofs))
    eps_g = np.asarray(geo_g.strain(u)).reshape(6, geo_g.n_qp, -1)
    eps_w = np.asarray(geo_w.extract_cells(geo_w.strain(geo_w.to_internal(u))))
    np.testing.assert_allclose(eps_w, eps_g, rtol=1e-12, atol=1e-12)

    N_g = geo_g.N
    tg_g = IsotropicTangent(
        kappa=jnp.asarray(2.0),
        beta=jnp.full(N_g, 1.5), gamma=jnp.zeros(N_g),
        n=jnp.zeros((6, N_g)),
    )
    tg_w = IsotropicTangent(
        kappa=jnp.asarray(2.0),
        beta=jnp.full(geo_w.N, 1.5), gamma=jnp.zeros(geo_w.N),
        n=jnp.zeros((6, geo_w.N)),
    )
    v = jnp.asarray(rng.standard_normal(V.ndofs))
    mv_g = np.asarray(geo_g.matvec(v, tg_g))
    mv_w = np.asarray(
        geo_w.from_internal(geo_w.matvec(geo_w.to_internal(v), tg_w))
    )
    np.testing.assert_allclose(mv_w, mv_g, rtol=1e-11, atol=1e-11)


def test_windowed_amg_preconditioner():
    """engine='windowed' + preconditioner='amg': the windowed-BSR V-cycle
    (ops/windowed_bsr.py) consumes internal vectors directly, matches the
    ELL AMG apply at machine precision, and cuts CG iterations."""
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver import PackedSimulation
    from fenics_constitutive_tpu.solver.amg import (
        WindowedAmgPreconditioner,
        build_amg,
    )

    mesh = shuffled_mesh(6)
    V = FunctionSpace(mesh, 1, 3)
    mat = {
        "p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
        "p_y00": 2500.0, "p_w": 200.0,
    }
    bcs = _bar_bcs(V, 0.004)

    # apply parity vs the ELL hierarchy
    from fenics_constitutive_tpu.fem.bcs import combine_bcs

    free = np.ones(V.ndofs, bool)
    free[combine_bcs(bcs)[0]] = False
    ell = build_amg(V, 80769.0, 175000.0, free, q_degree=2)
    win = build_amg(V, 80769.0, 175000.0, free, q_degree=2, spmv="windowed")
    assert isinstance(win, WindowedAmgPreconditioner)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(V.ndofs) * free)
    z_e, z_w = np.asarray(ell(r)), np.asarray(win(r))
    np.testing.assert_allclose(z_w, z_e, rtol=1e-13, atol=1e-13 * np.abs(z_e).max())

    # end-to-end: windowed engine + windowed AMG solves, and needs far fewer
    # CG iterations than Jacobi
    def solve_with(pc):
        sim = PackedSimulation(
            VonMises3D(mat), V, bcs, 2, engine="windowed", preconditioner=pc,
            newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-10,
        )
        niter, conv = sim.solve()
        assert conv
        return sim

    sim_amg = solve_with("amg")
    sim_jac = solve_with(None)
    np.testing.assert_allclose(
        np.asarray(sim_amg.u), np.asarray(sim_jac.u), rtol=1e-8, atol=1e-12
    )
    it_amg = int(sim_amg.last_stats["cg_iters_last"])
    it_jac = int(sim_jac.last_stats["cg_iters_last"])
    assert it_amg < it_jac / 2, (it_amg, it_jac)


def test_interactive_problem_on_windowed_geos(monkeypatch):
    """IncrSmallStrainProblem (the interactive/compat surface) must work
    when build_packed_problem auto-selects the WINDOWED engine for a large
    general mesh — its eval and Krylov cores convert at the internal-layout
    boundary (r5 regression: external u fed to internal-layout strain
    raised a reshape error). Threshold patched down so a small shuffled
    mesh exercises the windowed geos."""
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
    from fenics_constitutive_tpu.solver import packed_step as ps

    mat = {
        "p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
        "p_y00": 2500.0, "p_w": 200.0,
    }
    mesh = shuffled_mesh(4)
    V = FunctionSpace(mesh, 1, 3)

    monkeypatch.setattr(ps, "WINDOWED_MIN_CELLS", 8)
    prob_w = IncrSmallStrainProblem(VonMises3D(mat), V, _bar_bcs(V, 0.004), 2)
    assert hasattr(prob_w._pk_geos[0], "to_internal")
    niter_w, conv_w = prob_w.solve()
    assert conv_w

    monkeypatch.undo()
    prob_g = IncrSmallStrainProblem(VonMises3D(mat), V, _bar_bcs(V, 0.004), 2)
    assert not hasattr(prob_g._pk_geos[0], "to_internal")
    niter_g, conv_g = prob_g.solve()
    assert conv_g
    np.testing.assert_allclose(
        np.asarray(prob_w.u), np.asarray(prob_g.u), rtol=1e-9, atol=1e-12
    )


def test_bsr_select_passes_interpret():
    """The bf16 split depth of the Pallas BSR column select: 3 passes
    reconstruct f32 exactly; 1 pass (the AMG preconditioner default,
    solver/amg.build_amg select_passes=1) rounds the gathered x at bf16
    (~2^-9 relative) — verified in interpret mode against the XLA ref."""
    import dataclasses

    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.ops.pallas_window import windowed_bsr_matvec
    from fenics_constitutive_tpu.solver.amg import build_amg

    mesh = shuffled_mesh(5)
    V = FunctionSpace(mesh, 1, 3)
    free = np.ones(V.ndofs, bool)
    win = build_amg(
        V, 80769.0, 175000.0, free, q_degree=2, spmv="windowed",
        select_passes=3,
    )
    w3 = win.A_win[0]
    assert w3.select_passes == 3
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal(w3.bc * w3.NC_pad).astype(np.float32)
    )
    y_ref = np.asarray(w3.matvec_ref(x))
    y3 = np.asarray(windowed_bsr_matvec(w3, x, interpret=True))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y3, y_ref, rtol=0, atol=1e-6 * scale)

    w1 = dataclasses.replace(w3, select_passes=1)
    y1 = np.asarray(windowed_bsr_matvec(w1, x, interpret=True))
    rel1 = np.abs(y1 - y_ref).max() / scale
    assert 1e-8 < rel1 < 1e-2, rel1  # bf16-rounded select, not exact


def test_windowed_neumann_matches_gather_engine():
    """External (Neumann) loads on the windowed engine: f_ext crosses the
    internal-layout boundary (PackedSimulation._f_ext_int after the r5
    internal-state refactor) — pinned against the gather engine."""
    from fenics_constitutive_tpu.fem import DirichletBC
    from fenics_constitutive_tpu.fem.facets import (
        assemble_facet_traction,
        locate_boundary_facets,
    )
    from fenics_constitutive_tpu.models import LinearElasticityModel
    from fenics_constitutive_tpu.solver import PackedSimulation

    mesh = shuffled_mesh(5)
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    facets = locate_boundary_facets(V.mesh, close(0, 1.0))
    f_ext = assemble_facet_traction(V, facets, np.array([100.0, 0.0, 0.0]))
    law = LinearElasticityModel({"E": 1000.0, "nu": 0.3}, Constraint.FULL)
    us = {}
    for eng in ("windowed", "gather"):
        sim = PackedSimulation(
            law, V, bcs, 2, engine=eng, f_ext=f_ext,
            newton_rtol=1e-12, newton_atol=1e-12, cg_rtol=1e-13,
        )
        niter, conv = sim.solve()
        assert conv, eng
        us[eng] = np.asarray(sim.u)
    rel = np.linalg.norm(us["windowed"] - us["gather"]) / np.linalg.norm(
        us["gather"]
    )
    assert rel < 1e-9, rel
    # physics sanity: traction pulls +x, the free face moves +x
    face = np.asarray(V.locate_dofs_geometrical(close(0, 1.0), component=0))
    assert us["windowed"][face].mean() > 0


def test_windowed_solve_schedule_f_ext():
    """solve_schedule on the windowed engine converts external loads at the
    internal-layout boundary: [K] scalar ramps of self.f_ext and full
    [K, ndofs] per-step vectors (vmapped to_internal) give identical
    committed states."""
    from fenics_constitutive_tpu.fem import DirichletBC
    from fenics_constitutive_tpu.fem.facets import (
        assemble_facet_traction,
        locate_boundary_facets,
    )
    from fenics_constitutive_tpu.models import LinearElasticityModel
    from fenics_constitutive_tpu.solver import PackedSimulation

    mesh = shuffled_mesh(4)
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    facets = locate_boundary_facets(V.mesh, close(0, 1.0))
    f_ext = np.asarray(
        assemble_facet_traction(V, facets, np.array([100.0, 0.0, 0.0]))
    )
    law = LinearElasticityModel({"E": 1000.0, "nu": 0.3}, Constraint.FULL)
    K = 3
    n_bc = sum(len(np.asarray(b.dofs)) for b in bcs)
    vals = np.zeros((K, n_bc))

    sim = PackedSimulation(
        law, V, bcs, 2, engine="windowed", f_ext=f_ext,
        newton_rtol=1e-12, newton_atol=1e-12, cg_rtol=1e-13,
    )
    stats = sim.solve_schedule(vals, f_ext_scales=np.array([0.5, 1.0, 1.0]))
    assert bool(stats["converged"].all())

    sim2 = PackedSimulation(
        law, V, bcs, 2, engine="windowed",
        newton_rtol=1e-12, newton_atol=1e-12, cg_rtol=1e-13,
    )
    stats2 = sim2.solve_schedule(
        vals, f_ext_scales=np.stack([0.5 * f_ext, f_ext, f_ext])
    )
    assert bool(stats2["converged"].all())
    np.testing.assert_allclose(
        np.asarray(sim2.u), np.asarray(sim.u), rtol=1e-10, atol=1e-14
    )


def test_windowed_substepping_from_committed_state():
    """Adaptive substepping on the windowed engine interpolates BC values
    from the COMMITTED state's internal vector (r5 internal-state refactor:
    start_vals extraction via internal bc slots)."""
    from fenics_constitutive_tpu.fem import DirichletBC
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver import PackedSimulation

    mesh = shuffled_mesh(4)
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bm = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bm,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    mat = {
        "p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
        "p_y00": 2500.0, "p_w": 200.0,
    }
    sim = PackedSimulation(
        VonMises3D(mat), V, bcs, 2, engine="windowed",
        newton_rtol=1e-8, newton_atol=1e-8,
        max_subdivisions=2, cg_rtol=1e-12,
    )
    bm.value = 0.004
    _, c1 = sim.solve()
    assert c1

    # force the whole-step attempt to REPORT failure so solve() must take
    # the subdivision path deterministically (crossing the yield kink with
    # a tiny Newton cap is physics-fragile); every substep's bc values must
    # then interpolate from the COMMITTED 0.004, never from zero
    seen = []
    orig = sim._attempt
    calls = {"n": 0}

    def attempt(bc_dofs, bc_vals, f_ext, dt):
        seen.append(float(jnp.max(jnp.abs(bc_vals))))
        niter, ok = orig(bc_dofs, bc_vals, f_ext, dt)
        calls["n"] += 1
        if calls["n"] == 1:
            return niter, False
        return niter, ok

    sim._attempt = attempt
    bm.value = 0.012
    niter, c2 = sim.solve()
    assert c2, seen
    assert len(seen) >= 3, seen  # whole + 2 substeps of level 1
    # level-1 substeps: 0.004 + {1/2, 1}*(0.012 - 0.004) = 0.008, 0.012
    np.testing.assert_allclose(seen[1:3], [0.008, 0.012], atol=1e-12)
    u = np.asarray(sim.u)
    face = np.asarray(V.locate_dofs_geometrical(close(0, 1.0), component=0))
    np.testing.assert_allclose(u[face], 0.012, atol=1e-6)


def test_windowed_checkpoint_resume(tmp_path):
    """Checkpoint/resume of the production driver on the windowed engine:
    save_checkpoint(sim.state_dict()) -> fresh sim -> load_state_dict ->
    the resumed run matches the uninterrupted one exactly."""
    from fenics_constitutive_tpu.fem import DirichletBC
    from fenics_constitutive_tpu.models import VonMises3D
    from fenics_constitutive_tpu.solver import PackedSimulation
    from fenics_constitutive_tpu.utils import load_checkpoint, save_checkpoint

    mesh = shuffled_mesh(4)
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    def mk():
        bm = DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
        )
        bcs = [
            DirichletBC(
                V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0
            ),
            bm,
            DirichletBC(
                V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0
            ),
            DirichletBC(
                V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0
            ),
        ]
        mat = {
            "p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
            "p_y00": 2500.0, "p_w": 200.0,
        }
        sim = PackedSimulation(
            VonMises3D(mat), V, bcs, 2, engine="windowed",
            newton_rtol=1e-10, newton_atol=1e-10, cg_rtol=1e-12,
        )
        return sim, bm

    sim, bm = mk()
    bm.value = 0.006
    assert sim.solve()[1]
    save_checkpoint(tmp_path / "ck.npz", sim.state_dict())
    bm.value = 0.008
    assert sim.solve()[1]
    u_ref = np.asarray(sim.u)

    sim2, bm2 = mk()
    sim2.load_state_dict(load_checkpoint(tmp_path / "ck.npz"))
    assert float(sim2.state.t) == 1.0  # one committed step's time restored
    bm2.value = 0.008
    assert sim2.solve()[1]
    np.testing.assert_allclose(np.asarray(sim2.u), u_ref, rtol=0, atol=1e-14)
