"""PackedSimulation driver: reference-style stepping on the fast engines."""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem, PackedSimulation

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def setup():
    mesh = unit_cube_mesh(4, 4, 4, "hex")
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
    return V, bcs, bc_move


@pytest.mark.parametrize("pc", [None, "bpx", "vcycle"])
def test_simulation_matches_interactive(pc):
    V, bcs, bc_move = setup()
    sim = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2, preconditioner=pc,
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )
    problem = IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 2)

    for k in (1, 2, 3):
        bc_move.value = 0.004 * k
        n_s, conv_s = sim.solve()
        assert conv_s
        n_p, conv_p = problem.solve()
        assert conv_p
        problem.update()

    np.testing.assert_allclose(
        np.asarray(sim.u), np.asarray(problem.u), rtol=1e-8, atol=1e-12
    )
    # observation: [C, Q, s] stress agrees
    np.testing.assert_allclose(
        sim.stress, np.asarray(problem.stress_0), rtol=1e-6, atol=1e-8
    )
    assert sim.time == pytest.approx(3.0)
    assert sim.last_stats["cg_iters_last"] > 0


def test_solve_schedule_matches_sequential():
    """solve_schedule (one lax.scan dispatch for the whole load path) commits
    the same state as K sequential solve() calls."""
    from fenics_constitutive_tpu.fem.bcs import combine_bcs

    V, bcs, bc_move = setup()
    ramp = [0.004, 0.008, 0.012]

    sim_seq = PackedSimulation(VonMises3D(MAT), V, bcs, 2)
    for v in ramp:
        bc_move.value = v
        _, conv = sim_seq.solve()
        assert conv

    bc_move.value = 0.0
    sim_sched = PackedSimulation(VonMises3D(MAT), V, bcs, 2)
    # build the [K, n_bc] schedule: mutate bc_move per step and capture the
    # combined value vector
    vals = []
    for v in ramp:
        bc_move.value = v
        vals.append(combine_bcs(bcs)[1])
    stats = sim_sched.solve_schedule(np.stack(vals))

    assert stats["converged"].all(), stats
    assert stats["newton_iters"].shape == (3,)
    np.testing.assert_allclose(
        np.asarray(sim_sched.u), np.asarray(sim_seq.u), rtol=1e-10, atol=1e-13
    )
    np.testing.assert_allclose(
        sim_sched.stress, sim_seq.stress, rtol=1e-8, atol=1e-10
    )
    assert sim_sched.time == pytest.approx(sim_seq.time)


@pytest.mark.slow
def test_convergence_reporting_semantics():
    """converged reflects the residual tolerance, not "stopped before cap".

    VERDICT r1 #5: a step converging exactly on the max_newton-th iteration
    must report True; a genuinely capped step with a large residual must
    report False (dolfinx NewtonSolver semantics).
    """
    V, bcs, bc_move = setup()

    # (a) max_newton=1: a plastic step needs >1 Newton iteration, so the
    # residual cannot meet tol -> capped, must report False.
    sim_capped = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2, max_newton=1,
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )
    bc_move.value = 0.01  # well into plastic flow
    niter, converged = sim_capped.solve()
    assert niter == 1
    assert not converged

    # (b) run a normal solve, observe how many iterations it takes, then
    # re-run with max_newton set to exactly that count: same convergence,
    # stopping on the cap-th iteration, must still report True.
    sim_a = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2,
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )
    bc_move.value = 0.01
    n_free, conv_free = sim_a.solve()
    assert conv_free and n_free > 1

    sim_b = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2, max_newton=n_free,
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )
    niter_b, conv_b = sim_b.solve()
    assert niter_b == n_free
    assert conv_b, "converging exactly on the max_newton-th iteration is converged"


# --- every model on the production path (VERDICT r1 #3) ---------------------

from fenics_constitutive_tpu.models import (  # noqa: E402
    Constraint,
    DruckerPrager3D,
    DruckerPragerHyperbolic3D,
    LinearElasticityModel,
    MisesPlasticityLinearHardening3D,
    SpringKelvinModel,
    SpringMaxwellModel,
)

DP = {"mu": 80769.0, "kappa": 175000.0, "a": 1000.0, "b": 0.15, "b_flow": 0.15}
DPH = {**{k: v for k, v in DP.items()}, "d": 0.1}
SLS = {"E0": 42000.0, "E1": 10000.0, "tau": 2.0, "nu": 0.3}

ALL_LAWS = [
    pytest.param(lambda: LinearElasticityModel({"E": 42000.0, "nu": 0.3}, Constraint.FULL), id="elastic"),
    pytest.param(lambda: VonMises3D(MAT), id="mises-exp"),
    pytest.param(lambda: MisesPlasticityLinearHardening3D(
        {"mu": 80769.0, "kappa": 175000.0, "y_0": 1200.0, "h": 5000.0}), id="mises-lin"),
    pytest.param(lambda: SpringKelvinModel(SLS, Constraint.FULL), id="kelvin"),
    pytest.param(lambda: SpringMaxwellModel(SLS, Constraint.FULL), id="maxwell"),
    pytest.param(lambda: DruckerPrager3D(DP), id="dp"),
    pytest.param(lambda: DruckerPragerHyperbolic3D(DPH), id="dp-hyp"),
]


@pytest.mark.parametrize("make_law", ALL_LAWS)
@pytest.mark.slow
def test_every_model_on_production_path(make_law):
    """PackedSimulation accepts any IncrSmallStrainModel, like the reference
    solver accepts any law (_solver.py:54-73): hot models via fused SoA
    kernels, the rest through the generic evaluate_packed adapter. Pinned
    against the interactive AoS solve."""
    mesh = unit_cube_mesh(3, 3, 3, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    def mkbcs():
        bc_move = DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
        )
        return [
            DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
            bc_move,
            DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
            DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
        ], bc_move

    bcs, bc_move = mkbcs()
    sim = PackedSimulation(
        make_law(), V, bcs, 2, del_t=0.5,
        newton_rtol=1e-11, newton_atol=1e-10, cg_rtol=1e-12,
    )
    problem = IncrSmallStrainProblem(make_law(), V, bcs, 2, del_t=0.5)

    for k in (1, 2):
        bc_move.value = 0.004 * k
        n_s, conv_s = sim.solve()
        assert conv_s
        n_p, conv_p = problem.solve()
        assert conv_p
        problem.update()

    np.testing.assert_allclose(
        np.asarray(sim.u), np.asarray(problem.u), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        sim.stress, np.asarray(problem.stress_0), rtol=1e-6, atol=1e-6
    )


# --- external (Neumann) loads on the production driver (VERDICT r2 #1) ------


def _creep_bvp(dim, mat):
    """Reference test_viscoelasticity.py:369-527 setup: symmetric-boundary
    uniaxial tension driven by a traction on the x=1 face."""
    from fenics_constitutive_tpu.fem import unit_square_mesh
    from fenics_constitutive_tpu.fem.facets import (
        assemble_facet_traction,
        locate_boundary_facets,
    )

    E0, E1, TAU, NU = 42.0, 10.0, 10.0, 0.2
    f_max = 0.1
    if dim == 2:
        mesh = unit_square_mesh(2, 2, "triangle")
        constraint = Constraint.PLANE_STRESS
    else:
        mesh = unit_cube_mesh(2, 2, 2, "tetra")
        constraint = Constraint.FULL
    V = FunctionSpace(mesh, 1, dim)
    law = mat({"E0": E0, "E1": E1, "tau": TAU, "nu": NU}, constraint)

    def axis_is(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(axis_is(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(axis_is(1, 0.0), component=1), 0.0),
    ]
    if dim == 3:
        bcs.append(
            DirichletBC(V.locate_dofs_geometrical(axis_is(2, 0.0), component=2), 0.0)
        )
    load = np.zeros(dim)
    load[0] = f_max
    facets = locate_boundary_facets(mesh, axis_is(0, 1.0))
    f_ext = assemble_facet_traction(V, facets, load)
    return V, law, bcs, f_ext, (E0, E1, TAU, f_max)


@pytest.mark.parametrize("mat", [SpringKelvinModel, SpringMaxwellModel])
@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.slow
def test_creep_on_production_engine(dim, mat):
    """Stress-controlled creep (reference test_viscoelasticity.py:369-527) on
    PackedSimulation: traction f_ext drives the load, matching the interactive
    IncrSmallStrainProblem at 1e-8 and the analytic creep strains."""
    V, law, bcs, f_ext, (E0, E1, TAU, f_max) = _creep_bvp(dim, mat)

    sim = PackedSimulation(
        law, V, bcs, 1, del_t=2.0, f_ext=f_ext,
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-13,
    )
    problem = IncrSmallStrainProblem(law, V, bcs, 1, del_t=2.0)
    problem.f_ext = problem.f_ext + f_ext

    stress, strain, viscostrain = [], [], []

    def observe():
        stress.append(float(np.asarray(sim.stress).max()))
        strain.append(float(np.asarray(sim.histories[0]["strain"]).max()))
        viscostrain.append(
            float(np.asarray(sim.histories[0]["strain_visco"]).max())
        )

    sim.del_t = 1e-8  # elastic instant response
    problem._del_t = 1e-8
    _, conv = sim.solve()
    assert conv
    problem.solve()
    problem.update()
    observe()

    sim.del_t = 2.0
    problem._del_t = 2.0
    while sim.time < 20 * TAU:
        n, converged = sim.solve()
        assert converged
        _, conv_p = problem.solve()
        assert conv_p
        problem.update()
        observe()

    np.testing.assert_allclose(
        np.asarray(sim.u), np.asarray(problem.u), rtol=0, atol=1e-8
    )
    if mat is SpringKelvinModel:
        strain_0_ana = f_max / E0
        strain_final_ana = f_max / E0 + f_max / E1
    else:
        strain_0_ana = f_max / (E0 + E1)
        strain_final_ana = f_max / E0
    assert abs(strain[0] - strain_0_ana) < 1e-8
    assert abs(strain[-1] - strain_final_ana) < 1e-8
    assert abs(stress[0] - f_max) < 1e-8
    assert np.sum(np.diff(stress)) < 1e-8
    assert abs(viscostrain[0]) < 1e-8
    assert viscostrain[-1] > 0


@pytest.mark.slow
def test_solve_schedule_f_ext_scales():
    """solve_schedule with per-step external-load scales matches sequential
    solve() calls that mutate sim.f_ext (traction ramp), for both the [K]
    scalar-scale and the [K, ndofs] full-vector forms."""
    V, law, bcs, f_ext, _ = _creep_bvp(3, SpringKelvinModel)
    K = 4
    scales = np.linspace(0.25, 1.0, K)

    sim_seq = PackedSimulation(SpringKelvinModel(
        {"E0": 42.0, "E1": 10.0, "tau": 10.0, "nu": 0.2}, Constraint.FULL
    ), V, bcs, 1, del_t=2.0, newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-13)
    for s in scales:
        sim_seq.f_ext = jnp.asarray(s * f_ext, sim_seq.state.u.dtype)
        _, conv = sim_seq.solve()
        assert conv

    from fenics_constitutive_tpu.fem.bcs import combine_bcs

    n_bc = len(combine_bcs(bcs)[0])
    bc_vals = np.zeros((K, n_bc))

    def fresh():
        return PackedSimulation(SpringKelvinModel(
            {"E0": 42.0, "E1": 10.0, "tau": 10.0, "nu": 0.2}, Constraint.FULL
        ), V, bcs, 1, del_t=2.0, f_ext=f_ext,
            newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-13)

    sim_sc = fresh()
    stats = sim_sc.solve_schedule(bc_vals, f_ext_scales=scales)
    assert stats["converged"].all(), stats
    np.testing.assert_allclose(
        np.asarray(sim_sc.u), np.asarray(sim_seq.u), rtol=1e-10, atol=1e-13
    )

    sim_full = fresh()
    stats = sim_full.solve_schedule(
        bc_vals, f_ext_scales=scales[:, None] * np.asarray(f_ext)[None, :]
    )
    assert stats["converged"].all(), stats
    np.testing.assert_allclose(
        np.asarray(sim_full.u), np.asarray(sim_seq.u), rtol=1e-10, atol=1e-13
    )


import jax.numpy as jnp  # noqa: E402


def _fragile_elasticity(threshold):
    """Linear elasticity whose local 'return map' fails (NaN-poisons) when a
    strain increment exceeds ``threshold`` — the behavior of real UMATs with
    internal iteration caps. Step-size-limited local convergence is exactly
    the failure mode adaptive substepping exists for (the reference instead
    hard-errors: RuntimeError / panic, SURVEY §5.3)."""
    import jax.numpy as jnp

    from fenics_constitutive_tpu.models import LinearElasticityModel
    from fenics_constitutive_tpu.models.interfaces import register_model
    from fenics_constitutive_tpu.ops.mandel import Constraint

    @register_model
    class FragileElasticity(LinearElasticityModel):
        def evaluate(self, t, del_t, grad_del_u, stress, history):
            s_new, tg, h = super().evaluate(t, del_t, grad_del_u, stress, history)
            too_big = jnp.max(jnp.abs(grad_del_u)) > threshold
            s_new = jnp.where(too_big, jnp.nan, s_new)
            return s_new, tg, h

        def evaluate_packed(self, t, del_t, eps, stress, history):
            # the production engines call the fused SoA kernel; poison there
            s_new, tg, h = super().evaluate_packed(t, del_t, eps, stress, history)
            too_big = jnp.max(jnp.abs(eps)) > threshold
            s_new = jnp.where(too_big, jnp.nan, s_new)
            return s_new, tg, h

    return FragileElasticity({"E": 100000.0, "nu": 0.3}, Constraint.FULL)


def test_adaptive_substepping_recovers_failed_step():
    """A step whose local return map NaN-poisons succeeds when the driver is
    allowed to subdivide the load increment."""
    V, bcs, bc_move = setup()
    law = _fragile_elasticity(0.02)
    sim = PackedSimulation(law, V, bcs, 2, max_subdivisions=4)
    # NOTE on the threshold: the first Newton iterate lifts the BC increment
    # into the boundary cell layer (strain ~ disp/h with h=0.25), so the full
    # 0.05 step sees ~0.2 local strain; 16 substeps bring it under 0.02.
    bc_move.value = 0.05
    niter, converged = sim.solve()
    assert converged
    np.testing.assert_allclose(sim.time, sim.del_t, rtol=1e-12)
    sig_xx = np.asarray(sim.stress)[..., 0]
    assert np.isfinite(sig_xx).all() and sig_xx.mean() > 0

    # without substepping the same step fails and restores nothing is needed:
    V, bcs, bc_move = setup()
    sim_plain = PackedSimulation(_fragile_elasticity(0.02), V, bcs, 2)
    bc_move.value = 0.05
    niter, converged = sim_plain.solve()
    assert not converged


def test_substepping_restores_state_on_total_failure():
    """If even the finest subdivision fails, the committed state is intact."""
    V, bcs, bc_move = setup()
    law = _fragile_elasticity(1e-5)  # hopeless at any subdivision level
    sim = PackedSimulation(law, V, bcs, 2, max_subdivisions=2)
    bc_move.value = 0.05
    u_before = np.asarray(sim.state.u).copy()
    t_before = sim.time
    niter, converged = sim.solve()
    assert not converged
    np.testing.assert_array_equal(np.asarray(sim.state.u), u_before)
    assert sim.time == t_before


@pytest.mark.slow
def test_eval_impl_pallas_and_mg_options():
    """eval_impl='pallas' (interpret mode off-TPU) and mg_options overrides
    plumb through PackedSimulation to the same solution as the defaults."""
    V, bcs, bc_move = setup()
    sim_p = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2, preconditioner="vcycle",
        eval_impl="pallas",
        mg_options={"nu": 2, "nu_coarse": 2, "coarse_direct": False},
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )
    sim_c = PackedSimulation(
        VonMises3D(MAT), V, bcs, 2, preconditioner="vcycle",
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
    )
    for k in (1, 2):
        bc_move.value = 0.004 * k
        _, conv_p = sim_p.solve()
        _, conv_c = sim_c.solve()
        assert conv_p and conv_c
    np.testing.assert_allclose(
        np.asarray(sim_p.u), np.asarray(sim_c.u), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        sim_p.stress, sim_c.stress, rtol=1e-6, atol=1e-8
    )


def test_adaptive_substepping_ramps_f_ext_from_zero():
    """A failing FIRST load step with a ctor-supplied traction must ramp the
    EXTERNAL load from the committed (zero-load) state during substep
    retries, exactly like BC values ramp from state0.u — not re-apply the
    full traction at every substep (review fix r3)."""
    V, _bcs, _bc_move = setup()
    # symmetry planes only: the x=1 face must stay traction-loaded (free)
    close = lambda a, v: (lambda x: np.isclose(x[:, a], v))  # noqa: E731
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    law = _fragile_elasticity(0.02)
    from fenics_constitutive_tpu.fem.facets import (
        assemble_facet_traction,
        locate_boundary_facets,
    )

    facets = locate_boundary_facets(V.mesh, close(0, 1.0))
    # a traction big enough that the FULL first step NaN-poisons the fragile
    # law, but whose halved/quartered substeps stay under the threshold
    f_ext = assemble_facet_traction(V, facets, np.array([4000.0, 0.0, 0.0]))
    sim = PackedSimulation(
        law, V, bcs, 2, f_ext=f_ext, max_subdivisions=4,
    )
    niter, converged = sim.solve()
    assert converged, "substepping must rescue the load-driven first step"
    sig_xx = np.asarray(sim.stress)[..., 0]
    assert np.isfinite(sig_xx).all() and sig_xx.mean() > 0

    # control: without substepping the same step fails outright
    sim2 = PackedSimulation(law, V, bcs, 2, f_ext=f_ext, max_subdivisions=0)
    _, converged2 = sim2.solve()
    assert not converged2


def test_multimaterial_grid_major_matches_aos():
    """Multi-law PackedSimulation runs the GRID-MAJOR shared-stencil loop
    (make_packed_step eval_assemble_gm_all / multi_matvec_gm) with the
    whole-grid V-cycle — and must match the AoS interactive engine. The
    engine-parity tests go through IncrSmallStrainProblem's node-major
    loop; THIS pins the production multi-law fast path itself."""
    V, bcs, bc_move = setup()
    mid = V.mesh.cell_midpoints()
    cells_l = np.flatnonzero(mid[:, 0] < 0.5).astype(np.int32)
    cells_r = np.flatnonzero(mid[:, 0] >= 0.5).astype(np.int32)

    def laws():
        from fenics_constitutive_tpu.models import (
            Constraint,
            LinearElasticityModel,
        )

        return [
            (LinearElasticityModel({"E": 60000.0, "nu": 0.3}, Constraint.FULL),
             cells_l),
            (VonMises3D({"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 300.0,
                         "p_y00": 800.0, "p_w": 200.0}), cells_r),
        ]

    sim = PackedSimulation(
        laws(), V, bcs, 2, preconditioner="vcycle",
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-13,
    )
    # the production fast path actually engaged
    assert all(hasattr(g, "matvec_gm") for g in sim._geos)
    assert len(sim._geos) == 2

    prob = IncrSmallStrainProblem(laws(), V, bcs, 2, engine="aos")
    for k in (1, 2):
        bc_move.value = 0.004 * k
        n_s, c_s = sim.solve()
        assert c_s
        n_p, c_p = prob.solve()
        assert c_p
        prob.update()

    np.testing.assert_allclose(
        np.asarray(sim.u), np.asarray(prob.u), rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sim.stress), np.asarray(prob.stress_0), rtol=1e-8, atol=1e-7
    )
    # plasticity happened on the Mises half
    a = np.asarray(sim.histories[1]["alpha"])
    assert a.max() > 0


def test_schedule_amg_gather_unrolled_fallback(monkeypatch):
    """The TPU backend faults on lax.scan over the gather-path step with an
    AMG operand (scripts/repro_scan_amg_fault.py); solve_schedule must
    detect the configuration and run the statically unrolled chain — with
    identical results to the scan."""
    import jax

    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.models import VonMises3D

    from fenics_constitutive_tpu.fem.mesh import Mesh

    box = unit_cube_mesh(3, 3, 3, "tetra")
    mesh = Mesh(box.nodes, box.cells, "tetra")  # general path: no box metadata
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    def build():
        bcs = [
            DirichletBC(
                V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0
            ),
            DirichletBC(
                V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
            ),
            DirichletBC(
                V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0
            ),
            DirichletBC(
                V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0
            ),
        ]
        law = VonMises3D(
            {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
             "p_y00": 2500.0, "p_w": 200.0}
        )
        return PackedSimulation(
            law, V, bcs, 2, preconditioner="amg", engine="gather",
            newton_rtol=1e-8, newton_atol=1e-8,
        )

    n_bc = len(combine_bcs(build().bcs)[0])
    ramp = np.zeros((3, n_bc))
    # drive the x=1 face (second BC's dofs sit after the first BC's)
    sim_scan = build()
    assert sim_scan._scan_unsafe  # the faulting configuration is detected
    move = slice(n_bc // 4, n_bc // 2)  # second BC block
    for k in range(3):
        ramp[k, move] = 0.004 * (k + 1)
    stats_scan = sim_scan.solve_schedule(ramp)
    assert bool(stats_scan["converged"].all())

    sim_unroll = build()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    stats_unroll = sim_unroll.solve_schedule(ramp)
    np.testing.assert_allclose(
        np.asarray(sim_unroll.u), np.asarray(sim_scan.u), rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(
        stats_unroll["r_norm"], stats_scan["r_norm"], rtol=1e-10
    )
