"""Native (C++) kernel library + UMAT harness tests.

The analog of the reference's Rust-vs-Python parametrized tests
(test_elasticity.py:335, test_plasticity.py:13) and the examples/umat suite:
every native model must match its pure-JAX twin to tight tolerance, and the
foreign models must run inside a jitted solve via pure_callback.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.models import (
    Constraint,
    DruckerPrager3D,
    DruckerPragerHyperbolic3D,
    LinearElasticityModel,
    MisesPlasticityLinearHardening3D,
)
from fenics_constitutive_tpu.native import (
    NativeModel,
    UmatModel,
    ensure_built,
    umat_demo_path,
)

MU, KAPPA = 80769.0, 175000.0
E = 9.0 * KAPPA * MU / (3.0 * KAPPA + MU)
NU = (3.0 * KAPPA - 2.0 * MU) / (2.0 * (3.0 * KAPPA + MU))


@pytest.fixture(scope="module", autouse=True)
def built():
    ensure_built()


def rand_grad(q, seed=0, scale=2e-3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(q, 3, 3)) * scale)


def test_native_linear_elasticity_matches_jax():
    native = NativeModel("linear_elasticity3d", {"mu": MU, "kappa": KAPPA})
    ref = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    grad = rand_grad(16)
    s0 = jnp.zeros((16, 6))
    s_n, t_n, h_n = native.evaluate(0.0, 1.0, grad, s0, None)
    s_r, t_r, _ = ref.evaluate(0.0, 1.0, grad, s0, None)
    np.testing.assert_allclose(np.asarray(s_n), np.asarray(s_r), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t_n), np.asarray(t_r), rtol=1e-10)
    assert h_n is None


def test_native_mises_matches_jax():
    p = {"mu": MU, "kappa": KAPPA, "y_0": 1200.0, "h": 200.0}
    native = NativeModel("mises_linear_hardening3d", p)
    ref = MisesPlasticityLinearHardening3D(p)
    grad = rand_grad(8, scale=5e-3)  # mixed elastic/plastic
    s0 = jnp.zeros((8, 6))
    s_n, t_n, h_n = native.evaluate(0.0, 1.0, grad, s0, native.init_history(8))
    s_r, t_r, h_r = ref.evaluate(0.0, 1.0, grad, s0, ref.init_history(8))
    np.testing.assert_allclose(np.asarray(s_n), np.asarray(s_r), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(t_n), np.asarray(t_r), rtol=1e-9, atol=1e-6
    )
    # flat history [alpha, eps_p x6] vs named dict (lib.rs:130-136 layout)
    np.testing.assert_allclose(
        np.asarray(h_n["history"][:, 0:1]), np.asarray(h_r["alpha"]), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(h_n["history"][:, 1:7]),
        np.asarray(h_r["plastic_strain"]),
        rtol=1e-9,
        atol=1e-12,
    )


@pytest.mark.parametrize(
    ("name", "jax_cls", "params"),
    [
        (
            "drucker_prager3d",
            DruckerPrager3D,
            {"mu": MU, "kappa": KAPPA, "a": 1000.0, "b": 0.2, "b_flow": 0.2},
        ),
        (
            "drucker_prager_hyperbolic3d",
            DruckerPragerHyperbolic3D,
            {"mu": MU, "kappa": KAPPA, "a": 1000.0, "b": 0.2, "d": 50.0,
             "b_flow": 0.2},
        ),
    ],
)
def test_native_drucker_prager_matches_jax(name, jax_cls, params):
    native = NativeModel(name, params)
    ref = jax_cls(params)
    grad = jnp.zeros((3, 3, 3)).at[:, 0, 0].set(0.005).at[:, 0, 1].set(0.006)
    s0 = jnp.zeros((3, 6))
    s_n, t_n, h_n = native.evaluate(0.0, 1.0, grad, s0, native.init_history(3))
    s_r, t_r, h_r = ref.evaluate(0.0, 1.0, grad, s0, ref.init_history(3))
    np.testing.assert_allclose(np.asarray(s_n), np.asarray(s_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t_n), np.asarray(t_r), rtol=1e-4, atol=1.0
    )
    np.testing.assert_allclose(
        np.asarray(h_n["history"][:, 0:1]), np.asarray(h_r["alpha"]), rtol=1e-6
    )


def test_native_model_in_jitted_solve():
    """pure_callback path composes with the jitted residual evaluation."""
    from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

    mesh = unit_cube_mesh(1, 1, 1, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    law = NativeModel(
        "mises_linear_hardening3d",
        {"mu": MU, "kappa": KAPPA, "y_0": 1200.0, "h": 200.0},
    )
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0),
                                              component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0),
                                              component=0), 0.02),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 1], 0.0),
                                              component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 2], 0.0),
                                              component=2), 0.0),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, 1)
    n, converged = problem.solve()
    assert converged
    problem.update()
    assert float(jnp.max(problem._history_0[0]["history"][:, 0])) > 0  # plastic


def test_umat_linear_elastic_matches_jax():
    """The dlopen'd UMAT (C, Fortran ABI) == pure-JAX linear elasticity,
    incl. the Mandel<->Voigt and tangent conversions (examples/umat parity)."""
    law_umat = UmatModel(str(umat_demo_path()), [E, NU], n_statev=1)
    ref = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    grad = rand_grad(5, seed=3)
    s0 = jnp.zeros((5, 6))
    s_u, t_u, h_u = law_umat.evaluate(
        0.0, 1.0, grad, s0, law_umat.init_history(5)
    )
    s_r, t_r, _ = ref.evaluate(0.0, 1.0, grad, s0, None)
    np.testing.assert_allclose(np.asarray(s_u), np.asarray(s_r), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t_u), np.asarray(t_r), rtol=1e-10)
    # total strain history maintained (reference umat_stran semantics)
    eps = np.asarray(
        jnp.asarray(
            __import__("fenics_constitutive_tpu").ops.strain_from_grad_u(
                grad, Constraint.FULL
            )
        )
    )
    np.testing.assert_allclose(np.asarray(h_u["strain"]), eps, rtol=1e-12)
    # second increment accumulates
    s_u2, _, h_u2 = law_umat.evaluate(1.0, 1.0, grad, s_u, h_u)
    np.testing.assert_allclose(np.asarray(s_u2), 2 * np.asarray(s_r), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(h_u2["strain"]), 2 * eps, rtol=1e-12)


def test_umat_in_bvp_solve():
    """UMAT-driven uniaxial stress bar reproduces E * strain."""
    from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

    mesh = unit_cube_mesh(1, 1, 1, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    law = UmatModel(str(umat_demo_path()), [E, NU], n_statev=1)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0),
                                              component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0),
                                              component=0), 0.01),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 1], 0.0),
                                              component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 2], 0.0),
                                              component=2), 0.0),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, 1)
    n, converged = problem.solve()
    assert converged
    problem.update()
    # uniaxial strain state: sigma_xx = (lam + 2 mu) * 0.01 ... but free lateral
    # faces here -> just sanity-check against an equivalent pure-JAX solve
    ref_problem = IncrSmallStrainProblem(
        LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL), V, bcs, 1
    )
    ref_problem.solve()
    ref_problem.update()
    np.testing.assert_allclose(
        np.asarray(problem.u), np.asarray(ref_problem.u), rtol=1e-9, atol=1e-14
    )


def test_native_divergence_poisons_per_qp():
    """A QP whose return map diverges comes back NaN; healthy QPs untouched.

    ADVICE r1 (low): finite-but-unconverged native stresses must not pass
    silently. models.cpp poison_qp gives per-QP granularity: only the failing
    QP is NaN, so the solver's diverged_mask localizes the failure.
    """
    m = NativeModel(
        "drucker_prager3d",
        {"mu": 80.0, "kappa": 175.0, "a": 0.1, "b": 0.9, "b_flow": 0.9},
    )
    q = 4
    # QP0: absurd hydrostatic tension far beyond the cone apex -> divergence;
    # QP1: mild elastic strain; QP2/3: zero strain.
    grad = (
        jnp.zeros((q, 3, 3))
        .at[0, 0, 0].set(50.0).at[0, 1, 1].set(50.0).at[0, 2, 2].set(50.0)
        .at[1, 0, 0].set(1e-5)
    )
    s, _, _ = m.evaluate(
        0.0, 1.0, grad, jnp.zeros((q, 6)), {"history": jnp.zeros((q, 7))}
    )
    s = np.asarray(s)
    assert np.isnan(s[0]).all(), "diverged QP must be NaN-poisoned"
    assert np.isfinite(s[1:]).all(), "healthy QPs must be untouched"


def test_native_callback_does_not_mutate_operands():
    """pure_callback operands are JAX-owned; the C kernels must write copies.

    Feeds the same committed stress array through evaluate twice — if the
    host bridge aliased the operand (ADVICE r1, medium), the second call
    would see a doubly-incremented stress.
    """
    native = NativeModel("linear_elasticity3d", {"mu": MU, "kappa": KAPPA})
    grad = rand_grad(8, seed=3)
    s0 = jnp.asarray(np.random.default_rng(4).normal(size=(8, 6)))
    s_a, _, _ = native.evaluate(0.0, 1.0, grad, s0, None)
    s_b, _, _ = native.evaluate(0.0, 1.0, grad, s0, None)
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    # and the operand itself is unchanged
    assert float(jnp.linalg.norm(s0 - jnp.asarray(np.asarray(s0)))) == 0.0


def test_umat_real_fortran_payload():
    """Pin UmatModel against a REAL gfortran-compiled UMAT
    (native/umat/umat_linear_elastic.f; reference ships + CMake-compiles its
    Fortran twin, /root/reference/examples/umat/umat_linear_elastic.f:1-44).
    Exercises actual Fortran codegen: column-major DDSDDE writes and the
    hidden CHARACTER-length trailing argument (umat_harness.cpp passes it).
    Skipped when the machine has no Fortran compiler (this image has none;
    CI/user machines with gfortran run it)."""
    from fenics_constitutive_tpu.native import umat_fortran_path

    path = umat_fortran_path()
    if path is None:
        pytest.skip("no Fortran compiler on this machine (optional CMake target)")
    law_f = UmatModel(str(path), [E, NU], n_statev=1)
    ref = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    grad = rand_grad(5, seed=7)
    s0 = jnp.zeros((5, 6))
    h0 = law_f.init_history(5)
    s_f, t_f, h_f = law_f.evaluate(0.0, 1.0, grad, s0, h0)
    s_r, t_r, _ = ref.evaluate(0.0, 1.0, grad, s0, None)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_r), rtol=1e-10)
    # the Fortran source increments STATEV(1) per call: proof the payload ran
    np.testing.assert_allclose(np.asarray(h_f["statev"][:, 0]), 1.0)
