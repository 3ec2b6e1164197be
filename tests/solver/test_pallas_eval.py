"""Fused Pallas eval+assembly kernel vs the XLA path (interpret on CPU).

The kernel implements the identical radial-return update rule (same masking
and trip cap as packed_models), so residual, stress, tangent fields and
history must agree to rounding from a genuinely plastic state.
"""

import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import Constraint, VonMises3D
from fenics_constitutive_tpu.models import packed_models  # noqa: F401
from fenics_constitutive_tpu.ops.pallas_eval import build_pallas_eval
from fenics_constitutive_tpu.ops.structured import build_structured_geometry
import pytest

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


@pytest.mark.slow
def test_pallas_eval_matches_xla():
    mesh = unit_cube_mesh(6, 6, 6, "hex")
    V = FunctionSpace(mesh, 1, 3)
    geo = build_structured_geometry(V, 2, Constraint.FULL)
    law = VonMises3D(MAT)

    rng = np.random.default_rng(0)
    # a plastic pre-state: run one eval from zero with a large strain, use
    # its committed outputs as the base state for the comparison step
    u1 = jnp.asarray(rng.normal(size=V.ndofs) * 6e-3)
    hist0 = {
        "eps_n": jnp.zeros(geo.qp_shape(6)),
        "alpha": jnp.zeros(geo.qp_shape(1)),
    }
    sig0 = jnp.zeros(geo.qp_shape(6))
    eps1 = geo.strain(u1)
    sig1, _, hist1 = law.evaluate_packed(0.0, 1.0, eps1, sig0, hist0)
    assert float(hist1["alpha"].max()) > 0.0  # genuinely plastic

    du = jnp.asarray(rng.normal(size=V.ndofs) * 2e-3)
    du_gm = geo.to_grid_major(du)

    # XLA path
    eps = geo.strain_gm(du_gm)
    s_ref, tg_ref, h_ref = law.evaluate_packed(0.0, 1.0, eps, sig1, hist1)
    r_ref = geo.residual_gm(s_ref)

    # fused kernel (interpret mode on CPU)
    fused = build_pallas_eval(geo, law)
    F, s_k, (beta, gmm, nf), h_k = fused(du_gm, sig1, hist1)
    r_k = geo._scatter_corners(F).reshape(-1)

    def close(a, b, what):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11 * scale, err_msg=what)

    close(s_k, s_ref, "stress")
    close(r_k, r_ref, "residual")
    close(h_k["eps_n"], h_ref["eps_n"], "eps_n")
    close(h_k["alpha"], h_ref["alpha"], "alpha")
    close(beta, jnp.broadcast_to(tg_ref.beta, beta.shape), "beta")
    close(gmm, jnp.broadcast_to(tg_ref.gamma, gmm.shape), "gamma")
    close(nf, jnp.broadcast_to(tg_ref.n, nf.shape), "n")


@pytest.mark.slow
def test_pallas_eval_step_path():
    """make_packed_step(eval_impl='pallas') solves to the same state."""
    from fenics_constitutive_tpu.fem import DirichletBC
    from fenics_constitutive_tpu.fem.bcs import combine_bcs
    from fenics_constitutive_tpu.solver.packed_step import (
        build_packed_problem,
        make_packed_step,
    )

    mesh = unit_cube_mesh(5, 5, 5, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close_(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close_(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close_(0, 1.0), component=0), 0.01),
        DirichletBC(V.locate_dofs_geometrical(close_(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close_(2, 0.0), component=2), 0.0),
    ]
    law = VonMises3D(MAT)
    geos, models, state = build_packed_problem(V, law, 2)
    bc_dofs, bc_vals = combine_bcs(bcs)
    args = (
        jnp.asarray(bc_dofs),
        jnp.asarray(bc_vals, state.u.dtype),
        jnp.zeros(V.ndofs, state.u.dtype),
        jnp.asarray(1.0, state.u.dtype),
    )
    kw = dict(max_newton=8, newton_rtol=1e-8, newton_atol=1e-8,
              cg_rtol=1e-8, cg_maxiter=300)
    s_conv, st_conv = make_packed_step(geos, **kw)(models, state, *args)
    s_pal, st_pal = make_packed_step(geos, eval_impl="pallas", **kw)(
        models, state, *args
    )
    assert int(st_pal["newton_iters"]) == int(st_conv["newton_iters"])
    np.testing.assert_allclose(
        np.asarray(s_pal.u), np.asarray(s_conv.u), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_pal.stress[0]), np.asarray(s_conv.stress[0]),
        rtol=1e-8, atol=1e-8,
    )
