"""Fused Pallas smoothing chains vs the XLA Jacobi chain (interpret on CPU).

The fused kernels implement the exact same damped-Jacobi sweeps, cell masking
and free-dof handling as MultigridPreconditioner's XLA path, so a whole
V-cycle apply must agree to rounding.
"""

import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import Constraint
from fenics_constitutive_tpu.ops.structured import build_structured_geometry
from fenics_constitutive_tpu.solver.multigrid import build_multigrid
import pytest

MU, KAPPA = 80769.0, 175000.0


def _setup(n=6):
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.01),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
    ]
    geo = build_structured_geometry(V, 2, Constraint.FULL)
    bc_dofs, _ = combine_bcs(bcs)
    free = jnp.ones(V.ndofs, bool).at[jnp.asarray(bc_dofs)].set(False)
    return geo, free


@pytest.mark.slow
def test_fused_vcycle_matches_xla():
    geo, free = _setup()
    mg_ref = build_multigrid(geo, MU, KAPPA, free)
    mg_fused = build_multigrid(geo, MU, KAPPA, free, fused_smoothing=True)
    assert mg_fused.fused is not None

    rng = np.random.default_rng(3)
    r = geo.to_grid_major(jnp.asarray(rng.normal(size=geo.ndofs)))
    z_ref = np.asarray(mg_ref(r))
    z_fused = np.asarray(mg_fused(r))
    scale = np.abs(z_ref).max()
    np.testing.assert_allclose(z_fused, z_ref, rtol=1e-10, atol=1e-12 * scale)


def test_fused_vcycle_coarse_direct_and_nu():
    geo, free = _setup()
    kw = dict(nu=3, nu_coarse=1, coarse_direct=True)
    mg_ref = build_multigrid(geo, MU, KAPPA, free, **kw)
    mg_fused = build_multigrid(geo, MU, KAPPA, free, fused_smoothing=True, **kw)

    rng = np.random.default_rng(7)
    r = geo.to_grid_major(jnp.asarray(rng.normal(size=geo.ndofs)))
    z_ref = np.asarray(mg_ref(r))
    z_fused = np.asarray(mg_fused(r))
    scale = np.abs(z_ref).max()
    np.testing.assert_allclose(z_fused, z_ref, rtol=1e-10, atol=1e-12 * scale)


def test_with_moduli_drops_fused():
    geo, free = _setup(4)
    mg = build_multigrid(geo, MU, KAPPA, free, fused_smoothing=True)
    assert mg.with_moduli(MU, KAPPA).fused is None
