"""Pallas fused matvec vs the conv engine (interpret mode on CPU).

The real-TPU compile/run of the kernel is exercised by bench tooling; here the
kernel's numerics are pinned against the conv-based structured engine in
Pallas interpret mode, with a genuinely plastic (spatially varying) tangent.
"""

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import fenics_constitutive_tpu.ops.pallas_matvec as pm
from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import Constraint, VonMises3D
from fenics_constitutive_tpu.models import packed_models  # noqa: F401
from fenics_constitutive_tpu.ops.structured import build_structured_geometry

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def test_pallas_matvec_matches_conv(monkeypatch):
    mesh = unit_cube_mesh(6, 6, 6, "hex")
    V = FunctionSpace(mesh, 1, 3)
    geo = build_structured_geometry(V, 2, Constraint.FULL)
    law = VonMises3D(MAT)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=V.ndofs) * 5e-3)
    eps = geo.strain(u)
    hist = {
        "eps_n": jnp.zeros(geo.qp_shape(6)),
        "alpha": jnp.zeros(geo.qp_shape(1)),
    }
    _, tg, _ = law.evaluate_packed(0.0, 1.0, eps, jnp.zeros(geo.qp_shape(6)), hist)
    assert float(jnp.max(jnp.abs(tg.gamma))) > 0  # plastic somewhere: n, gamma vary

    orig = pl.pallas_call
    monkeypatch.setattr(
        pm.pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
    )
    mv = pm.build_pallas_matvec(geo)

    v = jnp.asarray(rng.normal(size=V.ndofs))
    r_pallas = np.asarray(mv(geo.to_grid_major(v), tg))
    r_conv = np.asarray(geo.matvec_gm(geo.to_grid_major(v), tg))
    np.testing.assert_allclose(r_pallas, r_conv, rtol=1e-9, atol=1e-9)
