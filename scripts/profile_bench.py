"""Micro-profile of the packed engine pieces on the live backend."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fenics_constitutive_tpu.fem import FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.ops.packed import (
    packed_grad,
    packed_jacobi_diag,
    packed_matvec,
    packed_residual,
    packed_strain,
)
from fenics_constitutive_tpu.solver.packed_step import build_packed_problem
from fenics_constitutive_tpu.models import packed_models  # noqa: F401


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:30s} {dt:9.3f} ms")
    return out


def main():
    n = 50
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 1, 3)
    law = VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}
    )
    geos, models, state = build_packed_problem(V, law, q_degree=2)
    geo = geos[0]
    print("uniform:", geo.uniform, "N:", geo.N, "ndofs:", geo.ndofs)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=V.ndofs) * 1e-3, jnp.float32)

    grad = bench("packed_grad", lambda uu: packed_grad(uu, geo), u)
    eps = bench("packed_strain", lambda g: packed_strain(g, geo.constraint), grad)
    sig0 = state.stress[0]
    h0 = state.histories[0]

    s_new, tg, h_new = jax.jit(
        lambda e, s, h: models[0].evaluate_packed(0.0, 1.0, e, s, h)
    )(eps, sig0, h0)
    bench(
        "mises evaluate_packed",
        lambda e, s, h: models[0].evaluate_packed(0.0, 1.0, e, s, h)[0],
        eps, sig0, h0,
    )
    bench("packed_residual", lambda s: packed_residual(s, geo), s_new)
    bench("packed_matvec", lambda v: packed_matvec(v, tg, geo), u)
    bench("packed_jacobi_diag", lambda t: packed_jacobi_diag(t, geo), tg)

    # pure gather test: assembly cost in isolation
    flat = jnp.asarray(rng.normal(size=geo.n_nodes * geo.vs * geo.n_cells + 1), jnp.float32)
    bench("gather_assemble", lambda f: f[geo.gather_idx].sum(axis=1), flat)
    # dof gather
    bench("u_gather", lambda uu: uu[geo.dofmap_t], u)


if __name__ == "__main__":
    main()
