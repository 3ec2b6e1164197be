"""Plug a hand-written C++ material into the solver.

The analog of the reference's docs/custom_models/cpp_elasticity.md workflow:
compile the standalone model (elasticity.cpp), wrap its flat-array entry point
into the IncrSmallStrainModel protocol with jax.pure_callback, and solve a BVP
with it. Run:  python examples/elasticity_cpp/run_example.py
"""

from __future__ import annotations

# allow running from a plain checkout: put the repo root on sys.path when
# the package is not installed (the reference's examples are instead built
# against an installed fenics_constitutive; we stay dependency-free)
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import ctypes
import pathlib
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import Constraint
from fenics_constitutive_tpu.models.interfaces import (
    IncrSmallStrainModel,
    register_model,
)
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

HERE = pathlib.Path(__file__).resolve().parent


def build() -> pathlib.Path:
    so = HERE / "libelasticity_example.so"
    if not so.exists():
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(so),
             str(HERE / "elasticity.cpp")],
            check=True,
        )
    return so


@register_model(param_fields=("params",))
class CppElasticity3D(IncrSmallStrainModel):
    """Duck-typed wrapper: flat-array C++ entry point -> model protocol."""

    def __init__(self, parameters: dict[str, float]):
        self.params = jnp.asarray([parameters["E"], parameters["nu"]])
        self._so = str(build())

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self):
        return None

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        q = grad_del_u.shape[0]
        so = self._so

        def host(params, t_, dt_, grad, sig):
            lib = ctypes.CDLL(so)
            dp = ctypes.POINTER(ctypes.c_double)
            lib.example_evaluate.argtypes = [
                ctypes.c_double, ctypes.c_double, dp, dp, dp, dp,
                ctypes.c_long, dp,
            ]
            # explicit copies: pure_callback operands may be read-only
            # JAX-owned buffers; the C side writes through raw pointers
            grad = np.array(grad, np.float64).reshape(-1)
            sig = np.array(sig, np.float64).reshape(-1)
            tangent = np.zeros(q * 36)
            params = np.ascontiguousarray(params, np.float64)
            c = lambda a: a.ctypes.data_as(dp)
            lib.example_evaluate(
                float(t_), float(dt_), c(grad), c(sig), c(tangent), None, q,
                c(params),
            )
            dt = np.dtype(stress.dtype.name)
            return sig.reshape(q, 6).astype(dt), tangent.reshape(q, 6, 6).astype(dt)

        out = (
            jax.ShapeDtypeStruct((q, 6), stress.dtype),
            jax.ShapeDtypeStruct((q, 6, 6), stress.dtype),
        )
        s_new, tangent = jax.pure_callback(
            host, out, self.params, t, del_t, grad_del_u, stress
        )
        return s_new, tangent, history


def main():
    mesh = unit_cube_mesh(2, 2, 2, "tetra")
    V = FunctionSpace(mesh, 1, 3)
    law = CppElasticity3D({"E": 42.0, "nu": 0.3})
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)),
            np.zeros(3),
        ),
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)),
            np.array([0.01, 0.0, 0.0]),
        ),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, 1)
    n, converged = problem.solve()
    problem.update()
    print(f"converged={converged} in {n} iterations")
    print("max |u| =", float(jnp.abs(problem.u).max()))
    print("mean sigma_xx =", float(problem.stress_0[..., 0].mean()))


if __name__ == "__main__":
    # foreign-language models run host-side (pure_callback); remote-TPU
    # tunnel backends don't support host callbacks, so pin the cpu platform
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    main()
