"""Plug a standalone, history-bearing C material into the solver.

The analog of the reference's SECOND standalone foreign-language plug-in
(examples/elasticity_rs + docs/custom_models/rust_elasticity.md:87-115):
a material written completely outside the framework — plain C99, no
dependency on native/ — wrapped into the IncrSmallStrainModel protocol with
jax.pure_callback, including the history contract (plastic strain + alpha).

Run:  python examples/mises_c/run_example.py
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
    so = HERE / "libmises_c.so"
    if not so.exists():
        subprocess.run(
            [
                "gcc", "-std=c99", "-O2", "-shared", "-fPIC",
                "-o", str(so), str(HERE / "mises.c"), "-lm",
            ],
            check=True,
        )
    return so


@register_model(param_fields=("params",))
class MisesC3D(IncrSmallStrainModel):
    """Duck-typed wrapper: the C entry point -> model protocol (with history)."""

    def __init__(self, parameters: dict[str, float]):
        self.params = jnp.asarray(
            [parameters["mu"], parameters["kappa"], parameters["y_0"],
             parameters["h"]]
        )
        self._so = str(build())

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self):
        # same flat layout the reference's Rust models use
        # (bindings/src/lib.rs:130-136: {"history": 7})
        return {"history": 7}

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        q = grad_del_u.shape[0]
        so = self._so

        def host(params, t_, dt_, grad, sig, hist):
            lib = ctypes.CDLL(so)
            dp = ctypes.POINTER(ctypes.c_double)
            lib.mises_c_evaluate.argtypes = [
                ctypes.c_double, ctypes.c_double, dp, dp, dp, dp,
                ctypes.c_long, dp,
            ]
            # explicit copies: pure_callback operands may be read-only
            # JAX-owned buffers; the C side writes through raw pointers
            grad = np.array(grad, np.float64).reshape(-1)
            sig = np.array(sig, np.float64).reshape(-1)
            hist = np.array(hist, np.float64).reshape(-1)
            tangent = np.zeros(q * 36)
            params = np.array(params, np.float64)
            c = lambda a: a.ctypes.data_as(dp)
            lib.mises_c_evaluate(
                float(t_), float(dt_), c(grad), c(sig), c(tangent), c(hist),
                q, c(params),
            )
            out_t = np.dtype(stress.dtype.name)
            return (
                sig.reshape(q, 6).astype(out_t),
                tangent.reshape(q, 6, 6).astype(out_t),
                hist.reshape(q, 7).astype(out_t),
            )

        out = (
            jax.ShapeDtypeStruct((q, 6), stress.dtype),
            jax.ShapeDtypeStruct((q, 6, 6), stress.dtype),
            jax.ShapeDtypeStruct((q, 7), stress.dtype),
        )
        s_new, tangent, h_new = jax.pure_callback(
            host, out, self.params, t, del_t, grad_del_u, stress,
            history["history"],
        )
        return s_new, tangent, {"history": h_new}


def main():
    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 1, 3)
    law = MisesC3D({"mu": 80769.0, "kappa": 175000.0, "y_0": 250.0, "h": 1000.0})
    move = DirichletBC(
        V.locate_dofs_geometrical(
            lambda x: np.isclose(x[:, 0], 1.0), component=0
        ),
        0.0,
    )
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 0], 0.0), component=0
            ),
            0.0,
        ),
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 1], 0.0), component=1
            ),
            0.0,
        ),
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 2], 0.0), component=2
            ),
            0.0,
        ),
        move,
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=2)
    for disp in np.linspace(0.001, 0.02, 10):
        move.value = float(disp)
        n, converged = problem.solve()
        problem.update()
        alpha = float(problem._history_0[0]["history"][:, 6].max())
        print(
            f"disp={disp:.4f} iters={n} converged={converged} "
            f"sigma_xx={float(problem.stress_0[..., 0].mean()):9.2f} "
            f"alpha_max={alpha:.5f}"
        )


if __name__ == "__main__":
    # foreign-language models run host-side (pure_callback); remote-TPU
    # tunnel backends don't support host callbacks, so pin the cpu platform
    # (must happen before the first backend-initializing jax call)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    main()
