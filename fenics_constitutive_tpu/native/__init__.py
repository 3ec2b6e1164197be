"""Python bindings for the native (C++) kernel library and UMAT harness.

The reference binds its Rust core with pyo3/maturin (bindings/src/lib.rs) and
its C++/Fortran plug-ins with pybind11 (examples/). Here the bridge is ctypes
over a small C API (native/include/comfe.h) — no build-time Python binding
dependency — and the models plug into the JAX solver through
``jax.pure_callback``: the native kernel runs host-side per evaluation (like
every foreign-language model in the reference, which is also host-side), while
assembly/CG stay on device. This is the compatibility path; the pure-JAX
models are the performance path (SURVEY §7 'Foreign-model C++ path on TPU').
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from ..models.interfaces import IncrSmallStrainModel, register_model
from ..ops.mandel import Constraint

__all__ = [
    "ensure_built",
    "load_library",
    "NativeModel",
    "UmatModel",
    "LinearElasticity3D",
]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_LIB = None


def ensure_built(force: bool = False) -> pathlib.Path:
    """Build the native library with cmake/ninja if needed; return the .so path."""
    so = _BUILD_DIR / "libcomfe.so"
    if so.exists() and not force:
        return so
    subprocess.run(
        ["cmake", "-S", str(_NATIVE_DIR), "-B", str(_BUILD_DIR), "-G", "Ninja"],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(_BUILD_DIR)], check=True, capture_output=True
    )
    return so


def umat_demo_path() -> pathlib.Path:
    """Path to the built demo linear-elastic UMAT shared library."""
    ensure_built()
    return _BUILD_DIR / "libumat_linear_elastic.so"


def umat_fortran_path() -> pathlib.Path | None:
    """Path to the REAL Fortran-compiled UMAT, or None if the build machine
    has no Fortran compiler (the CMake target is optional; see
    native/CMakeLists.txt and native/umat/umat_linear_elastic.f)."""
    ensure_built()
    p = _BUILD_DIR / "libumat_fortran_linear_elastic.so"
    return p if p.exists() else None


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(str(ensure_built()))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.comfe_history_size.argtypes = [ctypes.c_char_p]
    lib.comfe_history_size.restype = ctypes.c_int
    lib.comfe_n_params.argtypes = [ctypes.c_char_p]
    lib.comfe_n_params.restype = ctypes.c_int
    lib.comfe_evaluate.argtypes = [
        ctypes.c_char_p, dp, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        dp, dp, dp, dp, ctypes.c_long,
    ]
    lib.comfe_evaluate.restype = ctypes.c_long
    lib.comfe_umat_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.comfe_umat_open.restype = ctypes.c_void_p
    lib.comfe_umat_close.argtypes = [ctypes.c_void_p]
    lib.comfe_umat_evaluate.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
        dp, dp, dp, dp, ctypes.c_int, dp, dp, ctypes.c_int, ctypes.c_long,
    ]
    lib.comfe_umat_evaluate.restype = ctypes.c_int
    _LIB = lib
    return lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


@register_model(param_fields=("params",))
class NativeModel(IncrSmallStrainModel):
    """A model from the native kernel library, FULL constraint.

    The analog of the reference's pyo3-bound Rust models
    (models/rust_models.py:84-161): ``NativeModel("mises_linear_hardening3d",
    {"mu": ..., "kappa": ..., "y_0": ..., "h": ...})``. History is the flat
    ``{"history": h}`` layout of the reference bindings (lib.rs:130-136).
    """

    #: parameter order per model name (must match native/src/models.cpp)
    PARAM_ORDER = {
        "linear_elasticity3d": ("mu", "kappa"),
        "mises_linear_hardening3d": ("mu", "kappa", "y_0", "h"),
        "drucker_prager3d": ("mu", "kappa", "a", "b", "b_flow"),
        "drucker_prager_hyperbolic3d": ("mu", "kappa", "a", "b", "d", "b_flow"),
    }

    def __init__(self, name: str, parameters: dict[str, float]):
        if name not in self.PARAM_ORDER:
            msg = f"unknown native model {name!r}"
            raise ValueError(msg)
        self._name = name
        lib = load_library()
        self._hsize = lib.comfe_history_size(name.encode())
        order = self.PARAM_ORDER[name]
        self.params = jnp.asarray(
            [float(np.asarray(parameters[k]).reshape(())) for k in order]
        )

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self):
        return {"history": self._hsize} if self._hsize else None

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        q = grad_del_u.shape[0]
        hsize = self._hsize
        name = self._name

        def host(params, t_, dt_, grad, sig, hist):
            lib = load_library()
            # np.array copies by default — REQUIRED: pure_callback operands may
            # be read-only JAX-owned buffers and np.ascontiguousarray would
            # alias them, so the C kernels writing through raw pointers would
            # mutate committed solver state (ADVICE r1, medium).
            grad = np.array(grad, dtype=np.float64).reshape(-1)
            sig = np.array(sig, dtype=np.float64).reshape(-1)
            tangent = np.zeros(q * 36)
            hist_arr = (
                np.array(hist, dtype=np.float64).reshape(-1)
                if hsize
                else np.zeros(1)
            )
            params = np.array(params, dtype=np.float64)
            fails = lib.comfe_evaluate(
                name.encode(), _as_c(params), len(params),
                float(t_), float(dt_), _as_c(grad), _as_c(sig),
                _as_c(tangent), _as_c(hist_arr) if hsize else None, q,
            )
            # Divergent QPs are NaN-poisoned per-QP by the C kernel itself
            # (models.cpp poison_qp), so `fails > 0` is already visible in the
            # returned stress; nothing to rewrite host-side.
            out_dtype = np.dtype(dtype.name)
            return (
                sig.reshape(q, 6).astype(out_dtype),
                tangent.reshape(q, 6, 6).astype(out_dtype),
                hist_arr.reshape(q, hsize).astype(out_dtype)
                if hsize
                else np.zeros((q, 0), out_dtype),
            )

        dtype = stress.dtype
        out_shapes = (
            jax.ShapeDtypeStruct((q, 6), dtype),
            jax.ShapeDtypeStruct((q, 6, 6), dtype),
            jax.ShapeDtypeStruct((q, hsize if hsize else 0), dtype),
        )
        hist_in = history["history"] if hsize else jnp.zeros((q, 0), dtype)
        s_new, tangent, h_new = jax.pure_callback(
            host, out_shapes, self.params, t, del_t, grad_del_u, stress, hist_in
        )
        history_new = {"history": h_new} if hsize else None
        return s_new, tangent, history_new


@register_model(param_fields=("props",))
class UmatModel(IncrSmallStrainModel):
    """An Abaqus UMAT driven through the dlopen harness, FULL constraint.

    The analog of the reference's ``Umat3D`` pybind11 template
    (examples/umat/src/main.cpp:60-228). ``n_statev`` is the STATEV size; the
    harness additionally maintains the total Mandel strain as history (the
    reference's ``umat_stran``), so ``history_dim`` is
    ``{"statev": n_statev, "strain": 6}``.
    """

    def __init__(self, so_path: str, props: dict[str, float] | list[float],
                 n_statev: int = 1, symbol: str = "umat_"):
        self._so_path = str(so_path)
        self._symbol = symbol
        self._n_statev = max(int(n_statev), 1)
        if isinstance(props, dict):
            props = list(props.values())
        self.props = jnp.asarray([float(p) for p in props])
        self._handle = None

    def _get_handle(self):
        if self._handle is None:
            lib = load_library()
            h = lib.comfe_umat_open(self._so_path.encode(), self._symbol.encode())
            if not h:
                msg = f"failed to dlopen {self._so_path}:{self._symbol}"
                raise OSError(msg)
            object.__setattr__(self, "_handle", h)
        return self._handle

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self):
        return {"statev": self._n_statev, "strain": 6}

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        q = grad_del_u.shape[0]
        nsv = self._n_statev

        def host(props, t_, dt_, grad, sig, statev, strain_n):
            lib = load_library()
            handle = self._get_handle()
            # explicit copies: callback operands must never be written through
            # (see NativeModel.host above)
            grad = np.array(grad, dtype=np.float64).reshape(-1)
            sig = np.array(sig, dtype=np.float64).reshape(-1)
            statev = np.array(statev, dtype=np.float64).reshape(-1)
            strain_n = np.array(strain_n, dtype=np.float64).reshape(-1)
            tangent = np.zeros(q * 36)
            props = np.array(props, dtype=np.float64)
            rc = lib.comfe_umat_evaluate(
                handle, float(t_), float(dt_), _as_c(grad), _as_c(sig),
                _as_c(tangent), _as_c(statev), nsv, _as_c(strain_n),
                _as_c(props), len(props), q,
            )
            assert rc == 0, f"umat harness failed rc={rc}"
            out_dtype = np.dtype(dtype.name)
            return (
                sig.reshape(q, 6).astype(out_dtype),
                tangent.reshape(q, 6, 6).astype(out_dtype),
                statev.reshape(q, nsv).astype(out_dtype),
                strain_n.reshape(q, 6).astype(out_dtype),
            )

        dtype = stress.dtype
        out_shapes = (
            jax.ShapeDtypeStruct((q, 6), dtype),
            jax.ShapeDtypeStruct((q, 6, 6), dtype),
            jax.ShapeDtypeStruct((q, nsv), dtype),
            jax.ShapeDtypeStruct((q, 6), dtype),
        )
        s_new, tangent, statev, strain_n = jax.pure_callback(
            host, out_shapes, self.props, t, del_t, grad_del_u, stress,
            history["statev"], history["strain"],
        )
        return s_new, tangent, {"statev": statev, "strain": strain_n}


def LinearElasticity3D(parameters: dict) -> NativeModel:
    """Reference-name alias (rust_models.py:84-103): the native linear
    elasticity model, parameters {"mu", "kappa"}."""
    return NativeModel("linear_elasticity3d", parameters)
