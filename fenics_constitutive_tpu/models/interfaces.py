"""The constitutive-model protocol: a pure-functional, QP-batched redesign of the
reference's mutate-in-place numpy interface.

Reference contract (/root/reference/src/fenics_constitutive/models/interfaces.py:76-144):
``evaluate(t, del_t, grad_del_u, stress, tangent, history) -> None`` mutating flat
numpy arrays. Here the same information flows functionally so models jit/vmap/grad
cleanly and shard with GSPMD:

    evaluate(t, del_t, grad_del_u[Q,g,g], stress[Q,s], history) ->
        (stress[Q,s], tangent[Q,s,s], history)

* ``stress`` in/out is Mandel notation (shear x sqrt2).
* ``history`` is a dict[str, Array[Q, h]] pytree (or None for history-free models),
  double-buffering is the caller's concern: the committed state is simply whichever
  pytree you keep (the analog of history_0/history_1 in the reference's _history.py).
* Models ARE pytrees: material parameters are leaves, so a jitted solver step does
  not retrace when parameters change.
"""

from __future__ import annotations

import abc
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.mandel import Constraint

__all__ = [
    "IncrSmallStrainModel",
    "Constraint",
    "register_model",
    "rotate_history",
]

Array = jnp.ndarray
History = dict[str, Array] | None


class IncrSmallStrainModel(abc.ABC):
    """Base class for incremental small strain models (functional protocol)."""

    @abc.abstractmethod
    def evaluate(
        self,
        t: Array | float,
        del_t: Array | float,
        grad_del_u: Array,
        stress: Array,
        history: History,
    ) -> tuple[Array, Array, History]:
        r"""Evaluate the model over a batch of quadrature points.

        Args:
            t: global time :math:`t_n` at the start of the increment.
            del_t: time increment :math:`\Delta t`.
            grad_del_u: ``[Q, g, g]`` gradients of the displacement increment
                :math:`\nabla\delta u` with :math:`\delta u = u_{n+1}-u_n`,
                layout ``grad[i, j] = d(delta u_j)/dx_i`` (nabla_grad convention,
                matching the flat layout the reference feeds its models).
            stress: ``[Q, s]`` Mandel stress at :math:`t_n` (committed state).
            history: committed history pytree or None.

        Returns:
            ``(stress_new, tangent, history_new)`` with ``tangent`` of shape
            ``[Q, s, s]`` algorithmically consistent with the stress update.
        """

    @property
    @abc.abstractmethod
    def constraint(self) -> Constraint: ...

    @property
    def stress_strain_dim(self) -> int:
        return self.constraint.stress_strain_dim

    @property
    def geometric_dim(self) -> int:
        return self.constraint.geometric_dim

    @property
    @abc.abstractmethod
    def history_dim(self) -> dict[str, int | tuple[int, int]] | None:
        """Name -> per-QP shape of each history variable: an int for vector-
        valued entries, a ``(rows, cols)`` tuple for matrix-valued ones —
        matching the reference contract (interfaces.py:134-144)."""

    @property
    def rotatable_history(self) -> frozenset[str]:
        """Names of history entries attached to the material frame.

        The analog of the reference's ``QDim::RotatableVector`` /
        ``RotatableMatrix`` markers
        (/root/reference/comfe-rs/src/interfaces.rs:39-67): entries declared
        here must co-rotate with the material under a rotation increment
        (objective rates / large-rotation stepping). Apply the rotation with
        :func:`rotate_history`. Default: nothing rotates (the reference never
        exercises rotation either; small-strain models are frame-fixed).
        """
        return frozenset()

    def init_history(self, n_qp: int, dtype=jnp.float64) -> History:
        """Allocate zero-initialized history arrays for ``n_qp`` quadrature points."""
        hd = self.history_dim
        if hd is None:
            return None
        # Vector entries are [Q, dim] (dim >= 1): one consistent layout for
        # solver storage, checkpointing, and sharding (the reference's flat
        # per-QP vectors are this layout raveled). Matrix entries (rows, cols)
        # are [Q, rows, cols].
        return {
            name: jnp.zeros(
                (n_qp, dim) if isinstance(dim, int) else (n_qp, *dim),
                dtype=dtype,
            )
            for name, dim in hd.items()
        }

    def evaluate_packed(self, t, del_t, eps, stress, history):
        """Generic SoA adapter: run ANY model on the packed/structured engines.

        The production engines call ``evaluate_packed(t, dt, eps[s, *qp],
        stress[s, *qp], history {k: [d, *qp]})``; the hot models override this
        with fused SoA kernels returning factored tangents. This default makes
        every other model (Drucker-Prager, native/UMAT, user models) work on
        the production path — the analog of the reference solver accepting any
        law (/root/reference/src/fenics_constitutive/solver/_solver.py:54-73) —
        by reshaping to the AoS ``evaluate`` contract and wrapping the dense
        tangent.

        The displacement-gradient increment handed to ``evaluate`` is the
        SYMMETRIC tensor reconstructed from the Mandel strain increment
        (``mandel_to_matrix``); small-strain models only read the symmetric
        part, so this is exact for every IncrSmallStrainModel.
        """
        import numpy as _np

        from ..ops import mandel as _mandel
        from ..ops.packed import DenseTangent

        c = self.constraint
        s = c.stress_strain_dim
        qp_shape = eps.shape[1:]
        n = int(_np.prod(qp_shape))
        eps_aos = eps.reshape(s, n).T
        grad = _mandel.mandel_to_matrix(eps_aos, c)
        stress_aos = stress.reshape(s, n).T
        hd = self.history_dim or {}

        def unpack(k, v):  # packed [flat, *qp] -> AoS [n, *entry_shape]
            dim = hd[k]
            aos = v.reshape(v.shape[0], n).T
            return aos if isinstance(dim, int) else aos.reshape(n, *dim)

        def pack(v):  # AoS [n, *entry_shape] -> packed [flat, *qp]
            flat = v.reshape(n, -1)
            return flat.T.reshape(flat.shape[1], *qp_shape)

        hist_aos = (
            None
            if history is None
            else {k: unpack(k, v) for k, v in history.items()}
        )
        s_new, tg, h_new = self.evaluate(t, del_t, grad, stress_aos, hist_aos)
        s_out = s_new.T.reshape(s, *qp_shape)
        tangent = DenseTangent(tg.transpose(1, 2, 0).reshape(s, s, *qp_shape))
        h_out = (
            None
            if h_new is None
            else {k: pack(v) for k, v in h_new.items()}
        )
        return s_out, tangent, h_out


def register_model(cls=None, *, param_fields: tuple[str, ...] = ("params",)):
    """Class decorator registering a model as a JAX pytree.

    ``param_fields`` are instance attributes treated as traced leaves (material
    parameters); every other attribute is static auxiliary data. This keeps a
    jitted solver step from retracing when only parameter *values* change.
    """

    def wrap(c):
        def flatten(self):
            children = tuple(getattr(self, f) for f in param_fields)
            aux = {
                k: v for k, v in vars(self).items() if k not in param_fields
            }
            return children, (type(self), tuple(aux.items()))

        def unflatten(static, children):
            klass, aux_items = static
            obj = object.__new__(klass)
            for f, child in zip(param_fields, children):
                object.__setattr__(obj, f, child)
            for k, v in aux_items:
                object.__setattr__(obj, k, v)
            return obj

        jax.tree_util.register_pytree_node(c, flatten, unflatten)
        return c

    if cls is not None:
        return wrap(cls)
    return wrap


def as_param_dict(parameters: dict[str, Any]) -> dict[str, Array]:
    """Coerce a user parameter dict (floats / numpy scalars) to jnp scalars.

    WEAK-typed on purpose: a weak scalar follows the dtype of the array it
    meets, so an f32 problem under an x64-enabled session stays f32 in the
    constitutive kernels (a strongly-typed f64 parameter would silently
    promote every QP field to f64 — and break the f32 CG while_loop carry)."""
    return {k: jnp.asarray(float(v)) for k, v in parameters.items()}


def rotate_history(model: IncrSmallStrainModel, history: History, R) -> History:
    """Co-rotate a model's frame-attached history entries by ``R``.

    The TPU-native implementation of the reference's rotatable-history
    contract (``QDim::RotatableVector`` / ``RotatableMatrix``,
    /root/reference/comfe-rs/src/interfaces.rs:39-67): entries named in
    ``model.rotatable_history`` transform under a (per-QP or uniform)
    rotation increment; everything else (scalars like hardening variables,
    frame-free caches) passes through untouched.

    Args:
        model: the owning model (provides ``history_dim`` +
            ``rotatable_history``).
        history: AoS history pytree ``{name: [Q, ...entry_shape]}``.
        R: rotation ``[g, g]`` (uniform) or ``[Q, g, g]`` (per-QP).

    Transformation rules per declared entry shape:
      * Mandel vectors (``dim == stress_strain_dim``): conjugation
        ``mandel(R A R^T)`` via the exact Mandel<->matrix maps (norm- and
        invariant-preserving — Mandel is an isometry).
      * Geometric vectors (``dim == geometric_dim``): ``R v``.
      * Matrix entries ``(g, g)``: ``R H R^T``.
    """
    if history is None or not model.rotatable_history:
        return history
    from ..ops import mandel as _mandel

    c = model.constraint
    s, g = c.stress_strain_dim, c.geometric_dim
    hd = model.history_dim or {}
    R = jnp.asarray(R)
    if R.ndim == 2:
        R = R[None]  # broadcast a uniform rotation over the QP batch

    out = {}
    for name, v in history.items():
        if name not in model.rotatable_history:
            out[name] = v
            continue
        dim = hd[name]
        if isinstance(dim, tuple):
            if dim != (g, g):
                msg = (
                    f"rotatable matrix history '{name}' must be ({g},{g}), "
                    f"got {dim}"
                )
                raise ValueError(msg)
            out[name] = jnp.einsum("qij,qjk,qlk->qil", R, v, R)
        elif dim == s:
            A = _mandel.mandel_to_matrix(v, c)
            A = jnp.einsum("qij,qjk,qlk->qil", R, A, R)
            out[name] = _mandel.matrix_to_mandel(A, c)
        elif dim == g:
            out[name] = jnp.einsum("qij,qj->qi", R, v)
        else:
            msg = (
                f"rotatable history '{name}' has dim {dim}; expected the "
                f"Mandel dim {s}, the geometric dim {g}, or a ({g},{g}) matrix"
            )
            raise ValueError(msg)
    return out
