"""Model-conversion wrappers: run a FULL-3D model under a lower-dimensional
constraint by padding the QP arrays to 3D and extracting the relevant blocks back.

Capability parity with the reference's ``UniaxialStrainFrom3D`` /
``PlaneStrainFrom3D`` (/root/reference/src/fenics_constitutive/models/utils.py:211-412).
Unlike the reference (which caches mutable scratch arrays on the wrapper object),
these are pure: the padding is traced and fuses into the wrapped model's kernels
under jit. The full 3D stress — which the reference exposes as the mutable
``stress_3d`` attribute and its tests inspect for zero shear
(tests/models/test_elasticity.py:233) — is carried as an auxiliary history
variable ``"stress_3d"`` so it survives the functional state threading.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.mandel import Constraint
from .interfaces import IncrSmallStrainModel, register_model

_AUX = "stress_3d"


class _From3DBase(IncrSmallStrainModel):
    def __init__(self, model: IncrSmallStrainModel):
        assert model.constraint == Constraint.FULL
        self.model = model

    @property
    def history_dim(self) -> dict[str, int]:
        inner = self.model.history_dim or {}
        return {**inner, _AUX: 6}

    def _split(self, history):
        inner = {k: v for k, v in history.items() if k != _AUX}
        return (inner if self.model.history_dim is not None else None)

    def _merge(self, inner_history, stress_3d):
        out = dict(inner_history) if inner_history is not None else {}
        out[_AUX] = stress_3d
        return out


@register_model(param_fields=("model",))
class UniaxialStrainFrom3D(_From3DBase):
    """Wrap a FULL 3D model as a UNIAXIAL_STRAIN model (utils.py:211-297)."""

    @property
    def constraint(self) -> Constraint:
        return Constraint.UNIAXIAL_STRAIN

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        q = grad_del_u.shape[0]
        dtype = stress.dtype
        grad_3d = jnp.zeros((q, 3, 3), dtype).at[:, 0, 0].set(grad_del_u[:, 0, 0])
        # Rebuild the full 3D stress from the committed aux history: lateral
        # sigma_yy/sigma_zz are nonzero in uniaxial strain and must persist
        # across steps (the reference keeps them on the mutable stress_3d
        # attribute, utils.py:228-238). Only slot 0 is observed by the 1D
        # problem, so it is refreshed from the incoming committed stress —
        # this keeps evaluate idempotent across Newton iterations (history is
        # the committed pytree, untouched until step commit).
        stress_3d = history[_AUX].astype(dtype).at[:, 0].set(stress[:, 0])
        stress_3d, tangent_3d, inner_new = self.model.evaluate(
            t, del_t, grad_3d, stress_3d, self._split(history)
        )
        return (
            stress_3d[:, 0:1],
            tangent_3d[:, 0:1, 0:1],
            self._merge(inner_new, stress_3d),
        )


@register_model(param_fields=("model",))
class PlaneStrainFrom3D(_From3DBase):
    """Wrap a FULL 3D model as a PLANE_STRAIN model (utils.py:300-412)."""

    @property
    def constraint(self) -> Constraint:
        return Constraint.PLANE_STRAIN

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        q = grad_del_u.shape[0]
        dtype = stress.dtype
        # 2D grad [[0,1],[2,3]] maps into the upper-left 2x2 of the 3D grad
        # (reference utils.py:366-378).
        grad_3d = (
            jnp.zeros((q, 3, 3), dtype)
            .at[:, 0:2, 0:2]
            .set(grad_del_u[:, 0:2, 0:2])
        )
        # 2D Mandel slots [xx, yy, zz, xy] are the first four 3D slots
        # (utils.py:380-391); the tangent block map is the 4x4 top-left
        # (utils.py:393-412). Out-of-plane shear slots 4,5 persist through the
        # committed aux history (reference keeps them on stress_3d).
        stress_3d = history[_AUX].astype(dtype).at[:, 0:4].set(stress)
        stress_3d, tangent_3d, inner_new = self.model.evaluate(
            t, del_t, grad_3d, stress_3d, self._split(history)
        )
        return (
            stress_3d[:, 0:4],
            tangent_3d[:, 0:4, 0:4],
            self._merge(inner_new, stress_3d),
        )
