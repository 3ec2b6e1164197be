"""Postprocessing: global norms, and point sensors (the reference's
unimplemented test_sensor.py intent, implemented)."""

from .norms import dof_norm, norm, qp_norm
from .sensors import DisplacementSensor, QPSensor

__all__ = ["qp_norm", "dof_norm", "norm", "DisplacementSensor", "QPSensor"]
