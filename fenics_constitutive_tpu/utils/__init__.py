"""Utilities: checkpoint/resume and timers/profiling scopes."""

from .checkpoint import load_checkpoint, load_state_dict, save_checkpoint, state_dict
from .timers import get_timings, reset_timings, timed, timing

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "state_dict",
    "load_state_dict",
    "timed",
    "timing",
    "get_timings",
    "reset_timings",
]
