"""Utilities: checkpoint/resume and timers/profiling scopes."""

from .checkpoint import (
    load_checkpoint,
    load_checkpoint_orbax,
    load_state_dict,
    save_checkpoint,
    save_checkpoint_orbax,
    state_dict,
)
from .timers import get_timings, reset_timings, timed, timing

__all__ = [
    "save_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "load_checkpoint",
    "state_dict",
    "load_state_dict",
    "timed",
    "timing",
    "get_timings",
    "reset_timings",
]
