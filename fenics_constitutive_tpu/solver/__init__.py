"""Solver layer: the incremental problem + matrix-free Newton-Krylov."""

from .linear import cg_solve
from .problem import IncrSmallStrainProblem, SimulationTime
from .simulation import PackedSimulation

__all__ = [
    "IncrSmallStrainProblem",
    "SimulationTime",
    "PackedSimulation",
    "cg_solve",
]
