"""Solver layer: the incremental problem + matrix-free Newton-Krylov."""

from .linear import cg_solve
from .problem import IncrSmallStrainProblem, SimulationTime

__all__ = ["IncrSmallStrainProblem", "SimulationTime", "cg_solve"]
