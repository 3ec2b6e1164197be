"""GSPMD parallelism: device-mesh sharding of the element/QP axes — the
TPU-native replacement for the reference's MPI domain decomposition."""

from .sharding import make_device_mesh, shard_problem

__all__ = ["make_device_mesh", "shard_problem"]
