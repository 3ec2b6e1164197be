"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference validates distributed behavior with `mpirun -np 2`
(tests/solver/test_solver_mpi.py); our analog is GSPMD over 8 virtual CPU
devices. Real-TPU benchmarking happens in bench.py, not in the test suite.

NOTE on the environment: a sitecustomize preimports jax and registers the
remote-TPU ("axon") backend in every Python process, with JAX_PLATFORMS=axon
pinned in the env. Setting env vars here is therefore too late/ignored for the
platform choice — we override through jax.config instead, which works because
the backend is registered but not yet initialized at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-bound (hundreds of
# jitted Newton/CG programs on a 1-core, 8-virtual-device host), and the
# programs are identical across runs — warm-cache runs cut minutes of wall
# time. Safe: the cache key includes program, config, and device topology.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE", "/tmp/fenics_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
