"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

The real TPU is a single chip; multi-chip sharding is validated on the CPU
backend with xla_force_host_platform_device_count, mirroring the reference's
use of single-host `mpiexec -np 4` for its MPI tests
(tests/lib/NemoTests.py:177-178).

Note: this environment pre-imports jax at interpreter startup, so plain env
vars are too late for config options - we use jax.config.update, which works
as long as no backend has been initialised yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# No persistent compile cache under tests: XLA's CPU AOT cache is keyed
# loosely enough that entries written on a different machine type can load
# and SIGILL; in-process caching is all the suite needs.
os.environ.setdefault("NEMO_TPU_COMPILE_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
