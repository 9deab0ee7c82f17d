"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU is a single chip; multi-chip sharding is validated on the CPU
backend with xla_force_host_platform_device_count, mirroring the reference's
use of single-host `mpiexec -np 4` for its MPI tests
(tests/lib/NemoTests.py:177-178).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
