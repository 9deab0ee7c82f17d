"""nemo_tpu: a TPU-native rebuild of the Nemo SZ cluster / compact-source
detection framework (reference: borisbolliet/nemo-1).

The compute path (matched filtering, noise estimation, signal modelling,
map simulation, selection-function math) runs on TPU via JAX/XLA, with tiles
as a batched, shardable axis over a ``jax.sharding.Mesh``.  Host code handles
FITS/WCS/catalog I/O and configuration, with no dependencies beyond
numpy/scipy/yaml.
"""

__version__ = "0.1.0"

import os as _os

# This runtime pre-imports jax at interpreter startup, so plain env vars are
# read too late for jax config; apply them here (harmless no-ops if a
# backend is already initialised).
import jax as _jax

try:
    if _os.environ.get("NEMO_TPU_X64"):
        _jax.config.update("jax_enable_x64", True)
    if _os.environ.get("JAX_PLATFORMS"):
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
except RuntimeError:
    pass
