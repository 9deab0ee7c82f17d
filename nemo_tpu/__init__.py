"""nemo_tpu: a TPU-native rebuild of the Nemo SZ cluster / compact-source
detection framework (reference: borisbolliet/nemo-1).

The compute path (matched filtering, noise estimation, signal modelling,
map simulation, selection-function math) runs on TPU via JAX/XLA, with tiles
as a batched, shardable axis over a ``jax.sharding.Mesh``.  Host code handles
FITS/WCS/catalog I/O and configuration, with no dependencies beyond
numpy/scipy/yaml.
"""

__version__ = "0.1.0"
