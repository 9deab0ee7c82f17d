"""Multi-device tile distribution over the JAX device mesh."""

from . import distribute, mesh  # noqa: F401
