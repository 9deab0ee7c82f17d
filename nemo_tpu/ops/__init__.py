"""Device-side (JAX/XLA/Pallas) compute primitives."""

from . import fourier, hankel, imageops, interp, paint, solve  # noqa: F401
