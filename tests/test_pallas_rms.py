"""Parity test: the fused Pallas sigma-clip RMS kernel (interpret mode on
CPU) against the XLA gather path (itself tested against the reference
algorithm)."""

import numpy as np

import jax.numpy as jnp

from nemo_tpu.ops import noise as noise_ops


def test_pallas_rms_matches_xla():
    rng = np.random.default_rng(42)
    nT, ny, nx = 2, 200, 240
    m = rng.normal(0, 2.0, (nT, ny, nx))
    m[:, :20] = 0
    m[:, :, -20:] = 0
    xla = np.asarray(noise_ops.grid_rms_map_batch(jnp.asarray(m), 64,
                                                  impl="xla"))
    pallas = np.asarray(noise_ops.grid_rms_map_batch(jnp.asarray(m), 64,
                                                     impl="pallas",
                                                     interpret=True))
    np.testing.assert_allclose(pallas, xla, rtol=1e-10, atol=1e-12)
