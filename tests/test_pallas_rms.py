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


def test_meta_geometry_matches_true_shape_exactly():
    """With per-tile cell_meta, the batched estimator on PADDED maps must
    reproduce grid_rms_map on each tile's TRUE shape bit-for-bit - the
    host-engine geometry (filters.py:417-422 lays cell edges out on the
    tile dims, not the padded dims)."""
    rng = np.random.default_rng(3)
    g = 64
    shapes = [(200, 240), (167, 233), (256, 256)]
    padShape = (256, 256)
    padded = np.zeros((len(shapes),) + padShape)
    tiles = []
    for i, (ny, nx) in enumerate(shapes):
        t = rng.normal(0, 2.0, (ny, nx))
        t[: ny // 10] = 0          # masked border rows
        tiles.append(t)
        padded[i, :ny, :nx] = t

    meta = noise_ops.cell_meta_batch(shapes, padShape, g)
    for impl in ("xla", "pallas"):
        kw = {"interpret": True} if impl == "pallas" else {}
        out = np.asarray(noise_ops.grid_rms_map_batch(
            jnp.asarray(padded), g, impl=impl, meta=meta, **kw))
        for i, (ny, nx) in enumerate(shapes):
            ref = np.asarray(noise_ops.grid_rms_map(
                jnp.asarray(tiles[i]), g))
            np.testing.assert_allclose(out[i, :ny, :nx], ref,
                                       rtol=1e-12, atol=1e-14,
                                       err_msg="impl=%s tile=%d"
                                               % (impl, i))
            # padding region must come back zero
            assert np.all(out[i, ny:] == 0)
            assert np.all(out[i, :, nx:] == 0)


def test_meta_cells_match_true_shape_cells():
    """return_cells with meta gives the true-shape cell grid in the
    leading slots and zeros in the unused padded slots."""
    rng = np.random.default_rng(5)
    g = 64
    shape, padShape = (150, 170), (192, 256)
    t = rng.normal(0, 1.0, shape)
    padded = np.zeros((1,) + padShape)
    padded[0, : shape[0], : shape[1]] = t

    meta = noise_ops.cell_meta_batch([shape], padShape, g)
    cells = np.asarray(noise_ops.grid_rms_map_batch(
        jnp.asarray(padded), g, impl="xla", meta=meta,
        return_cells=True))[0]
    refCells = np.asarray(noise_ops.grid_rms_map(
        jnp.asarray(t), g, return_cells=True))
    nCy, nCx = refCells.shape
    np.testing.assert_allclose(cells[:nCy, :nCx], refCells,
                               rtol=1e-12, atol=1e-14)
    assert np.all(cells[nCy:] == 0)
    assert np.all(cells[:, nCx:] == 0)
    # host expansion of the sliced grid reproduces the true-shape map
    full = noise_ops.assemble_rms_host(cells[:nCy, :nCx], shape[0],
                                       shape[1], g)
    ref = np.asarray(noise_ops.grid_rms_map(jnp.asarray(t), g))
    np.testing.assert_allclose(full, ref, rtol=1e-12, atol=1e-14)
