"""Local noise (RMS) map estimation on the device.

Replaces ``MapFilter.makeNoiseMap`` (``nemo/filters.py:345-483``), the
grid-cell sigma-clipped RMS estimator.  The reference loops over map cells in
python, re-measuring a 3-sigma-clipped standard deviation (or biweight /
percentile estimate) per cell, with half-cell overlapping windows whose
writes overlap so later cells overwrite earlier ones.

TPU formulation: all cell windows are gathered as one fixed-shape
(nCells, Wy, Wx) tensor (zero padding outside the map is self-masking,
because validity is defined by pixel != 0), the clipping loop is a fixed
10-iteration masked reduction over cells (exactly the reference's
``for c in range(10)``), and the overwrite-order semantics are reproduced
with a host-precomputed candidate-cell priority table.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def cell_edges(n, gridSize):
    """Cell edges replicating the reference's chunking
    (``filters.py:417-422``): numChunks = n / gridSize (float),
    edges = linspace(0, n, int(numChunks + 1)) as ints."""
    numChunks = n / gridSize
    return np.linspace(0, n, int(numChunks + 1), dtype=int)


@functools.partial(jax.jit, static_argnames=("window", "n_iter", "estimator"))
def _cell_stats(windows, valid, window, n_iter, estimator):
    """Per-cell RMS from (nCells, Wy*Wx) values + validity masks."""
    v = windows
    good = valid

    def masked_mean_std(vals, mask):
        n = jnp.sum(mask, axis=1)
        safe_n = jnp.maximum(n, 1)
        mean = jnp.sum(vals * mask, axis=1) / safe_n
        var = jnp.sum(mask * (vals - mean[:, None]) ** 2, axis=1) / safe_n
        return mean, jnp.sqrt(var), n

    if estimator == "percentile":
        # 68.3rd percentile of |values| over the valid set, matching
        # np.percentile's linear interpolation between order statistics.
        absv = jnp.where(good, jnp.abs(v), jnp.inf)
        svals = jnp.sort(absv, axis=1)
        ngood = jnp.sum(good, axis=1)
        pos = 0.683 * (ngood - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, v.shape[1] - 1)
        hi = jnp.clip(lo + 1, 0, v.shape[1] - 1)
        whi = pos - lo
        vlo = jnp.take_along_axis(svals, lo[:, None], axis=1)[:, 0]
        vhi = jnp.take_along_axis(svals, hi[:, None], axis=1)[:, 0]
        rms = vlo * (1 - whi) + vhi * whi
        rms = jnp.where(ngood > 0, rms, 0.0)
        return jnp.where(jnp.isfinite(rms), rms, 0.0)

    # Default: 3-sigma clipped std (filters.py:468-477). The reference seeds
    # mean/std from the *good* values, then iterates 10 times clipping on
    # |v| < |mean + 3 std| over the good set.
    mean, rms, n0 = masked_mean_std(v, good)

    def body(_, carry):
        mean, rms = carry
        clip = jnp.abs(v) < jnp.abs(mean + 3.0 * rms)[:, None]
        m = jnp.logical_and(good, clip)
        nm = jnp.sum(m, axis=1)
        new_mean, new_rms, _ = masked_mean_std(v, m)
        keep = nm > 0
        return (jnp.where(keep, new_mean, mean), jnp.where(keep, new_rms, rms))

    mean, rms = jax.lax.fori_loop(0, n_iter, body, (mean, rms))
    return jnp.where(n0 > 0, rms, 0.0)


def grid_rms_map(mapData, gridSize_pix, overlap_pix=None, estimator="default",
                 n_iter=10):
    """Estimate the noise map over grid cells (numNoiseBins = 1 path).

    Args:
        mapData: 2-d filtered map (nonzero pixels define valid area).
        gridSize_pix: cell size in pixels (from noiseGridArcmin).
        overlap_pix: window overlap; defaults to gridSize // 2 as the
            reference (``filters.py:418``).
        estimator: 'default' (3-sigma clip) or 'percentile'.

    Returns:
        RMS map, same shape.
    """
    mapData = jnp.asarray(mapData)
    ny, nx = mapData.shape
    gridSize = int(gridSize_pix)
    ov = int(gridSize // 2) if overlap_pix is None else int(overlap_pix)
    ye = cell_edges(ny, gridSize)
    xe = cell_edges(nx, gridSize)
    nCy, nCx = len(ye) - 1, len(xe) - 1

    # Fixed window size covering the largest cell + overlap.
    Wy = int((np.diff(ye)).max() + 2 * ov)
    Wx = int((np.diff(xe)).max() + 2 * ov)

    # Pad map with zeros so fixed windows anchored at (y0-ov, x0-ov) always
    # fit; zero pixels are invalid by definition so padding self-masks.
    padded = jnp.pad(mapData, ((ov, Wy), (ov, Wx)))
    starts_y = np.repeat(ye[:-1], nCx)          # (nCells,) in write order
    starts_x = np.tile(xe[:-1], nCy)

    def gather(sy, sx):
        return jax.lax.dynamic_slice(padded, (sy, sx), (Wy, Wx))

    windows = jax.vmap(gather)(jnp.asarray(starts_y), jnp.asarray(starts_x))
    # Mask out the part of each fixed window beyond its true cell extent
    # (cells can be up to 1 pixel larger/smaller due to integer edges).
    lens_y = np.repeat(np.diff(ye), nCx) + 2 * ov
    lens_x = np.tile(np.diff(xe), nCy) + 2 * ov
    iy = jnp.arange(Wy)[None, :, None]
    ix = jnp.arange(Wx)[None, None, :]
    in_cell = (iy < jnp.asarray(lens_y)[:, None, None]) & \
              (ix < jnp.asarray(lens_x)[:, None, None])
    flat = windows.reshape(windows.shape[0], -1)
    valid = (jnp.logical_and(windows != 0, in_cell)).reshape(
        windows.shape[0], -1)
    cellRMS = _cell_stats(flat, valid, (Wy, Wx), n_iter, estimator)
    cellRMS = cellRMS.reshape(nCy, nCx)

    # Per-pixel candidate cells in write-priority order. A pixel at y is
    # covered by cell rows i with ye[i] - ov <= y < ye[i+1] + ov; the
    # later-written (larger index) candidate wins unless its RMS <= 0.
    def candidates(edges, n, npix):
        c0 = np.full(npix, -1)
        c1 = np.full(npix, -1)
        pix = np.arange(npix)
        for i in range(n):
            cover = (pix >= edges[i] - ov) & (pix < edges[i + 1] + ov)
            c1[cover] = c0[cover]
            c0[cover] = i
        return c0, c1  # c0 = highest-priority (latest) row

    ry0, ry1 = candidates(ye, nCy, ny)
    cx0, cx1 = candidates(xe, nCx, nx)

    ry0 = jnp.asarray(ry0)[:, None]
    ry1 = jnp.asarray(ry1)[:, None]
    cx0 = jnp.asarray(cx0)[None, :]
    cx1 = jnp.asarray(cx1)[None, :]

    def cell_val(iy_, ix_):
        ok = jnp.logical_and(iy_ >= 0, ix_ >= 0)
        vals = cellRMS[jnp.clip(iy_, 0, nCy - 1), jnp.clip(ix_, 0, nCx - 1)]
        return jnp.where(ok, vals, 0.0)

    out = jnp.zeros((ny, nx), dtype=mapData.dtype)
    # priority: (r0,c0) > (r0,c1) > (r1,c0) > (r1,c1); apply in reverse so
    # higher priority overwrites (only where value > 0).
    for iy_, ix_ in ((ry1, cx1), (ry1, cx0), (ry0, cx1), (ry0, cx0)):
        v = cell_val(iy_, ix_)
        out = jnp.where(v > 0, v, out)
    return out


def whole_map_rms(mapData, estimator="default", n_iter=10):
    """Single-cell variant (noiseGridArcmin = None path, filters.py:411-415)."""
    flat = jnp.asarray(mapData).reshape(1, -1)
    valid = flat != 0
    rms = _cell_stats(flat, valid, mapData.shape, n_iter, estimator)[0]
    return jnp.where(jnp.asarray(mapData) != 0, rms,
                     rms) * jnp.ones_like(jnp.asarray(mapData))
