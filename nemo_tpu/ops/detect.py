"""On-device object detection: connected components + segment statistics.

TPU-native replacement for the host detection stage (scipy
``ndimage.label`` / ``center_of_mass`` / ``maximum_position`` in
``nemo/photometry.py:193-222``): S/N-map segmentation runs on the device
and only O(K) per-object statistics and small per-object cutouts cross
the host link - at DR5 scale on a remote TPU runtime, downloading the
full filtered + S/N maps for every (tile, scale) costs minutes per chunk
at single-digit MB/s, while detections are ~30 KB.

Algorithm:

1. ``sigPix = SNMap > threshold`` (the reference's segmentation input).
2. Connected components by iterative 4-neighbour label minimisation:
   every significant pixel starts with its own flat index as its label
   and repeatedly takes the minimum of its neighbours' labels.  The
   iteration count bounds the component *diameter* resolvable - SZ
   cluster/point-source segments span tens of pixels, so the default
   128 iterations has a wide margin (a component split by an undersized
   budget would surface as duplicate detections, removed by the optimal
   catalog's position dedup, not silent corruption).
3. Every component's root (minimum flat index) marks one object.  Up to
   ``max_objects`` roots are kept in pixel order; per-component count,
   value-weighted centroid (= scipy ``center_of_mass`` with the map as
   weights), peak value and first-maximum position (= scipy
   ``maximum_position``) come from segment reductions keyed by a
   searchsorted bucket of the sorted root list.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


_BIG = np.int32(2 ** 30)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def label_components(mask, n_iter=128):
    """4-connected component labels (flat-index minima) for a 2-d mask.

    Returns int32 labels: for mask pixels, the minimum flat index of the
    connected component; _BIG elsewhere.
    """
    ny, nx = mask.shape
    flat = jnp.arange(ny * nx, dtype=jnp.int32).reshape(ny, nx)
    labels = jnp.where(mask, flat, _BIG)

    def body(_, lab):
        up = jnp.pad(lab[1:], ((0, 1), (0, 0)), constant_values=_BIG)
        down = jnp.pad(lab[:-1], ((1, 0), (0, 0)), constant_values=_BIG)
        left = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=_BIG)
        right = jnp.pad(lab[:, :-1], ((0, 0), (1, 0)), constant_values=_BIG)
        best = jnp.minimum(jnp.minimum(up, down),
                           jnp.minimum(left, right))
        return jnp.where(mask, jnp.minimum(lab, best), _BIG)

    return jax.lax.fori_loop(0, n_iter, body, labels)


@functools.partial(jax.jit, static_argnames=("max_objects", "n_iter"))
def detect_objects(SNMap, threshold, max_objects=128, n_iter=128):
    """Segment a (masked) S/N map and reduce per-object statistics.

    Args:
        SNMap: 2-d S/N map (already masked: zero outside the valid area).
        threshold: detection threshold (sigPix = SNMap > threshold).
        max_objects: per-map object budget K (roots beyond it dropped -
            ``nObjects`` reports the true count so callers can detect
            overflow and fall back).
    Returns dict of (K,) arrays:
        valid (bool), numPix, comY, comX (value-weighted centroid),
        peak (max S/N value in segment), peakY, peakX (first maximum,
        scan order), plus scalar nObjects.
    """
    ny, nx = SNMap.shape
    mask = SNMap > threshold
    labels = label_components(mask, n_iter=n_iter)
    flat = jnp.arange(ny * nx, dtype=jnp.int32).reshape(ny, nx)
    isRoot = jnp.logical_and(mask, labels == flat)
    nObjects = jnp.sum(isRoot.astype(jnp.int32))

    # Up to K roots in pixel order: top_k over the root indicator breaks
    # ties toward lower flat index, so equal values arrive sorted.
    rootVals, rootIdx = jax.lax.top_k(isRoot.reshape(-1).astype(jnp.float32),
                                      max_objects)
    valid = rootVals > 0
    roots = jnp.sort(jnp.where(valid, rootIdx, _BIG))
    valid = roots < _BIG

    labFlat = labels.reshape(-1)
    snFlat = SNMap.reshape(-1)
    b = jnp.clip(jnp.searchsorted(roots, labFlat), 0, max_objects - 1)
    inBucket = jnp.logical_and(labFlat != _BIG, roots[b] == labFlat)
    seg = jnp.where(inBucket, b, max_objects)  # overflow bucket K

    K1 = max_objects + 1
    ones = jnp.ones_like(snFlat)
    yy = (jnp.arange(ny * nx, dtype=snFlat.dtype) // nx)
    xx = (jnp.arange(ny * nx, dtype=snFlat.dtype) % nx)
    count = jax.ops.segment_sum(ones, seg, num_segments=K1)[:-1]
    sumV = jax.ops.segment_sum(snFlat, seg, num_segments=K1)[:-1]
    sumVY = jax.ops.segment_sum(snFlat * yy, seg, num_segments=K1)[:-1]
    sumVX = jax.ops.segment_sum(snFlat * xx, seg, num_segments=K1)[:-1]
    peak = jax.ops.segment_max(jnp.where(inBucket, snFlat, -jnp.inf), seg,
                               num_segments=K1)[:-1]
    # First maximum (scipy maximum_position scan order): min flat index
    # among pixels at the segment max.
    atPeak = jnp.logical_and(inBucket, snFlat == peak[b])
    peakIdx = jax.ops.segment_min(
        jnp.where(atPeak, jnp.arange(ny * nx, dtype=jnp.int32), _BIG),
        seg, num_segments=K1)[:-1]

    safe = jnp.maximum(sumV, 1e-30)
    return {"valid": valid, "numPix": count,
            "comY": sumVY / safe, "comX": sumVX / safe,
            "peak": peak,
            "peakY": (peakIdx // nx).astype(jnp.float32),
            "peakX": (peakIdx % nx).astype(jnp.float32),
            "nObjects": nObjects}


def detect_objects_batch(SNBatch, threshold, max_objects=128, n_iter=128):
    """vmap of :func:`detect_objects` over a tile batch."""
    return jax.vmap(lambda m: detect_objects(m, threshold,
                                             max_objects=max_objects,
                                             n_iter=n_iter))(SNBatch)


@functools.partial(jax.jit, static_argnames=("window",))
def gather_cutouts(maps3d, ys, xs, window=16):
    """Fixed-size windows around float (y, x) positions from a stack of
    maps.

    Anchoring replicates ``interp.subpixel_values``:
    ``y0 = clip(floor(y) - window, 0, max(ny - 2*window, 0))`` - so a
    host-side windowed spline over the cutout reproduces the full-map
    windowed spline bit-for-bit when the anchor formula agrees.

    Args:
        maps3d: (nMaps, ny, nx) stack (e.g. S/N + signal maps).
        ys, xs: (K,) float positions.
        window: half-width; cutouts are (2*window + 1) square.
    Returns:
        (K, nMaps, 2*window+1, 2*window+1) values and (K,) y0, x0 anchors.
    """
    nMaps, ny, nx = maps3d.shape
    P = 2 * window + 1
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32) - window, 0,
                  max(ny - P, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32) - window, 0,
                  max(nx - P, 0))

    def one(yy, xx):
        zero = jnp.zeros((), dtype=yy.dtype)
        return jax.lax.dynamic_slice(maps3d, (zero, yy, xx), (nMaps, P, P))

    cut = jax.vmap(one)(y0, x0)
    return cut, y0, x0
