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


def _bspline_basis4(t, u, nCoef):
    """The 4 non-zero cubic B-spline basis values at each point.

    Cox-de Boor (The NURBS Book A2.2, degree 3, unrolled) against the
    fixed knot vector ``t`` ((nCoef + 4,)) - the same basis FITPACK's
    ``fpbspl`` evaluates, so values agree with scipy to rounding error.

    Args:
        t: knots, e.g. from ``interp.notaknot_spline_setup``.
        u: (K,) evaluation points (clipped to the spline domain).
        nCoef: number of B-spline coefficients (= P for not-a-knot).
    Returns:
        N (K, 4) basis values for coefficients ``span-3..span`` and
        span (K,) int32 knot-span indices.
    """
    u = jnp.clip(u, t[3], t[nCoef])
    span = jnp.clip(jnp.searchsorted(t, u, side="right") - 1, 3,
                    nCoef - 1).astype(jnp.int32)
    left = [None] * 4
    right = [None] * 4
    for j in (1, 2, 3):
        left[j] = u - jnp.take(t, span + 1 - j)
        right[j] = jnp.take(t, span + j) - u
    N = [jnp.ones_like(u), None, None, None]
    for j in (1, 2, 3):
        saved = jnp.zeros_like(u)
        for r in range(j):
            denom = right[r + 1] + left[j - r]
            temp = N[r] / jnp.where(denom == 0, 1.0, denom)
            N[r] = saved + right[r + 1] * temp
            saved = left[j - r] * temp
        N[j] = saved
    return jnp.stack(N, axis=-1), span


def spline_values_from_cutouts(cut, y0, x0, ys, xs):
    """Not-a-knot bicubic spline values at float positions from
    ``gather_cutouts`` windows - the on-device equivalent of the host's
    windowed ``scipy.interpolate.RectBivariateSpline`` read
    (``photometry._cutoutSpline`` / ``interp.subpixel_values``; reference
    sub-pixel S/N + flux reads at ``nemo/photometry.py:121-124``).

    The value->coefficient matrix is derived from scipy on the host
    (``interp.notaknot_spline_setup``), so in float64 the values match a
    host windowed-spline read at the same anchors to ~1e-12.

    Args:
        cut, y0, x0: outputs of :func:`gather_cutouts` (cutouts must be
            square, (K, nMaps, P, P)).
        ys, xs: (K,) float positions (absolute map coordinates).
    Returns:
        (K, nMaps) spline values.
    """
    from . import interp as interp_ops

    K, nMaps, P, _ = cut.shape
    t_np, M_np = interp_ops.notaknot_spline_setup(P)
    dt = cut.dtype
    t = jnp.asarray(t_np, dt)
    M = jnp.asarray(M_np, dt)
    C = jnp.einsum("ip,kmpq,jq->kmij", M, cut, M)
    Ny, iy = _bspline_basis4(t, ys.astype(dt) - y0.astype(dt), P)
    Nx, ix = _bspline_basis4(t, xs.astype(dt) - x0.astype(dt), P)

    def pick(Ck, ny, nx, iy0, ix0):
        blk = jax.lax.dynamic_slice(Ck, (jnp.int32(0), iy0, ix0),
                                    (nMaps, 4, 4))
        return jnp.einsum("a,mab,b->m", ny, blk, nx)

    return jax.vmap(pick)(C, Ny, Nx, iy - 3, ix - 3)


def nearest_values(maps3d, ys, xs):
    """Rounded-pixel map reads at float positions, (K, nMaps) - the
    ``useInterpolator=False`` read (reference ``photometry.py:119``);
    round-half-even matches the host's ``round``."""
    ny, nx = maps3d.shape[-2:]
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, ny - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, nx - 1)
    return maps3d[:, yi, xi].T


@functools.partial(jax.jit, static_argnames=("window",))
def spline_values(maps3d, ys, xs, window=16):
    """Sub-pixel reads of a map stack at float positions, fully on
    device: (spline (K, nMaps), nearest (K, nMaps)).  Ships O(K) scalars
    over the host link instead of O(K x P x P) cutouts."""
    cut, y0, x0 = gather_cutouts(maps3d, ys, xs, window=window)
    sp = spline_values_from_cutouts(cut, y0, x0, ys, xs)
    return sp, nearest_values(maps3d, ys, xs)
