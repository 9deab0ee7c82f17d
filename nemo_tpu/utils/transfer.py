"""Chunked host<->device transfers for survey-scale arrays.

Remote TPU runtimes (the axon tunnel used on this host) ship each
``device_put`` as one HTTP request and reject bodies beyond ~0.5-1 GB
(HTTP 413).  Full-survey maps (e.g. the 60 x 210 deg DR5-scale sim,
7200 x 25200 pixels) exceed that in one piece, so we split the leading
axis into sub-limit slices, upload each separately, and concatenate on
device.  Per-tile arrays (the hot path) are far below the limit and go
through the normal single-request path untouched.
"""

import numpy as np

import jax
import jax.numpy as jnp

# Conservative per-request budget: measured 512 MB uploads succeed on the
# axon tunnel (2026-08-16); a full-survey float64 map (1.45 GB) does not.
MAX_TRANSFER_BYTES = 256 * 1024 * 1024


def device_put_chunked(x, sharding=None, max_bytes=MAX_TRANSFER_BYTES):
    """``jax.device_put`` that splits oversized host arrays along axis 0.

    Falls back to a plain ``device_put`` when the array fits in one
    request (always the case for per-tile work).
    """
    x = np.asarray(x)
    if x.nbytes <= max_bytes or x.ndim == 0 or x.shape[0] < 2:
        return jax.device_put(x, sharding) if sharding is not None \
            else jax.device_put(x)
    rowBytes = max(1, x.nbytes // x.shape[0])
    rowsPerChunk = max(1, max_bytes // rowBytes)
    parts = []
    for i0 in range(0, x.shape[0], rowsPerChunk):
        part = x[i0:i0 + rowsPerChunk]
        parts.append(jax.device_put(part))
    out = jnp.concatenate(parts, axis=0)
    if sharding is not None:
        out = jax.device_put(out, sharding)
    return out


def start_host_copy(a):
    """Begin an async device->host copy and return the array.

    The remote tunnel is LATENCY-bound (~0.4 s per request) for small
    results: starting every copy as soon as it is dispatched and reading
    the values later overlaps the round trips, so N reads pay ~one
    latency instead of N.  No-op for plain numpy inputs."""
    try:
        a.copy_to_host_async()
    except AttributeError:
        pass
    return a


def to_host_chunked(devArr, max_bytes=MAX_TRANSFER_BYTES):
    """Fetch a device array to host in sub-limit row slices."""
    nbytes = int(np.prod(devArr.shape)) * devArr.dtype.itemsize
    if nbytes <= max_bytes or devArr.ndim == 0 or devArr.shape[0] < 2:
        return np.asarray(devArr)
    rowBytes = max(1, nbytes // devArr.shape[0])
    rowsPerChunk = max(1, max_bytes // rowBytes)
    out = np.empty(devArr.shape, dtype=devArr.dtype)
    for i0 in range(0, devArr.shape[0], rowsPerChunk):
        out[i0:i0 + rowsPerChunk] = np.asarray(devArr[i0:i0 + rowsPerChunk])
    return out
