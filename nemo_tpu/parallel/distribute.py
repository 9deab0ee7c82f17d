"""The batched, sharded matched-filter step.

This is the TPU-native replacement for the reference's outer MPI loop
(``nemo/pipelines.py:179``: one tile per rank at a time).  A batch of
same-shaped tiles ``(n_tiles, n_freq, ny, nx)`` is sharded over the device
mesh; one jitted step builds the per-tile matched filter (noise covariance
-> closed-form N^-1 w|s| solve), applies it, estimates the local-noise RMS
map, forms the S/N map, trims edges, extracts the top-K S/N peaks per tile
on device, and reduces survey-level statistics (candidate counts, noise
histograms) with ``psum`` collectives over ICI.

Only the tiny top-K candidate lists and histograms leave the device, not
the filtered maps - detection's catalog work stays host-side and cheap.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from ..ops import fourier, imageops
from ..ops import noise as noise_ops
from ..ops import solve as solve_ops
from .mesh import TILE_AXIS, get_mesh, tile_sharding


def _single_tile_step(data, noise, fsignal_abs, w, apodM, psMask,
                      surveyMask, gridSize, trimPix, topK, threshold):
    """Full matched-filter forward step for ONE tile.

    Args:
        data: (nf, ny, nx) maps to filter.
        noise: (nf, ny, nx) maps defining the noise covariance.
        fsignal_abs: (nf, ny, nx) |FFT| of unit signal templates.
        w: (nf,) spectral weights.
        apodM: (ny, nx) apodisation window.
        psMask, surveyMask: (ny, nx) masks.
    Returns:
        dict with filtered map, SNMap, RMSMap, peak (values, ys, xs).
    """
    nf = data.shape[0]
    # Noise covariance + filter build (filters.py:524-630)
    fNoise = fourier.fft2(noise * apodM[None])
    prods = jnp.real(fNoise[:, None] * jnp.conj(fNoise[None, :]))
    prods = imageops.gaussian_filter(
        prods.reshape((-1,) + prods.shape[-2:]), (3, 3))
    N = prods.reshape(nf, nf, *data.shape[-2:])
    A = jnp.moveaxis(N, (0, 1), (-2, -1))
    b = jnp.moveaxis(fsignal_abs, 0, -1) * w
    filt = jnp.moveaxis(solve_ops.solve_small(A, b), -1, 0)

    # Normalise on-device so tile batches are self-contained: scale so the
    # filtered unit template peaks at 1 (host runs refine this with the
    # sub-pixel spline calibration, filters.py:635-690).
    filteredTemplate = jnp.sum(jnp.real(fourier.ifft2(fsignal_abs * filt)),
                               axis=0)
    norm = 1.0 / jnp.maximum(jnp.max(filteredTemplate), 1e-30)

    fMaps = fourier.fft2(data * apodM[None])
    filtered = jnp.sum(jnp.real(fourier.ifft2(fMaps * filt)), axis=0) * norm
    filtered = filtered * psMask

    RMSMap = noise_ops.grid_rms_map(filtered, gridSize)
    SNMap = jnp.where(RMSMap > 0, filtered / jnp.maximum(RMSMap, 1e-30), 0.0)

    if trimPix > 0:
        edge = imageops.minimum_filter(jnp.abs(filtered + (1 - psMask)),
                                       trimPix)
        edgeCheck = (edge > 0).astype(filtered.dtype)
    else:
        edgeCheck = jnp.ones_like(filtered)
    mask = edgeCheck * surveyMask * psMask * (apodM == 1)
    SNMap = SNMap * mask
    RMSMap = RMSMap * mask
    filtered = filtered * mask

    # On-device top-K local S/N maxima (candidate extraction): a peak is a
    # pixel equal to the 3x3 local max and above threshold.
    localMax = imageops.maximum_filter(SNMap, 3)
    isPeak = jnp.logical_and(SNMap >= localMax, SNMap > threshold)
    peakVals = jnp.where(isPeak, SNMap, 0.0).reshape(-1)
    vals, flatIdx = jax.lax.top_k(peakVals, topK)
    ys = flatIdx // SNMap.shape[-1]
    xs = flatIdx % SNMap.shape[-1]
    return {"filtered": filtered, "SNMap": SNMap, "RMSMap": RMSMap,
            "peakVals": vals, "peakYs": ys, "peakXs": xs}


def make_sharded_tile_step(mesh, gridSize, trimPix, topK=256, threshold=4.0,
                           with_survey_stats=True):
    """Build the jitted multi-device tile-batch step.

    Returns a function of (data, noise, fsignal_abs, w, apodM, psMask,
    surveyMask) with a leading tile axis on the array args, sharded over
    the mesh.  Survey-level statistics ride ICI collectives.
    """
    from jax import shard_map

    spec_tiles = PartitionSpec(TILE_AXIS)
    spec_rep = PartitionSpec()

    def per_shard(data, noise, fsignal_abs, w, apodM, psMask, surveyMask):
        step = functools.partial(_single_tile_step, gridSize=gridSize,
                                 trimPix=trimPix, topK=topK,
                                 threshold=threshold)
        out = jax.vmap(lambda d, n, s, pm, sm: step(
            d, n, s, w, apodM, pm, sm))(data, noise, fsignal_abs, psMask,
                                        surveyMask)
        if with_survey_stats:
            # Survey-wide reductions (the reference's MPI gathers):
            # candidate count and a global noise histogram via psum.
            nCand = jnp.sum(out["peakVals"] > threshold)
            rms = out["RMSMap"]
            valid = rms > 0
            # Globally consistent bin edges need the survey-wide max noise
            # level: a pmax collective, then the per-shard histogram, then a
            # psum - the reference's gather-to-rank-0 pattern as ICI traffic.
            globalMax = jax.lax.pmax(jnp.max(rms), TILE_AXIS)
            edges = jnp.linspace(0.0, globalMax * 1.0001 + 1e-30, 33)
            hist = jnp.histogram(jnp.where(valid, rms, -1.0).reshape(-1),
                                 bins=edges,
                                 weights=valid.reshape(-1) * 1.0)[0]
            out["surveyCandidateCount"] = jax.lax.psum(nCand, TILE_AXIS)
            out["surveyRMSHist"] = jax.lax.psum(hist, TILE_AXIS)
        return out

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec_tiles, spec_tiles, spec_tiles, spec_rep, spec_rep,
                  spec_tiles, spec_tiles),
        out_specs={"filtered": spec_tiles, "SNMap": spec_tiles,
                   "RMSMap": spec_tiles, "peakVals": spec_tiles,
                   "peakYs": spec_tiles, "peakXs": spec_tiles,
                   **({"surveyCandidateCount": spec_rep,
                       "surveyRMSHist": spec_rep}
                      if with_survey_stats else {})},
        check_vma=False)
    return jax.jit(sharded)


def run_tile_batch(dataBatch, noiseBatch, fSignalBatch, w, apodM, psMask,
                   surveyMask, gridSize, trimPix, mesh=None, topK=256,
                   threshold=4.0):
    """Convenience host API: place a tile batch on the mesh and run."""
    mesh = mesh or get_mesh()
    step = make_sharded_tile_step(mesh, gridSize, trimPix, topK=topK,
                                  threshold=threshold)
    sh = tile_sharding(mesh)
    dataBatch = jax.device_put(jnp.asarray(dataBatch), sh)
    noiseBatch = jax.device_put(jnp.asarray(noiseBatch), sh)
    fSignalBatch = jax.device_put(jnp.asarray(fSignalBatch), sh)
    psMask = jax.device_put(jnp.asarray(psMask), sh)
    surveyMask = jax.device_put(jnp.asarray(surveyMask), sh)
    return step(dataBatch, noiseBatch, fSignalBatch, jnp.asarray(w),
                jnp.asarray(apodM), psMask, surveyMask)
