"""Benchmark: multi-frequency matched-filter throughput on one TPU chip.

Metric: PRODUCTION tile-scale MMF pipeline steps per second per chip, on
ACT DR5-like tiles (2 frequencies, ~7 x 12 deg tile at 0.5 arcmin pixels,
padded to FFT-friendly 896 x 1536).  One step = the batched engine's
per-tile-per-scale device work (``make_sharded_matched_filter_step``,
the same compiled program ``useDeviceBatching`` runs in production):
noise covariance from tile FFTs + 3-pixel Gaussian smoothing, closed-form
per-pixel N^-1 w|s| solve, signal-norm calibration against a
known-amplitude template (reference ``filters.py:635-690``), filter
application, grid sigma-clipped RMS map (fused Pallas kernel), S/N map,
edge trim and masking.  Excluded (host-side in both this framework and
the reference): per-tile preprocessing/IO, template painting, detection
and catalog work - those are timed end-to-end by
``examples/dr5_scale_benchmark.py`` instead.

Baseline (BASELINE.md): the reference runs the full DR5 search - about 280
tiles x 16 filter scales = 4480 tile-scale steps - in under 4 h 59 m on
~300 CPU ranks, i.e. ~0.25 tile-scale steps/sec for the whole cluster.

``vs_baseline`` is the MEASURED end-to-end ratio of record, computed
from the best committed benchmark artifact
(``docs/benchmarks/*/results_summary.json``, smallest ``end_to_end_s``):
the full DR5-scale pipeline (filter + detect + catalog + Q fit + RMS
tables + completeness) on ONE chip vs the reference's < 17,940 s on
~300 CPU ranks.  The kernel-rate-vs-cluster-rate ratio (previous
rounds' headline; a device-compute scope, not end-to-end) is reported
separately as ``kernel_rate_vs_cluster_rate``.

Prints ONE JSON line.
"""

import glob
import json
import os
import time

import numpy as np


def _record_of_record():
    """The committed end-to-end DR5-scale record: the best speedup among
    benchmark artifacts whose workload MATCHES the reference's tile
    accounting (tiles_match_reference; earlier records used a smaller
    214-tile rectangle and would overstate the ratio), falling back to
    the best overall if no matched record exists.  Returns
    (basis, ratio, seconds); self-maintaining as new record directories
    are committed."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = bestMatched = None
    for p in glob.glob(os.path.join(here, "docs", "benchmarks", "*",
                                    "results_summary.json")):
        try:
            with open(p) as f:
                d = json.load(f)
            e2e = float(d["end_to_end_s"])
            ref = float(d.get("reference_wallclock_s", 17940.0))
        except Exception:
            continue
        row = (os.path.basename(os.path.dirname(p)), ref / e2e, e2e)
        if best is None or row[1] > best[1]:
            best = row
        if d.get("tiles_match_reference") and (
                bestMatched is None or row[1] > bestMatched[1]):
            bestMatched = row
    if bestMatched is not None:
        return bestMatched
    if best is None:
        return "none committed", 0.0, float("inf")
    return best


def _run(step, args, jax):
    out = step(*args)
    jax.block_until_ready(out)
    return out


def _probe_device(timeoutSec=240):
    """Fail fast if the device runtime is unreachable.

    The remote TPU tunnel can go down for hours; ``jax.devices()`` then
    blocks indefinitely inside PJRT client init.  Probing in a
    subprocess with a timeout turns a hung benchmark into a diagnostic
    JSON line."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeoutSec, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_device():
        print(json.dumps({
            "metric": "production_tile_filter_steps_per_sec_per_chip",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "error": "device runtime unreachable (tunnel down); "
                     "see BENCH history for the last good measurement"}))
        return

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs
    from nemo_tpu.parallel import distribute
    from nemo_tpu.parallel.mesh import get_mesh, tile_sharding

    nf = 2
    ny, nx = 896, 1536          # DR5-like tile (7 x 12 deg at 0.5')
    gridSize = 80               # 40 arcmin noise cells at 0.5' pixels
    trimPix = 240               # reference default: 3 x gridSize
    nTiles = 16                 # batch resident in HBM per step (measured
                                # ~30% faster than 4 on a v5e chip)

    mesh = get_mesh(n_devices=1)
    hostArgs = _example_inputs(nTiles, nf, ny, nx, np.float32, seed=1)
    sh = tile_sharding(mesh)

    def _place():
        from nemo_tpu.ops import noise as noise_ops
        data, noise, fsignal, w, apodM, psMask, surveyMask = hostArgs
        apodB = np.broadcast_to(np.asarray(apodM), (nTiles, ny, nx))
        calib = np.asarray(fsignal) * 2e-4   # known-amplitude templates
        peakYX = np.full((nTiles, 2), ny // 2, dtype=np.int32)
        peakYX[:, 1] = nx // 2
        fgPower = np.full((nTiles, ny, nx // 2 + 1), -np.inf,
                          dtype=np.float32)  # no CMB covariance floor
        meta = noise_ops.cell_meta_batch([(ny, nx)] * nTiles, (ny, nx),
                                         gridSize)
        metaDev = {k: jax.device_put(jnp.asarray(v), sh)
                   for k, v in meta.items()}
        return (jax.device_put(data, sh), jax.device_put(noise, sh),
                jax.device_put(fsignal, sh),
                jax.device_put(jnp.asarray(calib), sh), w,
                jax.device_put(jnp.asarray(apodB), sh),
                jax.device_put(psMask, sh),
                jax.device_put(surveyMask, sh),
                jax.device_put(jnp.asarray(fgPower), sh),
                jax.device_put(jnp.asarray(peakYX), sh),
                metaDev)

    # Warm-up / compile.  The TPU tunnel used here is flaky (transient
    # UNIMPLEMENTED errors, sometimes at device_put); retry placement AND
    # the first step so one hiccup does not void the benchmark run.  The
    # fused Pallas sigma-clip RMS kernel measures 27.7 ms/batch vs 13.2 s
    # for the XLA gather formulation at this exact shape on a real v5e
    # chip (2026-08-16; see ops/noise.py:315) - rms_impl='auto' picks it
    # on TPU and falls back to XLA elsewhere.
    step = None
    stepArgs = None
    nAttempts = 14
    for attempt in range(nAttempts):
        step = distribute.make_sharded_matched_filter_step(
            mesh, gridSize, trimPix,
            rms_impl="auto" if attempt < nAttempts // 2 else "xla")
        try:
            stepArgs = _place()
            _run(step, stepArgs, jax)
            break
        except Exception:
            if attempt == nAttempts - 1:
                raise
            time.sleep(min(60.0, 10.0 * (attempt + 1)))

    # MEDIAN-OF-BATCHES with dispersion (VERDICT r4 next #7): the remote
    # tunnel's rate varied 73-94 steps/s across rounds on identical
    # code, so a single mean cannot distinguish a real 15% regression
    # from link noise.  Each timed batch is nIter steps; the reported
    # rate is the MEDIAN batch rate, with the IQR and raw batch timings
    # in the artifact so the dispersion is visible where the number is.
    onCpu = jax.default_backend() == "cpu"
    nIter = 5 if not onCpu else 2      # steps per timed batch
    nBatches = 7 if not onCpu else 1   # timed batches
    batchSeconds = []
    for _ in range(nBatches):
        t0 = time.time()
        for _ in range(nIter):
            out = step(*stepArgs)
            jax.block_until_ready(out)
        # Some remote TPU runtimes do not block in block_until_ready;
        # force completion with a (tiny) value read so timing is honest.
        try:
            float(np.asarray(out["signalNorm"][0]))
        except Exception:
            pass
        batchSeconds.append(time.time() - t0)
    rates = np.array([nIter * nTiles / s for s in batchSeconds])
    tile_scale_steps_per_sec = float(np.median(rates))
    q1, q3 = (np.percentile(rates, 25), np.percentile(rates, 75)) \
        if len(rates) > 1 else (rates[0], rates[0])
    baseline_cluster_rate = 4480.0 / (4.983 * 3600.0)  # ~0.25 steps/sec
    basis, end_to_end_ratio, record_s = _record_of_record()
    print(json.dumps({
        "metric": "DR5-like 2-freq MMF production tile-scale steps/sec/chip",
        "value": round(tile_scale_steps_per_sec, 4),
        "unit": "tile_scale_steps/sec/chip",
        "value_iqr": [round(float(q1), 2), round(float(q3), 2)],
        "value_batches": [round(float(r), 2) for r in rates],
        "vs_baseline": round(end_to_end_ratio, 2),
        "vs_baseline_basis": "COMMITTED end-to-end DR5-scale record"
                             " (docs/benchmarks/%s, %.1f s), 1 chip vs"
                             " ~300 CPU ranks - a prior measurement, NOT"
                             " derived from this run's kernel rate"
                             " (that ratio is"
                             " kernel_rate_vs_cluster_rate)"
                             % (basis, record_s),
        "kernel_rate_vs_cluster_rate": round(tile_scale_steps_per_sec
                                             / baseline_cluster_rate, 2),
    }))


if __name__ == "__main__":
    main()
