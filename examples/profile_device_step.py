"""Per-op wall-clock breakdown of the production device step.

Answers the round-3 verdict's open performance questions with
measurements on the real chip (VERDICT r3 "What's weak" #1/#3/#5):

* where the per-chunk residual (logged as "download" in round 3) really
  goes: filter build/apply vs detection vs sub-pixel reads vs pixel
  window vs link transfers;
* the benchmark-step rate (bench.py's metric) next to the detect-mode
  production step at the actual DR5 chunk shape (8 tiles x 16 labels at
  (900, 1728));
* link microbenchmarks (RTT + bandwidth both directions) so
  latency-bound vs bandwidth-bound claims are numbers, not guesses.

Writes ONE JSON document (to stdout and --out), suitable for committing
under docs/benchmarks/.  Run with JAX_PLATFORMS=tpu on the real chip;
runs on CPU too (for smoke-testing the script itself).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timeit(fn, nIter=6, nWarm=2):
    """Median wall-clock of fn() with block_until_ready, after warmup."""
    import jax
    for _ in range(nWarm):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(nIter):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nT", type=int, default=8, help="tiles per chunk")
    ap.add_argument("--nf", type=int, default=2)
    ap.add_argument("--ny", type=int, default=900)
    ap.add_argument("--nx", type=int, default=1728)
    ap.add_argument("--gridSize", type=int, default=80)
    ap.add_argument("--nLabels", type=int, default=16)
    ap.add_argument("--out", default=None, help="write JSON here too")
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace into this dir")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs
    from nemo_tpu.ops import detect as detect_ops
    from nemo_tpu.ops import noise as noise_ops
    from nemo_tpu.parallel import distribute
    from nemo_tpu.parallel.mesh import get_mesh, tile_sharding

    nT, nf, ny, nx = args.nT, args.nf, args.ny, args.nx
    gridSize = args.gridSize
    res = {"backend": jax.default_backend(),
           "shape": [nT, nf, ny, nx], "gridSize": gridSize,
           "nLabels": args.nLabels}

    mesh = get_mesh(n_devices=1)
    sh = tile_sharding(mesh)
    host = _example_inputs(nT, nf, ny, nx, np.float32, seed=1)
    data, noiseA, fsignal, w, apodM, psMask, surveyMask = host
    apodB = np.broadcast_to(np.asarray(apodM), (nT, ny, nx))
    calib = np.asarray(fsignal) * 2e-4
    peakYX = np.full((nT, 2), ny // 2, dtype=np.int32)
    peakYX[:, 1] = nx // 2
    fgPower = np.full((nT, ny, nx // 2 + 1), -np.inf, dtype=np.float32)
    meta = noise_ops.cell_meta_batch([(ny, nx)] * nT, (ny, nx), gridSize)
    metaDev = {k: jax.device_put(jnp.asarray(v), sh)
               for k, v in meta.items()}
    stepArgs = (jax.device_put(data, sh), jax.device_put(noiseA, sh),
                jax.device_put(fsignal, sh),
                jax.device_put(jnp.asarray(calib), sh), w,
                jax.device_put(jnp.asarray(apodB), sh),
                jax.device_put(psMask, sh),
                jax.device_put(surveyMask, sh),
                jax.device_put(jnp.asarray(fgPower), sh),
                jax.device_put(jnp.asarray(peakYX), sh), metaDev)

    detectParams = (4.0, 128, 128, False, 16)

    # --- 1. bench.py's step (full outputs, no detect) -------------------
    stepBench = distribute.make_sharded_matched_filter_step(
        mesh, gridSize, 0, rms_impl="auto")
    res["bench_step_s"] = _timeit(lambda: stepBench(*stepArgs),
                                  nIter=args.iters)
    res["bench_tile_scale_steps_per_s"] = nT / res["bench_step_s"]

    # --- 2. lean-outputs step (accumulate mode) -------------------------
    stepLean = distribute.make_sharded_matched_filter_step(
        mesh, gridSize, 0, rms_impl="auto", lean_outputs=True)
    res["lean_step_s"] = _timeit(lambda: stepLean(*stepArgs),
                                 nIter=args.iters)

    # --- 3. production detect-mode step (what DR5 runs) ------------------
    stepDet = distribute.make_sharded_matched_filter_step(
        mesh, gridSize, 0, rms_impl="auto", detect_params=detectParams)
    res["detect_step_s"] = _timeit(lambda: stepDet(*stepArgs),
                                   nIter=args.iters)
    res["chunk_device_s_estimate"] = res["detect_step_s"] * args.nLabels

    out = stepDet(*stepArgs)
    SNMap = jax.block_until_ready(out["SNMap"])
    filtered = out["filtered"]

    # --- 4. detection alone, and its two halves --------------------------
    detFn = jax.jit(lambda m: detect_ops.detect_objects_batch(
        m, 4.0, max_objects=128, n_iter=128))
    res["detect_objects_s"] = _timeit(lambda: detFn(SNMap),
                                      nIter=args.iters)
    labFn = jax.jit(jax.vmap(
        lambda m: detect_ops.label_components(m > 4.0, n_iter=128)))
    res["label_components_s"] = _timeit(lambda: labFn(SNMap),
                                        nIter=args.iters)
    det1 = jax.jit(lambda m: detect_ops.detect_objects_batch(
        m, 4.0, max_objects=128, n_iter=1))
    res["detect_niter1_s"] = _timeit(lambda: det1(SNMap),
                                     nIter=args.iters)

    # --- 5. sub-pixel spline reads alone ---------------------------------
    ys = jnp.asarray(np.random.default_rng(0)
                     .uniform(40, ny - 40, (nT, 128)).astype(np.float32))
    xs = jnp.asarray(np.random.default_rng(1)
                     .uniform(40, nx - 40, (nT, 128)).astype(np.float32))
    splFn = jax.jit(jax.vmap(lambda sn, fm, yy, xx: detect_ops.spline_values(
        jnp.stack([sn, fm]), yy, xx, window=16)))
    res["spline_reads_s"] = _timeit(lambda: splFn(SNMap, filtered, ys, xs),
                                    nIter=args.iters)

    # --- 6. pixel-window undo alone ---------------------------------------
    maskB = jnp.ones((nT, ny, nx), dtype=jnp.float32)
    undoFn = jax.jit(jax.vmap(distribute._undo_pixel_window_masked))
    res["undo_pixel_window_s"] = _timeit(lambda: undoFn(filtered, maskB),
                                         nIter=args.iters)

    # --- 7. RMS cells alone ------------------------------------------------
    rmsFn = jax.jit(lambda m: noise_ops.grid_rms_map_batch(
        m, gridSize, impl="auto", return_cells=True, meta=metaDev))
    res["rms_cells_s"] = _timeit(lambda: rmsFn(filtered), nIter=args.iters)

    # --- 8. link microbenchmarks -------------------------------------------
    link = {}
    for label, nbytes in (("1KB", 1024), ("100KB", 100 * 1024),
                          ("1MB", 1024 ** 2), ("10MB", 10 * 1024 ** 2)):
        n = nbytes // 4
        hostA = np.zeros(n, dtype=np.float32)
        devA = jax.block_until_ready(jax.device_put(hostA))
        t0 = time.time()
        for _ in range(3):
            devA = jax.device_put(hostA)
            devA.block_until_ready()
        link["upload_%s_s" % label] = (time.time() - t0) / 3
        t0 = time.time()
        for _ in range(3):
            np.asarray(devA)
        link["download_%s_s" % label] = (time.time() - t0) / 3
    res["link"] = link

    # --- 9. optional trace ---------------------------------------------------
    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(stepDet(*stepArgs))
        res["trace_dir"] = args.trace

    doc = json.dumps(res, indent=2)
    print(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")


if __name__ == "__main__":
    main()
