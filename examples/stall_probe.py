"""Tunnel/runtime stall reproducer (VERDICT r4 next #1 follow-up).

The DR5-scale survey runs show an almost-exact ~50-55 s off-CPU stall
once per ~75-100 s of sustained traffic (round-5 budgets: wall_s -
cpu_s with near-zero timed buckets, alternating chunks).  Round-4
probes with (a) continuous 1 MB device_put round trips and (b) 288 MB
upload + FFT + free cycles did NOT reproduce it.  This probe adds the
survey's remaining ingredients in one cycle, to isolate which one
triggers the stall:

  per cycle (mimics one engine chunk):
    1. device_put ~190 MB of fresh host arrays (data + masks),
    2. enqueue N_LABELS executions of a compiled multi-output step
       against the resident arrays, bounding enqueue depth at 4 like
       the engine (block on the lagging execution's tiny output),
    3. coalesce the tiny per-label outputs into one stacked download.

Prints one line per cycle (wall, cpu, phase splits); a stalled cycle
shows wall >> cpu with the excess in a named phase.

Usage: python examples/stall_probe.py [nCycles] [--labels N] [--mb M]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("nCycles", nargs="?", type=int, default=30)
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--ny", type=int, default=900)
    ap.add_argument("--nx", type=int, default=2500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    nT, ny, nx = args.tiles, args.ny, args.nx

    @jax.jit
    def step(data, mask, seed):
        # FFT-heavy multi-output program, detect-step-sized work
        f = jnp.fft.rfft2(data * mask[:, None])
        filtered = jnp.fft.irfft2(f * jnp.conj(f) /
                                  (jnp.abs(f) + 1e-3), s=(ny, nx))
        m = filtered.sum(axis=1)
        top = jax.lax.top_k(m.reshape(nT, -1), 64)[0]
        return {"n": jnp.sum(m > seed), "top": top,
                "stat": jnp.stack([m.mean(), m.std()])}

    rng = np.random.default_rng(0)
    print("cycle wall cpu upload enqueue lag gather", flush=True)
    for c in range(args.nCycles):
        t0, c0 = time.time(), time.process_time()
        data = rng.normal(0, 1, (nT, 2, ny, nx)).astype(np.float32)
        mask = (rng.random((nT, ny, nx)) > 0.01).astype(np.float32)
        tU0 = time.time()
        dataDev = jax.device_put(data)
        maskDev = jax.device_put(mask)
        tU = time.time() - tU0

        tE0 = time.time()
        outs = []
        tLag = 0.0
        for i in range(args.labels):
            out = step(dataDev, maskDev, float(i))
            outs.append(out)
            if len(outs) >= 4:
                tl0 = time.time()
                outs[-4]["n"].block_until_ready()
                tLag += time.time() - tl0
        tE = time.time() - tE0 - tLag

        tG0 = time.time()
        stacked = jnp.stack([o["top"] for o in outs])
        tops = np.asarray(stacked)
        ns = [int(o["n"]) for o in outs]
        tG = time.time() - tG0
        del outs, dataDev, maskDev, stacked

        wall, cpu = time.time() - t0, time.process_time() - c0
        flag = "  <-- STALL" if wall - cpu - tU - tE - tLag - tG > 10 \
            else ""
        print("%3d %6.1f %5.1f %6.1f %7.1f %5.1f %6.1f%s"
              % (c, wall, cpu, tU, tE, tLag, tG, flag), flush=True)
        assert tops.shape[0] == args.labels and len(ns) == args.labels


if __name__ == "__main__":
    main()
