"""Contamination estimate for the DR5-scale benchmark (VERDICT r4 next
#4): run the finder on sign-inverted maps with the record run's cached
filters (`maps.estimateContaminationFromInvertedMaps`, the reference's
`nemo/maps.py:1589-1619` diagnostic) and commit the contamination
fraction vs S/N next to the benchmark.

Noise is sign-symmetric, clusters are not: everything detected in the
inverted maps at a given S/N estimates the spurious-candidate rate at
that S/N in the real run.

Usage (after examples/dr5_scale_benchmark.py has completed in the same
workDir, leaving its cached filters + catalog):

    python examples/dr5_contamination.py <workDir> [outJson] [everyNth]

``everyNth`` > 1 runs the inverted pass on every Nth tile (spread
across the survey's declination bands) and compares against the real
catalog restricted to the same tiles: the contamination FRACTION is a
per-area statistic, so a spread subsample estimates it with ~1/sqrt(n)
counting error at a fraction of the wall-clock (the full inverted pass
is a second full filtering stage).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    workDir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dr5scale"
    outJson = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        workDir, "out", "diagnostics", "contamination.json")
    everyNth = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    configPath = os.path.join(workDir, "dr5scale.yml")

    import time
    from nemo_tpu import maps, startup
    from nemo_tpu.utils.tables import Table

    t0 = time.time()
    config = startup.NemoConfig(configPath, writeTileInfo=False)
    tileSubset = None
    if everyNth > 1:
        tileSubset = set(config.tileNames[::everyNth])
        config.tileNames = sorted(tileSubset)
        print("... inverted pass on %d / %d tiles (every %dth)"
              % (len(config.tileNames), len(config.allTileNames),
                 everyNth), flush=True)
    invertedCatalog = maps.estimateContaminationFromInvertedMaps(config)
    elapsed = time.time() - t0

    realCat = Table.read(os.path.join(workDir, "out",
                                      "out_optimalCatalog.fits"))
    if tileSubset is not None:
        keep = np.array([t in tileSubset
                         for t in np.asarray(realCat["tileName"])])
        realCat = realCat[keep]
    snInv = np.asarray(invertedCatalog["SNR"], dtype=float) \
        if len(invertedCatalog) else np.array([])
    snReal = np.asarray(realCat["SNR"], dtype=float)

    rows = []
    for cut in (4.0, 4.5, 5.0, 5.5, 6.0, 7.0, 8.0, 10.0):
        nInv = int((snInv >= cut).sum())
        nReal = int((snReal >= cut).sum())
        rows.append({"SNRCut": cut, "invertedN": nInv, "realN": nReal,
                     "contaminationFraction":
                         (nInv / nReal) if nReal else None})

    artifact = {"method": "invertedMaps (cached filters)",
                "wallclock_s": round(elapsed, 1),
                "tiles": len(config.tileNames),
                "tiles_total": len(config.allTileNames),
                "rows": rows}
    os.makedirs(os.path.dirname(outJson), exist_ok=True)
    with open(outJson, "w") as f:
        json.dump(artifact, f, indent=1)

    print("## DR5-scale contamination (inverted maps, %.0f s)\n"
          % elapsed)
    print("| S/N cut | inverted-map detections | real detections | "
          "contamination |")
    print("|---|---|---|---|")
    for r in rows:
        frac = "n/a" if r["contaminationFraction"] is None \
            else "%.2f%%" % (100 * r["contaminationFraction"])
        print("| %.1f | %d | %d | %s |"
              % (r["SNRCut"], r["invertedN"], r["realN"], frac))
    print("\nartifact: %s" % outJson)


if __name__ == "__main__":
    main()
