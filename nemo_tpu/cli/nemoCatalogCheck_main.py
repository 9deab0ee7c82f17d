#!/usr/bin/env python
"""nemoCatalogCheck: cross-check an external catalog against a nemo run.

TPU-native rebuild of ``bin/nemoCatalogCheck``: reports which objects in
the external catalog fall in the survey area, which were detected, and
which are missing.
"""

import argparse
import os

import numpy as np


def makeParser():
    parser = argparse.ArgumentParser("nemoCatalogCheck")
    parser.add_argument("configFileName")
    parser.add_argument("catFileName", help="External catalog (.fits).")
    parser.add_argument("-r", "--radius-arcmin", dest="radiusArcmin",
                        type=float, default=2.5)
    return parser


def main():
    args = makeParser().parse_args()
    from nemo_tpu import catalogs, completeness, startup
    from nemo_tpu.utils.tables import Table

    config = startup.NemoConfig(args.configFileName, makeOutputDirs=False,
                                setUpMaps=False, verbose=False)
    optimalCatalogFileName = os.path.join(
        config.rootOutDir, "%s_optimalCatalog.fits"
        % os.path.split(config.rootOutDir)[-1])
    nemoTab = Table.read(optimalCatalogFileName)
    extTab = Table.read(args.catFileName)
    raKey, decKey = catalogs.getTableRADecKeys(extTab)

    selFn = completeness.SelFn(config.selFnDir, 5.0,
                               configFileName=args.configFileName,
                               enableCompletenessCalc=False,
                               setUpAreaMask=True)
    inMask = selFn.checkCoordsInAreaMask(np.asarray(extTab[raKey]),
                                         np.asarray(extTab[decKey]))
    inAreaTab = extTab[inMask]
    print(">>> %d/%d objects in the external catalog fall in the survey "
          "area" % (len(inAreaTab), len(extTab)))
    matchedExt, matchedNemo, seps = catalogs.crossMatch(
        inAreaTab, nemoTab, radiusArcmin=args.radiusArcmin)
    print(">>> %d/%d matched against the nemo catalog"
          % (len(matchedExt), len(inAreaTab)))
    missing = catalogs.removeCrossMatched(inAreaTab, nemoTab,
                                          radiusArcmin=args.radiusArcmin)
    if len(missing) > 0:
        print(">>> Missing objects:")
        for row in missing:
            print("... %s (RA, dec) = (%.6f, %.6f)"
                  % (row.get("name", "?"), row[raKey], row[decKey]))


if __name__ == "__main__":
    main()
