#!/usr/bin/env python
"""nemoModel: paint model sky maps (clusters or point sources) from a
catalog, optionally adding a CMB realisation and white / 1-f noise.

TPU-native rebuild of ``bin/nemoModel``.
"""

import argparse

import numpy as np


def makeParser():
    parser = argparse.ArgumentParser("nemoModel")
    parser.add_argument("catalogFileName",
                        help="Catalog (.fits) of objects to paint.")
    parser.add_argument("templateFileName",
                        help="FITS map defining the pixelisation (e.g. a "
                             "mask or map).")
    parser.add_argument("beamFileName", help="Beam profile text file.")
    parser.add_argument("outputFileName", help="Output FITS map.")
    parser.add_argument("-f", "--frequency-GHz", dest="obsFreqGHz",
                        type=float, default=149.6)
    parser.add_argument("-p", "--profile", dest="profile", default="A10",
                        help="Cluster profile: A10 or B12.")
    parser.add_argument("-C", "--CMB", dest="addCMB", action="store_true",
                        default=False, help="Add a CMB realisation.")
    parser.add_argument("--curved-cmb", dest="curvedCMB",
                        action="store_true", default=False,
                        help="Synthesise the CMB through the curved-sky "
                             "SHT (ops/sht.py) instead of the flat-sky "
                             "GRF - the reference's curvedsky.rand_map "
                             "parity path; slower, exact at all "
                             "declinations.")
    parser.add_argument("--cmb-lmax", dest="cmbLmax", type=int,
                        default=None,
                        help="Band limit for --curved-cmb (default: "
                             "min(spectrum extent, ring Nyquist)).")
    parser.add_argument("-N", "--noise-level", dest="noiseLevel",
                        type=float, default=0.0,
                        help="White noise level (uK per pixel).")
    parser.add_argument("--lknee", dest="lKnee", type=float, default=None,
                        help="If given, add 1/f noise with this knee.")
    parser.add_argument("-s", "--scale-signals", dest="scale", type=float,
                        default=1.0,
                        help="Scale all object amplitudes by this factor.")
    parser.add_argument("-S", "--seed", dest="seed", type=int, default=None)
    parser.add_argument("-M", "--mpi", dest="MPIEnabled",
                        action="store_true", default=False)
    return parser


def main():
    args = makeParser().parse_args()
    from nemo_tpu import maps
    from nemo_tpu.utils import fits as nfits
    from nemo_tpu.utils.tables import Table
    from nemo_tpu.utils.wcs import WCS

    data, header = nfits.read_image(args.templateFileName)
    data = np.asarray(data)
    if data.ndim == 3:
        data = data[0]
    wcs = WCS(header)
    shape = data.shape

    catalog = Table.read(args.catalogFileName)
    modelMap = maps.makeModelImage(shape, wcs, catalog, args.beamFileName,
                                   obsFreqGHz=args.obsFreqGHz,
                                   profile=args.profile)
    if modelMap is None:
        modelMap = np.zeros(shape)
    if args.scale != 1.0:
        modelMap = modelMap * args.scale

    if args.addCMB:
        modelMap = modelMap + maps.simCMBMap(
            shape, wcs, beam=args.beamFileName, seed=args.seed,
            method="curved" if args.curvedCMB else "flat",
            lmax=args.cmbLmax)
    if args.noiseLevel > 0 or args.lKnee is not None:
        noiseSeed = None if args.seed is None else args.seed + 1
        modelMap = modelMap + maps.simNoiseMap(
            shape, args.noiseLevel, wcs=wcs, lKnee=args.lKnee,
            seed=noiseSeed)

    nfits.write_image(args.outputFileName, modelMap, wcs.header)
    print("... wrote %s" % args.outputFileName)


if __name__ == "__main__":
    main()
