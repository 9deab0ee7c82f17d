"""tileNoiseRegions: per-tile noise-region boxes for the real-space
matched filter (reference docs/config.rst "tileNoiseRegions",
examples/sources/PS_f220_nightOnly.yml:142; consumed via the
NRAMIN/NRAMAX/NDEMIN/NDEMAX tile headers at reference
filters.py:1084-1086)."""

import os

import numpy as np
import yaml

from nemo_tpu import filters, startup
from nemo_tpu.models import beams
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils import wcs as nwcs
from nemo_tpu.utils.wcs import WCS

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _config(tmp_path):
    shape = (600, 720)  # 10 x 12 deg at 1'
    w = nwcs.makeWCS(shape, 1.0 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    beam_path = os.path.join(DATA_DIR, "beam_f090.txt")
    if not os.path.exists(beam_path):
        beams.makeGaussianBeamFile(beam_path, 2.1)
    simPath = str(tmp_path / "sim.fits")
    rng = np.random.default_rng(3)
    nfits.write_image(simPath, rng.normal(0, 50, shape), w.header)
    configDict = {
        "unfilteredMaps": [
            {"mapFileName": simPath, "obsFreqGHz": 97.8, "units": "uK",
             "beamFileName": beam_path}],
        "thresholdSigma": 5.0, "minObjPix": 1, "findCenterOfMass": True,
        "useInterpolator": True, "rejectBorder": 0, "removeRings": False,
        "photFilter": None,
        "outputDir": str(tmp_path / "out"),
        "useTiling": True,
        "tileOverlapDeg": 0.5,
        "tileDefinitions": [
            {"tileName": "T0", "RADecSection": [33.0, 27.0, -5.0, 0.0]},
            {"tileName": "T1", "RADecSection": [33.0, 27.0, 0.0, 5.0]}],
        "tileNoiseRegions": {"autoBorderDeg": 0.5,
                             "T0": [32.0, 28.0, -4.0, -1.0]},
        "mapFilters": [
            {"label": "Beam_f090", "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "outputUnits": "uK", "edgeTrimArcmin": 0.0}}],
    }
    configPath = str(tmp_path / "tnr.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    return startup.NemoConfig(configPath)


def test_tile_noise_region_headers(tmp_path):
    config = _config(tmp_path)
    # explicit entry passes through verbatim
    h0 = config.tileCoordsDict["T0"]["header"]
    assert [h0["NRAMIN"], h0["NRAMAX"], h0["NDEMIN"], h0["NDEMAX"]] == \
        [32.0, 28.0, -4.0, -1.0]
    # no entry: the tile's own definition region minus autoBorderDeg
    # (docs/config.rst), preserving the section's edge ordering
    h1 = config.tileCoordsDict["T1"]["header"]
    assert [h1["NRAMIN"], h1["NRAMAX"], h1["NDEMIN"], h1["NDEMAX"]] == \
        [32.5, 27.5, 0.5, 4.5]


def test_resolve_radec_section_reads_headers(tmp_path):
    config = _config(tmp_path)
    fObj = object.__new__(filters.RealSpaceMatchedFilter)
    fObj.params = {"noiseParams": {"RADecSection": "tileNoiseRegions"}}
    fObj.tileName = "T0"
    fObj.wcs = WCS(config.tileCoordsDict["T0"]["header"])
    assert fObj._resolveRADecSection() == [32.0, 28.0, -4.0, -1.0]
    # headers absent (config had no tileNoiseRegions): a clear error,
    # not a KeyError from deep inside the kernel build
    fObj.wcs = WCS({k: v for k, v in
                    dict(config.tileCoordsDict["T0"]["header"]).items()
                    if not k.startswith(("NRA", "NDE"))})
    try:
        fObj._resolveRADecSection()
        assert False, "expected ValueError"
    except ValueError as e:
        assert "tileNoiseRegions" in str(e)
