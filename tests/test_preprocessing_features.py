"""Preprocessing features not covered elsewhere: catalog-driven point-source
masking+infill (reference maps.py:378-459), TAN reprojection of tiles
(maps.py:161), and extended-source mask construction (maps.py:2474-2533)."""

import os

import numpy as np
import pytest
import yaml

import jax

from nemo_tpu import maps, pipelines, startup
from nemo_tpu.models import beams
from nemo_tpu.ops import grf
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from nemo_tpu.utils import wcs as nwcs

SHAPE = (560, 560)
PIX_ARCMIN = 0.5


@pytest.fixture(scope="module")
def src_sim(tmp_path_factory):
    """Single-band sim with two bright point sources at known positions."""
    tmp = tmp_path_factory.mktemp("prep")
    w = nwcs.makeWCS(SHAPE, PIX_ARCMIN / 60.0, centreRADeg=30.0,
                     centreDecDeg=0.0)
    beamPath = str(tmp / "beam.txt")
    beams.makeGaussianBeamFile(beamPath, 2.1)
    inputTab = Table({
        "name": np.array(["srcA", "srcB"]),
        "RADeg": np.array([30.3, 29.7]),
        "decDeg": np.array([0.3, -0.3]),
        "deltaT_c": np.array([9000.0, 7000.0]),
        "rArcmin": np.array([5.0, 5.0])})
    model = maps.makeModelImage(SHAPE, w, inputTab, beamPath)
    pix = maps.pixScalesRad(w, SHAPE)
    beam = beams.BeamProfile(beamFileName=beamPath)
    cmb = np.asarray(grf.sim_cmb_map(jax.random.PRNGKey(2), SHAPE, pix,
                                     beamBell=beam.Bell, beamEll=beam.ell,
                                     noiseLevel=40.0))
    simPath = str(tmp / "sim.fits")
    nfits.write_image(simPath, cmb + model, w.header)
    catPath = str(tmp / "brightSources.fits")
    inputTab.write(catPath)
    return tmp, w, beamPath, simPath, catPath, inputTab


def _config(tmp, simPath, beamPath, outName, **extra):
    cfg = {
        "unfilteredMaps": [
            {"mapFileName": simPath, "weightsFileName": None,
             "obsFreqGHz": 97.8, "units": "uK", "beamFileName": beamPath}],
        "thresholdSigma": 5.0, "minObjPix": 1, "objIdent": "ACT-S",
        "removeRings": False, "photFilter": None,
        "outputDir": str(tmp / outName),
        "mapFilters": [
            {"label": "Beam", "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "saveFilteredMaps": False, "outputUnits": "uK",
                        "edgeTrimArcmin": 10.0}}],
    }
    cfg.update(extra)
    path = str(tmp / ("%s.yml" % outName))
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return startup.NemoConfig(path, writeTileInfo=True)


def test_mask_point_sources_from_catalog(src_sim):
    tmp, w, beamPath, simPath, catPath, inputTab = src_sim
    from nemo_tpu import catalogs
    # baseline: both sources detected
    config = _config(tmp, simPath, beamPath, "nomask")
    cat0 = pipelines.filterMapsAndMakeCatalogs(config)
    m0, _, _ = catalogs.crossMatch(inputTab, cat0, radiusArcmin=1.5)
    assert len(m0) == 2
    # with catalog-driven masking: neither detected (masked + infilled)
    config = _config(tmp, simPath, beamPath, "masked",
                     maskPointSourcesFromCatalog=[catPath])
    cat1 = pipelines.filterMapsAndMakeCatalogs(config)
    if len(cat1) > 0:
        m1, _, _ = catalogs.crossMatch(inputTab, cat1, radiusArcmin=1.5)
        assert len(m1) == 0
    # the survey / point-source masks record the masked holes (reference
    # maps.py:378-459 semantics: holes leave flagMask untouched)
    mapDict = config.unfilteredMapsDictList[0]
    mapDict.preprocess(tileName="PRIMARY",
                       diagnosticsDir=config.diagnosticsDir)
    ps = np.asarray(mapDict["pointSourceMask"])
    assert (ps == 0).sum() > 0
    # holes were in-filled from the background, not left as bright peaks
    data = np.asarray(mapDict["data"])
    assert np.abs(data[ps == 0]).max() < 2000.0


def test_reproject_to_tan(src_sim):
    tmp, w, beamPath, simPath, catPath, inputTab = src_sim
    from nemo_tpu import catalogs
    config = _config(tmp, simPath, beamPath, "tan", reprojectToTan=True)
    cat = pipelines.filterMapsAndMakeCatalogs(config)
    # positions still recovered on the TAN-reprojected tile
    m, rec, seps = catalogs.crossMatch(inputTab, cat, radiusArcmin=1.5)
    assert len(m) == 2
    assert np.max(seps) < 1.0
    # the tile WCS really is TAN now
    mapDict = config.unfilteredMapsDictList[0]
    mapDict.preprocess(tileName="PRIMARY",
                       diagnosticsDir=config.diagnosticsDir)
    assert "TAN" in str(mapDict["wcs"].header.get("CTYPE1"))


def test_make_extended_source_mask(src_sim):
    tmp, w, beamPath, simPath, catPath, inputTab = src_sim
    # add a large extended blob to a copy of the sim
    data, header = nfits.read_image(simPath)
    yy, xx = np.mgrid[:SHAPE[0], :SHAPE[1]]
    blob = 3000.0 * np.exp(-((yy - 150) ** 2 + (xx - 400) ** 2)
                           / (2 * 30.0 ** 2))
    extPath = str(tmp / "sim_ext.fits")
    nfits.write_image(extPath, np.asarray(data) + blob, header)
    config = _config(tmp, extPath, beamPath, "ext",
                     findAndMaskExtended={"thresholdSigma": 5.0,
                                          "bigScaleDeg": 1.0,
                                          "smallScaleDeg": 0.1,
                                          "dilationPix": 2})
    extendedMask = maps.makeExtendedSourceMask(config, "PRIMARY")
    assert extendedMask[150, 400] > 0          # blob masked
    assert extendedMask.mean() < 0.25          # but not most of the map
    # mask file written and wired into the map dicts
    out = os.path.join(config.diagnosticsDir, "extendedMask",
                       "PRIMARY.fits")
    assert os.path.exists(out)
    assert config.unfilteredMapsDictList[0]["extendedMask"] is not None
