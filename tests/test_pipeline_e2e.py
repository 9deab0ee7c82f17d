"""End-to-end closed-loop tests, mirroring the reference's quick.robot
strategy (tests/quick.robot:44-68): simulate a sky with known objects +
CMB + white noise, run the full pipeline, verify unbiased recovery, then
subtract the recovered model and check the residual matches the input
noise level.
"""

import os

import numpy as np
import pytest
import yaml

import jax

from nemo_tpu import catalogs, maps, pipelines, startup
from nemo_tpu.models import beams, profiles, sz
from nemo_tpu.ops import fourier, grf
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from nemo_tpu.utils import wcs as nwcs

import jax.numpy as jnp

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
NOISE_UK = 100.0
SHAPE = (520, 520)
PIX_ARCMIN = 0.5


def _beam(name, fwhm):
    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, name)
    if not os.path.exists(path):
        beams.makeGaussianBeamFile(path, fwhm)
    return path


def _make_source_sim(simDir, seed=1234, numSources=12):
    """Point-source sim: known catalog + CMB + white noise, saved as FITS."""
    os.makedirs(simDir, exist_ok=True)
    w = nwcs.makeWCS(SHAPE, PIX_ARCMIN / 60.0, centreRADeg=30.0,
                     centreDecDeg=0.0)
    beam_path = _beam("beam_f090.txt", 2.1)

    rng = np.random.default_rng(seed)
    # Bright sources, positions away from edges (>25 pix) and separated
    margin = 60
    ny, nx = SHAPE
    xs, ys = [], []
    while len(xs) < numSources:
        x = rng.uniform(margin, nx - margin)
        y = rng.uniform(margin, ny - margin)
        if len(xs) == 0 or np.min(np.hypot(np.array(xs) - x,
                                           np.array(ys) - y)) > 40:
            xs.append(x)
            ys.append(y)
    coords = w.pix2wcs(np.array(xs), np.array(ys))
    amps = rng.uniform(1000, 5000, numSources)  # uK, strong
    inputTab = Table({"name": np.array(["src_%d" % i
                                        for i in range(numSources)]),
                      "RADeg": coords[:, 0], "decDeg": coords[:, 1],
                      "deltaT_c": amps})
    inputTab.write(os.path.join(simDir, "inputCatalog.fits"))

    model = maps.makeModelImage(SHAPE, w, inputTab, beam_path)
    key = jax.random.PRNGKey(seed)
    beam = beams.BeamProfile(beamFileName=beam_path)
    pix = maps.pixScalesRad(w, SHAPE)
    cmb = np.asarray(grf.sim_cmb_map(key, SHAPE, pix, beamBell=beam.Bell,
                                     beamEll=beam.ell,
                                     noiseLevel=NOISE_UK))
    signal_free = cmb
    data = signal_free + model
    nfits.write_image(os.path.join(simDir, "sim_f090.fits"), data, w.header)
    nfits.write_image(os.path.join(simDir, "signal_free_f090.fits"),
                      signal_free, w.header)
    return inputTab, w, beam_path


def _source_config(simDir, outDir):
    return {
        "unfilteredMaps": [
            {"mapFileName": os.path.join(simDir, "sim_f090.fits"),
             "weightsFileName": None, "obsFreqGHz": 97.8, "units": "uK",
             "beamFileName": _beam("beam_f090.txt", 2.1)}],
        "thresholdSigma": 5.0,
        "minObjPix": 1,
        "findCenterOfMass": True,
        "useInterpolator": True,
        "rejectBorder": 0,
        "objIdent": "ACT-S",
        "longNames": False,
        "removeRings": False,
        "photFilter": None,
        "outputDir": outDir,
        "mapFilters": [
            {"label": "Beam_f090",
             "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "saveFilteredMaps": True,
                        "outputUnits": "uK",
                        "edgeTrimArcmin": 10.0}}],
    }


@pytest.fixture(scope="module")
def source_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_src")
    simDir = str(tmp / "sim")
    outDir = str(tmp / "out")
    inputTab, w, beam_path = _make_source_sim(simDir)
    configDict = _source_config(simDir, outDir)
    configPath = str(tmp / "config.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    config = startup.NemoConfig(configPath, writeTileInfo=True)
    optimalCatalog = pipelines.filterMapsAndMakeCatalogs(
        config, writeAreaMask=True, writeFlagMask=True)
    return inputTab, optimalCatalog, config, simDir, w, beam_path


def test_source_recovery_unbiased(source_run):
    """Recovered source amplitudes match inputs (quick.robot:40-46,
    tolerance informed by tests/point_sources.robot's 1% on real data)."""
    inputTab, cat, config, simDir, w, beam_path = source_run
    assert len(cat) >= 8, "Missed too many injected sources"
    refM, outM, seps = catalogs.crossMatch(inputTab, cat, radiusArcmin=1.5)
    assert len(refM) >= 8
    ratios = np.asarray(outM["deltaT_c"]) / np.asarray(refM["deltaT_c"])
    # Bootstrap-style check: mean ratio within 3 sigma of 1
    mean = ratios.mean()
    err = ratios.std(ddof=1) / np.sqrt(len(ratios))
    assert abs(mean - 1) < max(3 * err, 0.05), (mean, err)
    # Median position offset small (point_sources.robot: <= 12 arcsec)
    assert np.median(seps) * 60 < 12


def test_source_positions_and_fluxJy(source_run):
    inputTab, cat, config, simDir, w, beam_path = source_run
    assert "fluxJy" in cat.keys()
    assert np.all(np.asarray(cat["fluxJy"]) > 0)


def test_end_to_end_subtraction_residual(source_run):
    """Paint the recovered model, subtract from the sim, and check the
    residual against the signal-free map is consistent with zero signal
    (quick.robot:55-68 / NemoTests.py:377-386)."""
    inputTab, cat, config, simDir, w, beam_path = source_run
    data, _ = nfits.read_image(os.path.join(simDir, "sim_f090.fits"))
    signal_free, _ = nfits.read_image(
        os.path.join(simDir, "signal_free_f090.fits"))
    model = maps.makeModelImage(SHAPE, w, cat, beam_path)
    residual = np.asarray(data) - model - np.asarray(signal_free)
    # Residual where sources were: should be small compared to source amps
    inner = residual[60:-60, 60:-60]
    assert np.abs(inner).max() < 0.2 * np.asarray(
        inputTab["deltaT_c"]).max()
    # sigma of (data - model) should be close to the signal-free map sigma
    diff = np.asarray(data) - model
    s1 = np.std(diff[60:-60, 60:-60])
    s0 = np.std(np.asarray(signal_free)[60:-60, 60:-60])
    assert abs(s1 - s0) / s0 < 0.02


def test_area_mask_written(source_run):
    inputTab, cat, config, simDir, w, beam_path = source_run
    path = os.path.join(config.selFnDir, "areaMask.fits")
    assert os.path.exists(path)
    from nemo_tpu import completeness
    areaMask, wcs2 = completeness.loadAreaMask("PRIMARY", config.selFnDir)
    assert areaMask.shape == SHAPE
    assert areaMask.max() == 1


def test_forced_photometry_pipeline(source_run, tmp_path):
    inputTab, cat, config, simDir, w, beam_path = source_run
    config.parDict["forcedPhotometryCatalog"] = inputTab
    forcedCat = pipelines.filterMapsAndMakeCatalogs(
        config, useCachedFilteredMaps=True)
    config.parDict["forcedPhotometryCatalog"] = None
    assert len(forcedCat) >= 10
    refM, outM, _ = catalogs.crossMatch(inputTab, forcedCat,
                                        radiusArcmin=0.5)
    ratios = np.asarray(outM["deltaT_c"]) / np.asarray(refM["deltaT_c"])
    assert abs(np.mean(ratios) - 1) < 0.05
