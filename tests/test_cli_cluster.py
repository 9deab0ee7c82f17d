"""Full CLI cluster workflow, driving the bin/ tools as subprocesses:
nemo (with Q fit + selFn) -> nemoMass -> nemoMock -> nemoCatalogCheck.
The CLI analogue of quick.robot's cluster + mass tests."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

import jax

from nemo_tpu import catalogs, maps
from nemo_tpu.models import beams
from nemo_tpu.ops import grf
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from nemo_tpu.utils import wcs as nwcs

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHAPE = (480, 480)


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["NEMO_TPU_PLATFORM"] = "cpu"
    env["NEMO_TPU_X64"] = "1"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bin", args[0])] + args[1:],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200)
    if result.returncode != 0:
        raise RuntimeError("CLI failed: %s\nSTDOUT:%s\nSTDERR:%s"
                           % (args, result.stdout[-2000:],
                              result.stderr[-2000:]))
    return result


def _beam(name, fwhm):
    path = os.path.join(DATA_DIR, name)
    if not os.path.exists(path):
        beams.makeGaussianBeamFile(path, fwhm)
    return path


@pytest.fixture(scope="module")
def cluster_cli_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_cl")
    w = nwcs.makeWCS(SHAPE, 0.5 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    beam_path = _beam("beam_f150.txt", 1.4)
    rng = np.random.default_rng(3)
    n = 6
    xs = rng.uniform(90, 390, n)
    ys = rng.uniform(90, 390, n)
    coords = w.pix2wcs(xs, ys)
    inputTab = Table({
        "name": np.array(["cl%d" % i for i in range(n)]),
        "RADeg": coords[:, 0], "decDeg": coords[:, 1],
        "y_c": rng.uniform(3, 8, n),
        "template": np.array(["Arnaud_M2e14_z0p4"] * n)})
    model = maps.makeModelImage(SHAPE, w, inputTab, beam_path,
                                obsFreqGHz=149.6)
    beam = beams.BeamProfile(beamFileName=beam_path)
    pix = maps.pixScalesRad(w, SHAPE)
    cmb = np.asarray(grf.sim_cmb_map(jax.random.PRNGKey(9), SHAPE, pix,
                                     beamBell=beam.Bell, beamEll=beam.ell,
                                     noiseLevel=25.0))
    simPath = str(tmp / "sim_f150.fits")
    nfits.write_image(simPath, cmb + model, w.header)

    # Redshift catalog for nemoMass
    zTab = Table({"name": np.asarray(inputTab["name"]),
                  "RADeg": np.asarray(inputTab["RADeg"]),
                  "decDeg": np.asarray(inputTab["decDeg"]),
                  "redshift": np.full(n, 0.4),
                  "redshiftErr": np.zeros(n)})
    zPath = str(tmp / "redshifts.fits")
    zTab.write(zPath)

    outDir = str(tmp / "nemoOut")
    configDict = {
        "unfilteredMaps": [
            {"mapFileName": simPath, "weightsFileName": None,
             "obsFreqGHz": 149.6, "units": "uK",
             "beamFileName": beam_path}],
        "thresholdSigma": 4.0, "minObjPix": 1, "findCenterOfMass": True,
        "useInterpolator": True, "rejectBorder": 0, "objIdent": "ACT-CL",
        "longNames": False, "removeRings": False,
        "photFilter": "Arnaud_M2e14_z0p4",
        "fitQ": True,
        "calcSelFn": True,
        "selFnOptions": {"fixedSNRCut": 5.0, "method": "fast",
                         "QSource": "fit"},
        "outputDir": outDir,
        "massOptions": {"tenToA0": 4.95e-5, "B0": 0.08, "Mpivot": 3.0e14,
                        "sigma_int": 0.2, "relativisticCorrection": True,
                        "rescaleFactor": 0.69, "rescaleFactorErr": 0.07,
                        "transferFunction": "eisenstein_hu",
                        "redshiftCatalog": zPath},
        "mapFilters": [
            {"label": "Arnaud_M2e14_z0p4",
             "class": "ArnaudModelMatchedFilter",
             "params": {"M500MSun": 2.0e14, "z": 0.4,
                        "noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "outputUnits": "yc", "edgeTrimArcmin": 10.0,
                        "saveFilteredMaps": True, "saveRMSMap": True}}],
    }
    configPath = str(tmp / "clusters.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    _run(["nemo", configPath], cwd=str(tmp))
    return {"tmp": tmp, "configPath": configPath, "outDir": outDir,
            "inputTab": inputTab, "zPath": zPath, "w": w}


def test_nemo_cluster_outputs(cluster_cli_run):
    ws = cluster_cli_run
    outCat = os.path.join(ws["outDir"], "nemoOut_optimalCatalog.fits")
    assert os.path.exists(outCat)
    tab = Table.read(outCat)
    refM, outM, _ = catalogs.crossMatch(ws["inputTab"], tab,
                                        radiusArcmin=1.5)
    assert len(refM) >= 5
    # selFn products from -S epilogue
    selFnDir = os.path.join(ws["outDir"], "selFn")
    for f in ("QFit.fits", "RMSTab.fits", "fRelWeights.fits",
              "areaMask.fits", "config.yml"):
        assert os.path.exists(os.path.join(selFnDir, f)), f
    # completeness table written by calcSelFn
    assert os.path.exists(os.path.join(ws["outDir"], "diagnostics",
                                       "completeness90pc_full.fits"))


def test_nemo_mass_cli(cluster_cli_run):
    ws = cluster_cli_run
    _run(["nemoMass", ws["configPath"]], cwd=str(ws["tmp"]))
    massPath = os.path.join(ws["outDir"], "nemoOut_mass.fits")
    assert os.path.exists(massPath)
    tab = Table.read(massPath)
    assert "M500c" in tab.keys()
    assert "M500cCal" in tab.keys()
    good = np.asarray(tab["M500c"]) > 0
    assert good.sum() >= 4
    # masses should be cluster scale (input y_c 3-8e-4 at z=0.4)
    assert 0.5 < np.median(np.asarray(tab["M500c"])[good]) < 20


def test_nemo_mock_cli(cluster_cli_run):
    ws = cluster_cli_run
    mocksDir = str(ws["tmp"] / "mocks")
    _run(["nemoMock", os.path.join(ws["outDir"], "selFn"), mocksDir,
          "-s", "123"], cwd=str(ws["tmp"]))
    mockPath = os.path.join(mocksDir, "mockCatalog_1.fits")
    assert os.path.exists(mockPath)
    mock = Table.read(mockPath)
    assert len(mock) > 0
    assert "true_M500c" in mock.keys()


def test_nemo_catalog_check_cli(cluster_cli_run):
    ws = cluster_cli_run
    extPath = str(ws["tmp"] / "extCatalog.fits")
    Table({"name": np.asarray(ws["inputTab"]["name"]),
           "RADeg": np.asarray(ws["inputTab"]["RADeg"]),
           "decDeg": np.asarray(ws["inputTab"]["decDeg"])}).write(extPath)
    result = _run(["nemoCatalogCheck", ws["configPath"], extPath],
                  cwd=str(ws["tmp"]))
    # reference wording (bin/nemoCatalogCheck:67,87-88)
    assert "are in the valid area mask for" in result.stdout
    assert "are found within" in result.stdout
    assert "are NOT found within" in result.stdout
    assert "written missed objects table" in result.stdout
    # all 6 injected clusters land in the mask; none should be missed
    assert "6/6 objects" in result.stdout
    inMaskPath = ws["tmp"] / "extCatalog_inMask_clusters.fits"
    assert inMaskPath.exists()
    assert len(Table.read(str(inMaskPath))) == 6
