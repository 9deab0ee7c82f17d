"""CLI-level tests, driving the bin/ tools like the reference's Robot
Framework suite drives subprocesses (tests/quick.robot)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from nemo_tpu import catalogs
from nemo_tpu.models import beams
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from nemo_tpu.utils import wcs as nwcs

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["NEMO_TPU_PLATFORM"] = "cpu"
    env["NEMO_TPU_X64"] = "1"
    result = subprocess.run([sys.executable,
                             os.path.join(REPO_ROOT, "bin", args[0])]
                            + args[1:], cwd=cwd, env=env,
                            capture_output=True, text=True, timeout=1200)
    if result.returncode != 0:
        raise RuntimeError("CLI failed:\nSTDOUT:%s\nSTDERR:%s"
                           % (result.stdout[-3000:], result.stderr[-3000:]))
    return result


@pytest.fixture(scope="module")
def cli_workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    beam_path = os.path.join(DATA_DIR, "beam_f090.txt")
    if not os.path.exists(beam_path):
        beams.makeGaussianBeamFile(beam_path, 2.1)
    # Template map (blank) defining pixelisation
    shape = (400, 400)
    w = nwcs.makeWCS(shape, 0.5 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    template = str(tmp / "template.fits")
    nfits.write_image(template, np.ones(shape), w.header)
    # Input source catalog
    rng = np.random.default_rng(7)
    n = 8
    xs = rng.uniform(80, 320, n)
    ys = rng.uniform(80, 320, n)
    coords = w.pix2wcs(xs, ys)
    cat = Table({"name": np.array(["s%d" % i for i in range(n)]),
                 "RADeg": coords[:, 0], "decDeg": coords[:, 1],
                 "deltaT_c": rng.uniform(1500, 5000, n)})
    catPath = str(tmp / "inputCatalog.fits")
    cat.write(catPath)
    return {"tmp": tmp, "template": template, "catPath": catPath,
            "beam": beam_path, "wcs": w, "cat": cat, "shape": shape}


def test_nemo_model_cli(cli_workspace):
    ws = cli_workspace
    out = str(ws["tmp"] / "sim_f090.fits")
    _run(["nemoModel", ws["catPath"], ws["template"], ws["beam"], out,
          "-f", "97.8", "-C", "-N", "40", "-S", "99"], cwd=str(ws["tmp"]))
    assert os.path.exists(out)
    data, header = nfits.read_image(out)
    # map contains CMB + noise + sources: std much bigger than noise alone
    assert np.std(data) > 40
    # brightest pixel should be at one of the sources
    iy, ix = np.unravel_index(np.argmax(data), data.shape)
    coords = ws["wcs"].pix2wcs(float(ix), float(iy))
    seps = catalogs.calcAngSepDeg(coords[0], coords[1],
                                  np.asarray(ws["cat"]["RADeg"]),
                                  np.asarray(ws["cat"]["decDeg"]))
    assert seps.min() * 60 < 2.0


def test_nemo_cli_source_run(cli_workspace):
    ws = cli_workspace
    simPath = str(ws["tmp"] / "sim_f090.fits")
    assert os.path.exists(simPath), "run test_nemo_model_cli first"
    configDict = {
        "unfilteredMaps": [
            {"mapFileName": simPath, "weightsFileName": None,
             "obsFreqGHz": 97.8, "units": "uK",
             "beamFileName": ws["beam"]}],
        "thresholdSigma": 5.0, "minObjPix": 1, "findCenterOfMass": True,
        "useInterpolator": True, "rejectBorder": 0, "objIdent": "ACT-S",
        "longNames": False, "removeRings": False, "photFilter": None,
        "outputDir": str(ws["tmp"] / "nemoOut"),
        "mapFilters": [
            {"label": "Beam_f090", "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "saveFilteredMaps": True, "outputUnits": "uK",
                        "edgeTrimArcmin": 10.0}}],
    }
    configPath = str(ws["tmp"] / "sources.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    _run(["nemo", configPath], cwd=str(ws["tmp"]))
    outCat = os.path.join(str(ws["tmp"] / "nemoOut"),
                          "nemoOut_optimalCatalog.fits")
    assert os.path.exists(outCat)
    tab = Table.read(outCat)
    assert len(tab) >= 5
    refM, outM, seps = catalogs.crossMatch(ws["cat"], tab,
                                           radiusArcmin=1.5)
    ratios = np.asarray(outM["deltaT_c"]) / np.asarray(refM["deltaT_c"])
    assert abs(np.mean(ratios) - 1) < 0.1
    # DS9 regions + csv written too
    assert os.path.exists(outCat.replace(".fits", ".reg"))
    assert os.path.exists(outCat.replace(".fits", ".csv"))


def test_nemo_cli_forced_photometry(cli_workspace):
    """nemo -f: measure fluxes at the input-catalog positions instead of
    blind detection (reference bin/nemo:44-47)."""
    ws = cli_workspace
    configPath = str(ws["tmp"] / "sources.yml")
    assert os.path.exists(configPath), "run test_nemo_cli_source_run first"
    _run(["nemo", configPath, "-f", ws["catPath"]], cwd=str(ws["tmp"]))
    outName = "inputCatalog_nemoOut_forcedCatalog.csv"
    outPath = os.path.join(str(ws["tmp"]), outName)
    assert os.path.exists(outPath), os.listdir(str(ws["tmp"]))
    tab = Table.read(outPath)
    # every input position measured, amplitudes recovered
    assert len(tab) == len(ws["cat"])
    refM, outM, _ = catalogs.crossMatch(ws["cat"], tab, radiusArcmin=0.5)
    assert len(refM) == len(ws["cat"])
    ratios = np.asarray(outM["deltaT_c"]) / np.asarray(refM["deltaT_c"])
    assert abs(np.median(ratios) - 1) < 0.15, ratios


def test_nemo_model_scale_flag(cli_workspace):
    """nemoModel -s scales only the y_c column (reference bin/nemoModel
    :207-209: point-source deltaT_c amplitudes are left untouched)."""
    ws = cli_workspace
    # Point-source catalog: -s must be a no-op
    out1 = str(ws["tmp"] / "model_s1.fits")
    out2 = str(ws["tmp"] / "model_s2.fits")
    _run(["nemoModel", ws["catPath"], ws["template"], ws["beam"], out1,
          "-f", "97.8"], cwd=str(ws["tmp"]))
    _run(["nemoModel", ws["catPath"], ws["template"], ws["beam"], out2,
          "-f", "97.8", "-s", "2.0"], cwd=str(ws["tmp"]))
    d1, _ = nfits.read_image(out1)
    d2, _ = nfits.read_image(out2)
    np.testing.assert_allclose(d2, np.asarray(d1), rtol=1e-6, atol=1e-8)
    # Cluster catalog with y_c: painted amplitudes scale linearly
    w = ws["wcs"]
    coords = w.pix2wcs(np.array([150.0, 250.0]), np.array([150.0, 250.0]))
    clTab = Table({"name": np.array(["c0", "c1"]),
                   "RADeg": coords[:, 0], "decDeg": coords[:, 1],
                   "y_c": np.array([3e-5, 5e-5]) * 1e4,
                   "template": np.array(["Arnaud_M2e14_z0p4"] * 2)})
    clPath = str(ws["tmp"] / "clusterCat.fits")
    clTab.write(clPath)
    outC1 = str(ws["tmp"] / "model_cl_s1.fits")
    outC2 = str(ws["tmp"] / "model_cl_s2.fits")
    _run(["nemoModel", clPath, ws["template"], ws["beam"], outC1,
          "-f", "97.8"], cwd=str(ws["tmp"]))
    _run(["nemoModel", clPath, ws["template"], ws["beam"], outC2,
          "-f", "97.8", "-s", "2.0"], cwd=str(ws["tmp"]))
    c1, _ = nfits.read_image(outC1)
    c2, _ = nfits.read_image(outC2)
    np.testing.assert_allclose(np.asarray(c2), 2.0 * np.asarray(c1),
                               rtol=1e-5, atol=1e-7)


def test_nemo_model_pointsources_and_extras(cli_workspace):
    """nemoModel 'pointsources-N' generation, -A/--add-map and
    --split-noise-test (reference bin/nemoModel:77-94,173-188,302-309)."""
    ws = cli_workspace
    out = str(ws["tmp"] / "ps_model.fits")
    _run(["nemoModel", "pointsources-12", ws["template"], ws["beam"],
          out, "-f", "97.8", "-S", "11"], cwd=str(ws["tmp"]))
    inCat = out.replace(".fits", "_inputCatalog.fits")
    assert os.path.exists(inCat)
    tab = Table.read(inCat)
    assert len(tab) == 12
    d, _ = nfits.read_image(out)
    assert np.max(d) > 0
    # -A adds a scaled component map
    extraPath = str(ws["tmp"] / "extra.fits")
    nfits.write_image(extraPath, np.full(ws["shape"], 7.0),
                      ws["wcs"].header)
    out2 = str(ws["tmp"] / "ps_model_plus.fits")
    _run(["nemoModel", inCat, ws["template"], ws["beam"], out2,
          "-f", "97.8", "-A", extraPath, "--add-map-scaling", "2.0"],
         cwd=str(ws["tmp"]))
    d2, _ = nfits.read_image(out2)
    base, _ = nfits.read_image(out)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(base) + 14.0,
                               rtol=1e-5, atol=1e-5)
    # --split-noise-test writes an ivar map with a 4x weight step
    out3 = str(ws["tmp"] / "ps_model_split.fits")
    _run(["nemoModel", inCat, ws["template"], ws["beam"], out3,
          "-f", "97.8", "-C", "-N", "20", "--split-noise-test",
          "-S", "3"], cwd=str(ws["tmp"]))
    wmap, _ = nfits.read_image(out3.replace(".fits", ".ivar.fits"))
    wmap = np.asarray(wmap)
    half = ws["shape"][0] // 2
    assert np.allclose(wmap[half:], 20.0 ** -2)
    assert np.allclose(wmap[:half], 40.0 ** -2)
    d3, _ = nfits.read_image(out3)
    d3 = np.asarray(d3)
    # bottom half carries the extra doubled white noise
    assert np.std(d3[:half]) > np.std(d3[half:])


def test_nemo_model_tiled_painting(cli_workspace):
    """nemoModel -T paints per autotiler tile and stitches - output
    matches the single-shot paint (reference bin/nemoModel:87-90,
    212-264).  Needs a mask taller than the autotiler's 1000-pixel
    stray-blob floor (reference maps.py:735), so paint at 2' pixels
    over 20 deg."""
    ws = cli_workspace
    shape = (1200, 1200)
    w = nwcs.makeWCS(shape, 2.0 / 60.0, centreRADeg=30.0,
                     centreDecDeg=0.0)
    template = str(ws["tmp"] / "template_big.fits")
    nfits.write_image(template, np.ones(shape), w.header)
    rng = np.random.default_rng(5)
    n = 10
    xs = rng.uniform(100, 1100, n)
    ys = rng.uniform(100, 1100, n)
    coords = w.pix2wcs(xs, ys)
    cat = Table({"name": np.array(["b%d" % i for i in range(n)]),
                 "RADeg": coords[:, 0], "decDeg": coords[:, 1],
                 "deltaT_c": rng.uniform(1500, 5000, n)})
    catPath = str(ws["tmp"] / "bigCatalog.fits")
    cat.write(catPath)
    outFlat = str(ws["tmp"] / "model_flat.fits")
    outTiled = str(ws["tmp"] / "model_tiled.fits")
    _run(["nemoModel", catPath, template, ws["beam"],
          outFlat, "-f", "97.8"], cwd=str(ws["tmp"]))
    _run(["nemoModel", catPath, template, ws["beam"],
          outTiled, "-f", "97.8", "-T"], cwd=str(ws["tmp"]))
    d1, _ = nfits.read_image(outFlat)
    d2, _ = nfits.read_image(outTiled)
    d1, d2 = np.asarray(d1), np.asarray(d2)
    assert np.max(np.abs(d2 - d1)) <= 1e-4 * max(np.max(np.abs(d1)), 1)


def test_nemo_tiling_check_flag(cli_workspace):
    """nemo -T prints the tiling and exits before any filtering."""
    ws = cli_workspace
    configDict = {
        "unfilteredMaps": [
            {"mapFileName": ws["template"], "weightsFileName": None,
             "obsFreqGHz": 97.8, "units": "uK",
             "beamFileName": ws["beam"]}],
        "thresholdSigma": 5.0, "photFilter": None,
        "outputDir": str(ws["tmp"] / "tcheck"),
        "mapFilters": [
            {"label": "Beam_f090", "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "outputUnits": "uK"}}],
    }
    configPath = str(ws["tmp"] / "tcheck.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    r = _run(["nemo", configPath, "-T"], cwd=str(ws["tmp"]))
    assert "Tiling check" in r.stdout
    assert "tiles" in r.stdout
    # stopped before filtering: no catalog written
    assert not os.path.exists(os.path.join(
        str(ws["tmp"] / "tcheck"), "tcheck_optimalCatalog.csv"))
