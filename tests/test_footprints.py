"""External-footprint machinery: intersection masks, per-footprint RMS
tables and completeness, and footprint catalog columns (reference
completeness.py:862-946, 1067-1128; pipelines.py:357-451 footprints;
catalogs.py:895-922)."""

import os

import numpy as np
import pytest

from nemo_tpu import catalogs, completeness, pipelines
from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils.tables import Table
from tests.test_cluster_e2e import cluster_run  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def footprint_setup(cluster_run, tmp_path_factory):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    from nemo_tpu.models import qfit
    if not os.path.exists(os.path.join(config.selFnDir, "QFit.fits")):
        qfit.fitQ(config)
    tmp = tmp_path_factory.mktemp("fp")
    # external footprint covering the WESTERN half of the sim area
    areaMask, wcs = completeness.loadAreaMask("PRIMARY", config.selFnDir)
    half = np.zeros(areaMask.shape, dtype=np.uint8)
    half[:, : areaMask.shape[1] // 2] = 1
    fpPath = str(tmp / "halfMask.fits")
    nfits.write_image(fpPath, half, wcs.header)
    config.parDict["selFnFootprints"] = [
        {"label": "HALF", "maskList": [fpPath]}]
    # SelFn reads its config from selFnDir/config.yml - write one that
    # includes the footprint definition (as a real run's config would)
    import yaml
    with open(config.configFileName) as f:
        d = yaml.safe_load(f)
    d["selFnFootprints"] = [{"label": "HALF", "maskList": [fpPath]}]
    dst = os.path.join(config.selFnDir, "config.yml")
    with open(dst, "w") as f:
        yaml.safe_dump(d, f)
    config.configFileName = dst
    fpTab = os.path.join(config.selFnDir, "RMSTab_HALF.fits")
    if not os.path.exists(fpTab):
        pipelines.makeRMSTables(config)
    return config, fpPath, half, wcs


def test_intersection_mask_and_area(footprint_setup):
    config, fpPath, half, wcs = footprint_setup
    mask = completeness.makeIntersectionMask(
        "PRIMARY", config.selFnDir, "HALF", masksList=[fpPath])
    assert mask.shape == half.shape
    # intersection only in the western half
    assert mask[:, mask.shape[1] // 2 + 20:].sum() == 0
    assert mask[:, : mask.shape[1] // 2].sum() > 0
    fullArea = completeness.getTileTotalAreaDeg2("PRIMARY", config.selFnDir)
    halfArea = completeness.getTileTotalAreaDeg2(
        "PRIMARY", config.selFnDir, footprintLabel="HALF")
    assert 0.3 < halfArea / fullArea < 0.7, (halfArea, fullArea)


def test_footprint_rms_table(footprint_setup):
    config, fpPath, half, wcs = footprint_setup
    path = os.path.join(config.selFnDir, "RMSTab_HALF.fits")
    assert os.path.exists(path)
    fpTab = Table.read(path)
    fullTab = Table.read(os.path.join(config.selFnDir, "RMSTab.fits"))
    ratio = (np.sum(np.asarray(fpTab["areaDeg2"]))
             / np.sum(np.asarray(fullTab["areaDeg2"])))
    assert 0.3 < ratio < 0.7, ratio


def test_footprint_selfn_and_completeness(footprint_setup):
    config, fpPath, half, wcs = footprint_setup
    selFn = completeness.SelFn(config.selFnDir, 5.0, footprint="HALF",
                               zMax=1.0, zStep=0.2)
    assert 0 < selFn.totalAreaDeg2
    zi = np.argmin(np.abs(selFn.mockSurvey.z - 0.4))
    comp = selFn.compMz[zi]
    assert comp[0] < 0.2 and comp[-1] > 0.8
    # survey-averaged completeness tables per footprint
    out = completeness.completenessByFootprint(config)
    assert "full" in out and "HALF" in out
    assert os.path.exists(os.path.join(config.diagnosticsDir,
                                       "completeness90pc_HALF.fits"))


def test_footprint_catalog_column(footprint_setup, cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    config, fpPath, half, wcs = footprint_setup
    catalogs.addFootprintColumnToCatalog(cat, "HALF", half, wcs)
    col = np.asarray(cat["footprint_HALF"])
    xs = wcs.wcs2pix(np.asarray(cat["RADeg"], dtype=float),
                     np.asarray(cat["decDeg"], dtype=float))[:, 0]
    west = xs < half.shape[1] // 2
    assert np.array_equal(col, west)
