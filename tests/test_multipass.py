"""Multi-pass filterSets test: pass 1 finds point sources with a beam
filter, pass 2 subtracts them from the maps and the filter noise term, then
finds clusters (the reference's quickstart-multipass configuration,
tests/configs/quickstart-multipass.yml:80-117)."""

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
SHAPE = (520, 520)
PIX = 0.5


def _beam(name, fwhm):
    path = os.path.join(DATA_DIR, name)
    if not os.path.exists(path):
        beams.makeGaussianBeamFile(path, fwhm)
    return path


@pytest.fixture(scope="module")
def multipass_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multipass")
    w = nwcs.makeWCS(SHAPE, PIX / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    beam_path = _beam("beam_f150.txt", 1.4)
    rng = np.random.default_rng(21)
    pixr = maps.pixScalesRad(w, SHAPE)

    # clusters
    nCl = 6
    xs = rng.uniform(100, 420, nCl)
    ys = rng.uniform(100, 420, nCl)
    coords = w.pix2wcs(xs, ys)
    clusterTab = Table({
        "name": np.array(["cl%d" % i for i in range(nCl)]),
        "RADeg": coords[:, 0], "decDeg": coords[:, 1],
        "y_c": rng.uniform(3, 8, nCl),  # 1e-4 units, strong
        "template": np.array(["Arnaud_M2e14_z0p4"] * nCl)})
    clModel = maps.makeModelImage(SHAPE, w, clusterTab, beam_path,
                                  obsFreqGHz=149.6)

    # bright point sources (contaminate the cluster search)
    nSrc = 8
    xs2 = rng.uniform(100, 420, nSrc)
    ys2 = rng.uniform(100, 420, nSrc)
    coords2 = w.pix2wcs(xs2, ys2)
    srcTab = Table({"name": np.array(["s%d" % i for i in range(nSrc)]),
                    "RADeg": coords2[:, 0], "decDeg": coords2[:, 1],
                    "deltaT_c": rng.uniform(2000, 8000, nSrc)})
    srcModel = maps.makeModelImage(SHAPE, w, srcTab, beam_path)

    beam = beams.BeamProfile(beamFileName=beam_path)
    cmb = np.asarray(grf.sim_cmb_map(jax.random.PRNGKey(2), SHAPE, pixr,
                                     beamBell=beam.Bell, beamEll=beam.ell,
                                     noiseLevel=30.0))
    simPath = str(tmp / "sim_f150.fits")
    nfits.write_image(simPath, cmb + clModel + srcModel, w.header)

    configDict = {
        "unfilteredMaps": [
            {"mapFileName": simPath, "weightsFileName": None,
             "obsFreqGHz": 149.6, "units": "uK",
             "beamFileName": beam_path}],
        "thresholdSigma": 4.0, "minObjPix": 1, "findCenterOfMass": True,
        "useInterpolator": True, "rejectBorder": 0,
        "longNames": False, "removeRings": False,
        "photFilter": "Arnaud_M2e14_z0p4",
        "outputDir": str(tmp / "out"),
        "filterSetOptions": {
            1: {"label": "sources", "saveCatalog": True,
                "thresholdSigma": 5.0, "objIdent": "ACT-S"},
            2: {"label": "clusters", "saveCatalog": True,
                "objIdent": "ACT-CL",
                "subtractModelFromSets": [1],
                "noiseModelCatalogFromSets": [1]},
        },
        "mapFilters": [
            {"label": "Beam_f150", "class": "BeamMatchedFilter",
             "filterSets": [1],
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "outputUnits": "uK", "edgeTrimArcmin": 10.0,
                        "saveFilteredMaps": False}},
            {"label": "Arnaud_M2e14_z0p4",
             "class": "ArnaudModelMatchedFilter",
             "filterSets": [2],
             "params": {"M500MSun": 2.0e14, "z": 0.4,
                        "noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "outputUnits": "yc", "edgeTrimArcmin": 10.0,
                        "saveFilteredMaps": True, "saveRMSMap": True}},
        ],
    }
    configPath = str(tmp / "multipass.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    config = startup.NemoConfig(configPath, writeTileInfo=True)
    catalog = pipelines.filterMapsAndMakeCatalogs(config)
    return clusterTab, srcTab, catalog, config


def test_multipass_sets_identified(multipass_run):
    clusterTab, srcTab, catalog, config = multipass_run
    assert config.filterSets == [1, 2]


def test_multipass_source_pass(multipass_run):
    clusterTab, srcTab, catalog, config = multipass_run
    srcCat = config.filterSetOptions[1]["catalog"]
    assert len(srcCat) >= 6
    refM, outM, _ = catalogs.crossMatch(srcTab, srcCat, radiusArcmin=1.5)
    assert len(refM) >= 6
    # catalog was saved with its label
    assert os.path.exists(os.path.join(config.rootOutDir,
                                       "sources_catalog.fits"))


def test_multipass_device_batching_parity(multipass_run):
    """useDeviceBatching + noiseModelCatalogFromSets: pass 2's filter
    carries noiseModelCatalog in its params, so it must fall back to the
    host engine (ADVICE r1 high: the batched path would silently skip the
    noise-model subtraction).  The final catalog must match the host run."""
    clusterTab, srcTab, hostCatalog, hostConfig = multipass_run
    with open(hostConfig.configFileName) as f:
        configDict = yaml.safe_load(f)
    outDir = hostConfig.rootOutDir + "_batched"
    configDict["outputDir"] = outDir
    configDict["useDeviceBatching"] = True
    configPath = os.path.join(os.path.dirname(hostConfig.configFileName),
                              "multipass_batched.yml")
    with open(configPath, "w") as f:
        yaml.safe_dump(configDict, f)
    config = startup.NemoConfig(configPath, writeTileInfo=True)
    catalog = pipelines.filterMapsAndMakeCatalogs(config)
    # pass 2's effective filter carries the pass-1 noise-model catalog and
    # must be rejected by the batched-path eligibility gate
    from nemo_tpu.parallel import engine
    config.setFilterSet(2)
    f2 = next(fd for fd in config.parDict["mapFilters"]
              if fd["label"] == "Arnaud_M2e14_z0p4")
    assert f2["params"].get("noiseModelCatalog")
    assert not engine.eligibleForBatch(f2, config.parDict)
    # host and batched runs agree on the detections and amplitudes
    hM, bM, _ = catalogs.crossMatch(hostCatalog, catalog, radiusArcmin=0.5)
    assert len(hM) == len(hostCatalog) == len(catalog)
    ratios = np.asarray(bM["fixed_y_c"]) / np.asarray(hM["fixed_y_c"])
    assert np.max(np.abs(ratios - 1)) < 0.02, ratios


def test_multipass_cluster_pass_clean(multipass_run):
    clusterTab, srcTab, catalog, config = multipass_run
    # final pass finds the clusters...
    refM, outM, _ = catalogs.crossMatch(clusterTab, catalog,
                                        radiusArcmin=1.5)
    assert len(refM) >= 5
    # ...and the subtracted point sources do not appear as detections
    srcM, _, _ = catalogs.crossMatch(srcTab, catalog, radiusArcmin=1.0)
    assert len(srcM) <= 2
    # recovered amplitudes in the right ballpark despite source subtraction
    ratios = np.asarray(outM["fixed_y_c"]) / np.asarray(refM["y_c"])
    assert 0.7 < np.mean(ratios) < 1.2
