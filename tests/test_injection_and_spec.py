"""Source-injection test, SED extraction, mass-limit maps - exercising the
nemo -I / nemoSpec / calcSelFn epilogue paths on the cluster sim."""

import os

import numpy as np
import pytest

from nemo_tpu import catalogs, completeness, maps, pipelines
from nemo_tpu.utils.tables import Table
from tests.test_cluster_e2e import cluster_run  # noqa: F401  (fixture)


def _ensure_outputs(config, cat):
    """Write the optimal catalog + QFit like bin/nemo does, which the
    injection test and selFn epilogue consume."""
    from nemo_tpu import catalogs
    from nemo_tpu.models import qfit
    catPath = os.path.join(
        config.rootOutDir, "%s_optimalCatalog.fits"
        % os.path.split(config.rootOutDir)[-1])
    if not os.path.exists(catPath):
        catalogs.writeCatalog(cat, catPath)
    if not os.path.exists(os.path.join(config.selFnDir, "QFit.fits")):
        qfit.fitQ(config)


def test_source_injection_test(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_outputs(config, cat)
    config.parDict["sourceInjectionIterations"] = 1
    config.parDict["sourcesPerTile"] = 40
    config.parDict["sourceInjectionModels"] = [
        {"redshift": 0.4, "M500": 2.0e14}]
    config.parDict["seed"] = 333
    injTab = maps.sourceInjectionTest(config)
    assert len(injTab) > 10
    for col in ("SNR", "rArcmin", "inFlux", "outFlux", "theta500Arcmin"):
        assert col in injTab.keys()
    # Input catalog written for completeness use
    assert os.path.exists(os.path.join(config.selFnDir,
                                       "sourceInjectionInputCatalog.fits"))
    # recovered fluxes correlate with inputs
    r = np.corrcoef(np.asarray(injTab["inFlux"]),
                    np.asarray(injTab["outFlux"]))[0, 1]
    assert r > 0.7
    bright = np.asarray(injTab["SNR"]) > 8
    if bright.sum() >= 5:
        # bright amplitude recovery at the few-percent level; injected
        # clusters recover slightly high at moderate SNR (noise-selection
        # flux boosting - the effect the reference's optimization-bias
        # model corrects, MockSurvey.py:357-627)
        ratios = (np.asarray(injTab["outFlux"])[bright]
                  / np.asarray(injTab["inFlux"])[bright])
        assert 0.95 < np.median(ratios) < 1.08, np.median(ratios)
        # median positional offset well inside the reference's 12 arcsec
        # tolerance (tests/point_sources.robot:9-13)
        assert np.median(np.asarray(injTab["rArcmin"])[bright]) \
            < 12.0 / 60.0

    # Position recovery analysis runs and writes the model
    out = maps.positionRecoveryAnalysis(
        injTab, os.path.join(config.diagnosticsDir, "posRec.pdf"),
        pickleFileName=os.path.join(config.diagnosticsDir, "posRec.pkl"),
        selFnDir=config.selFnDir)
    assert 99.7 in out
    # Noise bias analysis runs
    nb = maps.noiseBiasAnalysis(injTab)
    assert "params" in nb

    # save injection data so SelFn injection method could use it
    injTab.write(os.path.join(config.selFnDir, "sourceInjectionData.fits"))


def test_extract_spec_cap(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    tab = Table({"name": np.asarray(inputTab["name"]),
                 "RADeg": np.asarray(inputTab["RADeg"]),
                 "decDeg": np.asarray(inputTab["decDeg"]),
                 "template": np.array(["Arnaud_M2e14_z0p4"]
                                      * len(inputTab))})
    spec = pipelines.extractSpec(config, tab, method="CAP",
                                 diskRadiusArcmin=4.0)
    assert len(spec) == len(tab)
    assert "diskT_uKArcmin2_150" in spec.keys()
    assert "diskT_uKArcmin2_98" in spec.keys()
    # Clusters are decrements at 98/150 GHz: median disk flux negative
    assert np.median(np.asarray(spec["diskT_uKArcmin2_150"])) < 0
    # diskSNR sign convention makes decrements positive significance
    assert np.median(np.asarray(spec["diskSNR_150"])) > 0


def test_mass_limit_map(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_outputs(config, cat)
    config.parDict.setdefault("selFnOptions", {})
    config.parDict["selFnOptions"].update(
        {"fixedSNRCut": 5.0, "massLimitMaps": [{"z": 0.5}]})
    completeness.makeMassLimitMapsAndPlots(config)
    path = os.path.join(config.diagnosticsDir, "PRIMARY",
                        "massLimitMap_z0p5#PRIMARY.fits")
    assert os.path.exists(path)
    from nemo_tpu.utils import fits as nfits
    data, _ = nfits.read_image(path)
    valid = data[data > 0]
    assert len(valid) > 0
    # limits should be cluster-scale masses in 1e14 MSun units
    assert 0.3 < np.median(valid) < 30
    # stitched quarter-res quicklook + plot (reference epilogue)
    reproj = os.path.join(config.diagnosticsDir,
                          "reproj_massLimitMap_z0p5.fits")
    assert os.path.exists(reproj)
    rdata, _ = nfits.read_image(reproj)
    assert 0.3 < np.median(rdata[rdata > 0]) < 30
    assert os.path.exists(reproj.replace(".fits", ".pdf"))


def test_extract_spec_matched_filter(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    tab = Table({"name": np.asarray(inputTab["name"])[:3],
                 "RADeg": np.asarray(inputTab["RADeg"])[:3],
                 "decDeg": np.asarray(inputTab["decDeg"])[:3],
                 "template": np.array(["Arnaud_M2e14_z0p4"] * 3)})
    import os as _os
    cwd = _os.getcwd()
    _os.chdir(str(config.rootOutDir))
    try:
        spec = pipelines.extractSpec(config, tab, method="matchedFilter")
    finally:
        _os.chdir(cwd)
    assert len(spec) >= 2
    # per-frequency y_c columns present; cluster decrements mean y_c > 0
    assert "y_c_150" in spec.keys() or "y_c_149" in spec.keys() or \
        any(k.startswith("y_c_") for k in spec.keys())
    ycCols = [k for k in spec.keys() if k.startswith("y_c_")]
    assert len(ycCols) == 2
    for k in ycCols:
        assert np.median(np.asarray(spec[k])) > 0


def test_sky_sim_contamination(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_outputs(config, cat)
    sims = maps.estimateContaminationFromSkySim(config, numSkySims=1)
    assert len(sims) == 1
    # Source-free sims should yield far fewer detections than the real run
    assert len(sims[0]) < max(len(cat), 1) + 3
    out = maps.estimateContamination(sims[0], cat, ["SNR"], "skySim")
    assert "skySim_SNR" in out


def test_inverted_map_contamination(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_outputs(config, cat)
    inv = maps.estimateContaminationFromInvertedMaps(config)
    # inverted maps: no real clusters appear as positive detections
    if len(inv) > 0:
        refM, _, _ = catalogs.crossMatch(inputTab, inv, radiusArcmin=1.0)
        assert len(refM) == 0


def _ensure_injection_data(config, cat):
    """Run the source-injection test if selFnDir lacks injection data with
    enough theta500 scales for the injection-Q spline (>= 4 bins; the
    reference injects a range of cluster scales for the same reason)."""
    _ensure_outputs(config, cat)
    dataPath = os.path.join(config.selFnDir, "sourceInjectionData.fits")
    if os.path.exists(dataPath):
        existing = Table.read(dataPath)
        if len(np.unique(np.round(
                np.asarray(existing["theta500Arcmin"]), 3))) >= 4:
            return dataPath
    config.parDict["sourceInjectionIterations"] = 1
    config.parDict["sourcesPerTile"] = 25
    config.parDict["sourceInjectionModels"] = [
        {"redshift": 0.4, "M500": 0.8e14},
        {"redshift": 0.4, "M500": 2.0e14},
        {"redshift": 0.4, "M500": 5.0e14},
        {"redshift": 0.2, "M500": 8.0e14}]
    config.parDict["seed"] = 334
    injTab = maps.sourceInjectionTest(config)
    injTab.write(dataPath)
    return dataPath


def test_qfit_injection_and_hybrid(cluster_run):  # noqa: F811
    """QSource='injection' and 'hybrid' interpolators built from the
    injection-sim outputs (reference: signals.py:140-347 QSource modes)."""
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_injection_data(config, cat)
    from nemo_tpu.models.qfit import QFit
    Qinj = QFit(QSource="injection", selFnDir=config.selFnDir)
    assert Qinj.zDependent is False
    # Injected model == photFilter template, so Q near the model's own
    # theta500 (~2.4' for M5e14... here ~1.9' at z=0.4, M2e14) should be ~1
    thetas = np.array([1.0, 1.9, 3.0])
    qv = Qinj.getQ(thetas)
    assert np.all(qv >= 0)
    assert 0.5 < qv[1] < 1.5
    # Hybrid: fit Q at small theta grafted onto injection Q at large theta
    Qhyb = QFit(QSource="hybrid", selFnDir=config.selFnDir)
    qh = Qhyb.getQ(thetas)
    assert np.all(qh >= 0)
    assert 0.5 < qh[1] < 1.5


def test_selfn_injection_method(cluster_run):  # noqa: F811
    """SelFn(method='injection'): completeness grid from the injection-sim
    completeness(theta, y0) surface (reference: completeness.py:393-423)."""
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_injection_data(config, cat)
    if not os.path.exists(os.path.join(config.selFnDir, "RMSTab.fits")):
        pipelines.makeRMSTables(config)
    if not os.path.exists(os.path.join(config.selFnDir, "fRelWeights.fits")):
        completeness.getFRelWeights(config)
    import shutil
    dst = os.path.join(config.selFnDir, "config.yml")
    if not os.path.exists(dst):
        shutil.copy(configPath, dst)
    selFn = completeness.SelFn(config.selFnDir, 5.0, zMax=2.0, zStep=0.1,
                               method="injection", QSource="injection")
    assert selFn.compMz.shape == (len(selFn.mockSurvey.z),
                                  len(selFn.mockSurvey.log10M))
    assert np.all(selFn.compMz >= 0) and np.all(selFn.compMz <= 1)
    # Low-mass end incomplete, high-mass end complete at moderate z
    zi = np.argmin(np.abs(selFn.mockSurvey.z - 0.4))
    comp_z04 = selFn.compMz[zi]
    assert comp_z04[0] < 0.2
    assert comp_z04[-1] > 0.8
    # update() with a different cosmology reruns the injection path
    before = selFn.compMz.copy()
    selFn.update(70.0, 0.32, 0.05, 0.82, 0.95)
    assert not np.allclose(before, selFn.compMz)


def test_nemospec_cli(cluster_run, tmp_path):  # noqa: F811
    """bin/nemoSpec end to end incl. redshift cross-matching
    (reference: bin/nemoSpec:71-121)."""
    import sys
    from nemo_tpu.cli import nemoSpec_main
    inputTab, cat, config, simDir, w, configPath = cluster_run
    catPath = str(tmp_path / "targets.fits")
    Table({"name": np.asarray(inputTab["name"])[:3],
           "RADeg": np.asarray(inputTab["RADeg"])[:3],
           "decDeg": np.asarray(inputTab["decDeg"])[:3]}).write(catPath)
    zPath = str(tmp_path / "redshifts.fits")
    Table({"name": np.asarray(inputTab["name"])[:3],
           "RADeg": np.asarray(inputTab["RADeg"])[:3],
           "decDeg": np.asarray(inputTab["decDeg"])[:3],
           "redshift": np.array([0.3, 0.5, 0.7])}).write(zPath)
    outPath = str(tmp_path / "targets_spec.fits")
    argv = sys.argv
    cwd = os.getcwd()
    os.chdir(str(config.rootOutDir))
    try:
        sys.argv = ["nemoSpec", configPath, catPath, "-m", "CAP",
                    "-o", outPath, "-z", zPath]
        nemoSpec_main.main()
    finally:
        sys.argv = argv
        os.chdir(cwd)
    assert os.path.exists(outPath)
    spec = Table.read(outPath)
    assert len(spec) == 3
    assert any("diskT" in k or "diskSNR" in k or k.startswith("y")
               for k in spec.keys())
    assert "redshift" in spec.keys()
    assert sorted(np.asarray(spec["redshift"]).tolist()) == [0.3, 0.5, 0.7]
