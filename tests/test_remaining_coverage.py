"""Coverage for the remaining subsystems: injection-derived Q, SelFn
injection method inputs, beam transform files, contamination estimators,
RMSTab downsampling, biweight estimator."""

import os

import numpy as np
import pytest

from nemo_tpu import completeness, filters
from nemo_tpu.models import beams
from nemo_tpu.models.qfit import QFit
from nemo_tpu.utils.tables import Table


def _write_injection_data(selFnDir, rng):
    """Synthetic source-injection results: completeness follows a smooth
    S/N threshold, Q(theta) falls off at large scales."""
    theta500s = np.array([1.0, 2.0, 4.0, 8.0])
    rows_inj = {k: [] for k in ("theta500Arcmin", "SNR", "inFlux",
                                "outFlux")}
    rows_inp = {k: [] for k in ("theta500Arcmin", "inFlux")}
    for t in theta500s:
        qTrue = np.exp(-((np.log(t / 2.5)) ** 2))  # peaked near ref scale
        inFlux = rng.uniform(0.5, 10, 400)
        noise = 0.5
        outFlux = inFlux * qTrue + rng.normal(0, noise / 3, 400)
        snr = outFlux / noise
        detected = snr > 2.0
        rows_inp["theta500Arcmin"] += [t] * 400
        rows_inp["inFlux"] += list(inFlux)
        rows_inj["theta500Arcmin"] += [t] * int(detected.sum())
        rows_inj["SNR"] += list(snr[detected])
        rows_inj["inFlux"] += list(inFlux[detected])
        rows_inj["outFlux"] += list(outFlux[detected])
    injTab = Table({k: np.array(v) for k, v in rows_inj.items()})
    inputTab = Table({k: np.array(v) for k, v in rows_inp.items()})
    injTab.write(os.path.join(selFnDir, "sourceInjectionData.fits"))
    inputTab.write(os.path.join(selFnDir,
                                "sourceInjectionInputCatalog.fits"))
    return theta500s


def test_qfit_injection_source(tmp_path):
    rng = np.random.default_rng(4)
    selFnDir = str(tmp_path)
    theta500s = _write_injection_data(selFnDir, rng)
    Q = QFit(QSource="injection", selFnDir=selFnDir)
    qs = Q.getQ(theta500s)
    # Q ~ median(outFlux/inFlux): peaked near 2.5', lower at extremes
    assert qs[1] > qs[0] * 0.9
    assert qs[1] > qs[3]
    assert np.all(qs >= 0)


def test_parse_source_injection_data(tmp_path):
    rng = np.random.default_rng(5)
    selFnDir = str(tmp_path)
    _write_injection_data(selFnDir, rng)
    injTab = Table.read(os.path.join(selFnDir, "sourceInjectionData.fits"))
    inputTab = Table.read(os.path.join(selFnDir,
                                       "sourceInjectionInputCatalog.fits"))
    theta500s, binCentres, compGrid, thetaQ = \
        completeness._parseSourceInjectionData(injTab, inputTab, SNRCut=5.0)
    assert compGrid.shape == (len(theta500s), len(binCentres))
    # completeness rises with flux for each scale
    for i in range(len(theta500s)):
        row = compGrid[i]
        valid = row > 0
        if valid.sum() > 10:
            assert row[valid][-3:].mean() > row[valid][:3].mean()
    assert np.all(thetaQ > 0)


def test_beam_transform_file_input(tmp_path):
    # (ell, B_ell) format beam file (delta ell = 1, first col spacing >= 1)
    sigma = np.radians(1.4 / 60) / (2 * np.sqrt(2 * np.log(2)))
    ell = np.arange(0, 20000, dtype=float)
    Bell = np.exp(-(ell ** 2) * sigma ** 2 / 2)
    path = str(tmp_path / "beam_tform.txt")
    np.savetxt(path, np.column_stack([ell, Bell]))
    beam = beams.BeamProfile(beamFileName=path)
    # FWHM recovered from the synthesised real-space profile
    assert abs(beam.FWHMArcmin - 1.4) < 0.1
    assert abs(beam.profile1d[0] - 1.0) < 1e-6


def test_biweight_scale():
    rng = np.random.default_rng(6)
    vals = rng.normal(0, 3.0, 5000)
    s = filters._biweight_scale(vals)
    assert abs(s / 3.0 - 1) < 0.05
    # robust to outliers
    vals2 = np.concatenate([vals, np.full(50, 100.0)])
    s2 = filters._biweight_scale(vals2)
    assert abs(s2 / 3.0 - 1) < 0.06


def test_downsample_rms_tab():
    rng = np.random.default_rng(7)
    y0 = np.sort(rng.uniform(1e-5, 5e-5, 500))
    area = rng.uniform(0.001, 0.01, 500)
    tab = Table({"y0RMS": y0, "areaDeg2": area})
    down = completeness.downsampleRMSTab(tab)
    assert len(down) < len(tab)
    # total area preserved
    assert abs(np.sum(down["areaDeg2"]) - np.sum(area)) < 1e-10


def test_contamination_estimator(tmp_path):
    from nemo_tpu import maps
    real = Table({"SNR": np.concatenate([np.full(50, 6.0),
                                         np.full(10, 12.0)])})
    sim = Table({"SNR": np.full(5, 6.0)})
    out = maps.estimateContamination(sim, real, ["SNR"], "skySim",
                                     diagnosticsDir=str(tmp_path))
    tab = out["skySim_SNR"]
    assert np.all(np.asarray(tab["contaminationRate"]) <= 1.0)
    assert np.asarray(tab["contaminationRate"])[0] > 0
    assert os.path.exists(os.path.join(
        str(tmp_path), "contaminationEstimate_skySim_SNR.fits"))


def test_whole_map_rms_shape():
    import jax.numpy as jnp
    from nemo_tpu.ops import noise as noise_ops
    rng = np.random.default_rng(8)
    m = rng.normal(0, 5.0, (64, 64))
    out = np.asarray(noise_ops.whole_map_rms(jnp.asarray(m)))
    assert out.shape == m.shape
    assert abs(out[0, 0] / 5.0 - 1) < 0.15


def test_noise_mask_catalog_routed_to_filters(tmp_path):
    """Global noiseMaskCatalog lands in every filter's params and feeds the
    noise-model subtraction machinery (reference startUp.py:93-95)."""
    import yaml
    from nemo_tpu import startup
    cfg = {
        "unfilteredMaps": [
            {"mapFileName": "x.fits", "obsFreqGHz": 97.8, "units": "uK",
             "beamFileName": "b.txt"}],
        "noiseMaskCatalog": "bright_sources.fits",
        "mapFilters": [
            {"label": "Beam", "class": "BeamMatchedFilter",
             "params": {"noiseParams": {"method": "dataMap",
                                        "noiseGridArcmin": 40.0},
                        "outputUnits": "uK"}}],
    }
    path = str(tmp_path / "c.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    parDict = startup.parseConfigFile(path)
    p = parDict["mapFilters"][0]["params"]
    assert p["noiseMaskCatalog"] == "bright_sources.fits"
    assert "bright_sources.fits" in p["noiseModelCatalog"]


def test_halt_on_position_recovery_flag_default():
    import yaml, tempfile, os
    from nemo_tpu import startup
    cfg = {"unfilteredMaps": [
        {"mapFileName": "x.fits", "obsFreqGHz": 97.8, "units": "uK",
         "beamFileName": "b.txt"}],
        "mapFilters": []}
    with tempfile.NamedTemporaryFile("w", suffix=".yml",
                                     delete=False) as f:
        yaml.safe_dump(cfg, f)
        path = f.name
    parDict = startup.parseConfigFile(path)
    os.remove(path)
    assert parDict.get("haltOnPositionRecoveryProblem") is False


def test_photometry_parity_helpers(tmp_path):
    """Module-level reference-API helpers (photometry.py:460-553,
    maps.py:652-688,2371)."""
    import numpy as np

    from nemo_tpu import maps, photometry
    from nemo_tpu.utils import fits as nfits
    from nemo_tpu.utils import wcs as nwcs

    ann = photometry.makeAnnulus(3, 6)
    assert ann.shape == (12, 12) and ann.dtype == np.int64
    r = np.sqrt((np.arange(12)[None, :] - 6) ** 2
                + (np.arange(12)[:, None] - 6) ** 2)
    assert np.array_equal(ann, ((r > 3) & (r < 6)).astype(np.int64))

    d = np.zeros((16, 20))
    pd = photometry.getPixelsDistanceMap({"x": 10, "y": 8}, d)
    assert pd[8, 10] == 0 and pd[8, 13] == 3

    w = nwcs.makeWCS((16, 20), 0.5 / 60.0, centreRADeg=30.0,
                     centreDecDeg=-10.0)
    ra, dec = w.pix2wcs(10, 8)
    rd = photometry.getRadialDistanceMap(
        {"x": 10, "y": 8, "RADeg": ra, "decDeg": dec}, d, w)
    # x distances carry cos(dec) (calcAngSepDeg), as in the reference
    assert abs(rd[8, 13] - 3 * (0.5 / 60.0)
               * np.cos(np.radians(dec))) < 1e-5

    assert abs(photometry.JyPerSrToDeltaT(
        photometry.deltaTToJyPerSr(100.0, 148.0), 148.0) - 100.0) < 1e-9
    assert abs(maps.convertToDeltaT(maps.convertToY(50.0)) - 50.0) < 1e-9

    out = str(tmp_path / "m.fits")
    maps.saveFITS(out, d + 3.0, w)
    back, hdr = nfits.read_image(out)
    assert np.allclose(back, 3.0) and "NEMOVER" in hdr


def test_make_model_image_as_device_matches_host(tmp_path):
    """asDevice=True returns the identical painted map without the host
    round trip, across the override, per-row and point-source branches
    (reference paints host-side only, maps.py:1734-1899)."""
    import jax.numpy as jnp

    from nemo_tpu import maps
    from nemo_tpu.utils import wcs as nwcs

    shape = (192, 192)
    w = nwcs.makeWCS(shape, 0.5 / 60.0, centreRADeg=30.0,
                     centreDecDeg=-40.0)
    beamPath = str(tmp_path / "beam.txt")
    beams.makeGaussianBeamFile(beamPath, 1.4)
    clTab = Table({"name": np.array(["a", "b"]),
                   "RADeg": np.array([29.93, 30.07]),
                   "decDeg": np.array([-40.04, -39.96]),
                   "y_c": np.array([3.0, 2.0]),
                   "template": np.array(["Arnaud_M2e14_z0p4"] * 2)})
    srcTab = Table({"name": np.array(["s0"]),
                    "RADeg": np.array([30.0]),
                    "decDeg": np.array([-40.0]),
                    "deltaT_c": np.array([500.0])})
    cases = [
        dict(catalog=clTab, obsFreqGHz=149.6,
             override={"redshift": 0.4, "M500": 2e14}),  # batched paint
        dict(catalog=clTab, obsFreqGHz=149.6),           # per-row loop
        dict(catalog=srcTab),                            # point sources
    ]
    for kw in cases:
        cat = kw.pop("catalog")
        host = maps.makeModelImage(shape, w, cat, beamPath, **kw)
        dev = maps.makeModelImage(shape, w, cat, beamPath,
                                  asDevice=True, **kw)
        assert isinstance(dev, jnp.ndarray)
        np.testing.assert_allclose(np.asarray(dev), host, rtol=0,
                                   atol=2e-4 * np.abs(host).max())
