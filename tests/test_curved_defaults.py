"""Declination policy for simulated skies (VERDICT r3 missing #3).

The reference synthesises CMB/1-f skies with a curved-sky SHT at every
declination (``nemo/maps.py:1257,1326-1341``); the fast flat-sky path
here is exact only near the equator.  ``method="auto"`` must therefore
select the curved path above ``maps.CURVED_SKY_DEC_DEG``, the
``model``-noise covariance must follow the same policy, and an explicit
flat-sky request on a high-|dec| map must WARN rather than silently use
the distorted geometry.
"""

import warnings

import numpy as np
import pytest

from nemo_tpu import filters, maps
from nemo_tpu.models import beams
from nemo_tpu.ops import grf, sht
from nemo_tpu.utils import wcs as nwcs

SHAPE = (90, 120)
PIX_DEG = 4.0 / 60.0      # 4' pixels: Nyquist ~ l 2700, cheap SHT


def _tileWCS(decDeg):
    return nwcs.makeWCS(SHAPE, PIX_DEG, centreRADeg=30.0,
                        centreDecDeg=decDeg)


def test_resolve_sim_method_policy():
    wLow = _tileWCS(0.0)
    wHigh = _tileWCS(-55.0)
    assert maps.resolveSimMethod(wLow, SHAPE, "auto") == "flat"
    assert maps.resolveSimMethod(wHigh, SHAPE, "auto") == "curved"
    # explicit methods pass through; explicit flat at high dec warns
    assert maps.resolveSimMethod(wLow, SHAPE, "curved") == "curved"
    with pytest.warns(UserWarning, match="flat-sky"):
        assert maps.resolveSimMethod(
            wHigh, SHAPE, "flat", context="test-ctx-%d" % id(wHigh)) \
            == "flat"
    # low dec, flat: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert maps.resolveSimMethod(wLow, SHAPE, "flat",
                                     context="test-low") == "flat"


def test_config_override_plumbs_through():
    old = maps.SIM_METHOD_OVERRIDE
    try:
        maps.SIM_METHOD_OVERRIDE = "flat"
        assert maps.resolveSimMethod(_tileWCS(-55.0), SHAPE,
                                     "auto") == "flat"
        maps.SIM_METHOD_OVERRIDE = "curved"
        assert maps.resolveSimMethod(_tileWCS(0.0), SHAPE,
                                     "auto") == "curved"
    finally:
        maps.SIM_METHOD_OVERRIDE = old


def _beamFile(tmp_path):
    beamFile = str(tmp_path / "beam.txt")
    beams.makeGaussianBeamFile(beamFile, 1.4)
    return beamFile


def _makeModelNoiseFilter(decDeg, beamFile):
    w = _tileWCS(decDeg)
    mapDict = {"data": np.zeros(SHAPE), "wcs": w,
               "weights": np.full(SHAPE, 1.0 / 30.0 ** 2),
               "beamFileName": beamFile, "obsFreqGHz": 149.6,
               "units": "uK", "flagMask": np.zeros(SHAPE, dtype=int),
               "surveyMask": np.ones(SHAPE),
               "pointSourceMask": np.ones(SHAPE)}
    params = {"noiseParams": {"method": "model", "noiseGridArcmin": 40.0},
              "outputUnits": "uK"}
    return filters.BeamMatchedFilter("t", [mapDict], params), w


def test_model_noise_covariance_is_curved_at_high_dec(tmp_path,
                                                      monkeypatch):
    """The high-dec `model`-noise stack must equal the curved-sky draw
    (same key, same band limit) and differ from the flat-sky draw - no
    silent flat-sky use at dec -55 (VERDICT r3 next #6)."""
    monkeypatch.setattr(maps, "CURVED_AUTO_LMAX", 300)
    beamFile = _beamFile(tmp_path)
    filt, w = _makeModelNoiseFilter(-55.0, beamFile)
    stack = np.asarray(filt._noiseStack(
        np.zeros((1,) + SHAPE)))

    import jax
    beam = beams.BeamProfile(beamFileName=beamFile)
    key = jax.random.PRNGKey(3141592654)
    curved = np.asarray(sht.sim_cmb_map_curved(
        key, SHAPE, w, beamBell=beam.Bell, beamEll=beam.ell,
        noiseLevel=30.0, lmax=300))
    np.testing.assert_allclose(stack[0], curved, rtol=0, atol=1e-12)

    flat = np.asarray(grf.sim_cmb_map(
        key, SHAPE, maps.pixScalesRad(w, SHAPE), beamBell=beam.Bell,
        beamEll=beam.ell, noiseLevel=30.0,
        dx_rows=maps.pixScaleXRadPerRow(w, SHAPE)))
    assert not np.allclose(stack[0], flat)


def test_model_noise_covariance_stays_flat_at_low_dec(tmp_path):
    beamFile = _beamFile(tmp_path)
    filt, w = _makeModelNoiseFilter(0.0, beamFile)
    stack = np.asarray(filt._noiseStack(np.zeros((1,) + SHAPE)))

    import jax
    beam = beams.BeamProfile(beamFileName=beamFile)
    key = jax.random.PRNGKey(3141592654)
    flat = np.asarray(grf.sim_cmb_map(
        key, SHAPE, maps.pixScalesRad(w, SHAPE), beamBell=beam.Bell,
        beamEll=beam.ell, noiseLevel=30.0,
        dx_rows=maps.pixScaleXRadPerRow(w, SHAPE)))
    np.testing.assert_allclose(stack[0], flat, rtol=0, atol=1e-12)


def test_simCMBMap_auto_dispatch(tmp_path, monkeypatch):
    """simCMBMap's auto method: curved (band-limited at
    CURVED_AUTO_LMAX) above the threshold, flat below."""
    monkeypatch.setattr(maps, "CURVED_AUTO_LMAX", 200)
    wHigh = _tileWCS(-55.0)
    auto = maps.simCMBMap(SHAPE, wHigh, seed=3)
    explicit = maps.simCMBMap(SHAPE, wHigh, seed=3, method="curved",
                              lmax=200)
    np.testing.assert_allclose(auto, explicit, rtol=0, atol=1e-12)

    wLow = _tileWCS(0.0)
    auto = maps.simCMBMap(SHAPE, wLow, seed=3)
    flat = maps.simCMBMap(SHAPE, wLow, seed=3, method="flat")
    np.testing.assert_allclose(auto, flat, rtol=0, atol=1e-12)
