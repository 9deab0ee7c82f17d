"""Absolute calibration: a noise-free painted cluster pushed through the
calibrated matched filter must return the input y0 (VERDICT r2 #8).

This is the class of bug commit 4cc7c2b fixed at the 3.1% level (the
batched engine's calibration peak was read at an integer pixel while odd
tile dimensions put the template centre BETWEEN pixels) - pinned here
forever, across filter scales, declinations (anisotropic pixel scales)
and odd/even tile parities, for both the host and the batched engine.

Construction: the noise covariance uses ``method: model`` (CMB model +
white noise from the weights - independent of the data), the data is a
noise-free window-applied painted cluster of amplitude y0_in at the tile
centre, and ``undoPixelWindow=False`` so the response is the exact
linearity identity: data = (y0_in / y0_cal) * calibration template, hence
recovered peak == y0_in up to the calibration-read machinery under test.
Reference behavior: ``nemo/filters.py:635-690`` (calibration),
``tests/quick.robot:44-68`` (amplitude-recovery loops).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nemo_tpu import filters
from nemo_tpu.models import beams, profiles, sz
from nemo_tpu.ops import fourier, interp
from nemo_tpu.utils import wcs as nwcs
from tests.test_filters import _beam_path

Y0_IN = 3.3e-4

SCALES = [(1e14, 1.0), (2e14, 0.4), (8e14, 0.2)]
DECS = [0.0, -30.0, -55.0]
SHAPES = [(300, 300), (301, 301), (300, 301)]


def _painted_tile(shape, dec0, M500, z, freqGHz=148.0, fwhm=1.4,
                  beam_name="beam_f150.txt", pixArcmin=0.5):
    w = nwcs.makeWCS(shape, pixArcmin / 60.0, centreRADeg=30.0,
                     centreDecDeg=dec0)
    pix = (np.radians(pixArcmin / 60),
           np.radians(pixArcmin / 60) * np.cos(np.radians(dec0)))
    beam_path = _beam_path(beam_name, fwhm)
    deltaT0 = sz.convertToDeltaT(Y0_IN, freqGHz)
    cluster = profiles.makeArnaudModelSignalMap(
        z, M500, shape, pix, beam=beam_path, amplitude=deltaT0)
    data = np.asarray(fourier.apply_pixel_window(jnp.asarray(cluster),
                                                 pow=1.0))
    return {"data": data, "weights": np.full(shape, 1.0 / 15.0 ** 2),
            "wcs": w, "surveyMask": np.ones(shape, dtype=np.uint8),
            "pointSourceMask": np.ones(shape, dtype=np.uint8),
            "flagMask": np.zeros(shape, dtype=np.uint8),
            "beamFileName": beam_path, "obsFreqGHz": freqGHz,
            "units": "uK"}


def _filter_spec(M500, z, label="AbsCal"):
    return {"label": label, "class": "ArnaudModelMatchedFilter",
            "params": {"noiseParams": {"method": "model",
                                       "noiseGridArcmin": 40.0},
                       "outputUnits": "yc", "edgeTrimArcmin": 0.0,
                       "GNFWParams": "default",
                       "M500MSun": M500, "z": z}}


@pytest.mark.parametrize("i,j", [(i, j) for i in range(3)
                                 for j in range(3)])
def test_host_absolute_calibration(i, j, tmp_path):
    M500, z = SCALES[i]
    dec0 = DECS[j]
    shape = SHAPES[(i + j) % 3]
    mapDict = _painted_tile(shape, dec0, M500, z)
    f = _filter_spec(M500, z)
    out = filters.filterMaps([mapDict], f, "PRIMARY",
                             diagnosticsDir=str(tmp_path / "d"),
                             selFnDir=str(tmp_path / "s"),
                             verbose=False, undoPixelWindow=False)
    rec = interp.subpixel_value(np.asarray(out["data"]),
                                shape[0] / 2.0, shape[1] / 2.0)
    assert abs(rec / Y0_IN - 1) < 1e-3, \
        (M500, z, dec0, shape, rec / Y0_IN)


class _MiniConfig:
    """The slice of NemoConfig the batched engine reads."""

    def __init__(self, mapDicts, tmp):
        self.tileNames = ["PRIMARY"]
        self.parDict = {"photFilter": None}
        self.unfilteredMapsDictList = mapDicts
        self.diagnosticsDir = str(tmp / "d")
        self.selFnDir = str(tmp / "s")


@pytest.mark.parametrize("dec0,shape", [(0.0, (301, 301)),
                                        (-30.0, (300, 301)),
                                        (-55.0, (301, 301))])
def test_batched_absolute_calibration(dec0, shape, tmp_path):
    """The batched engine's crop-spline calibration read (odd dims put the
    template centre between pixels - the 4cc7c2b bug class)."""
    from nemo_tpu.parallel import engine

    M500, z = 2e14, 0.4
    mapDict = _painted_tile(shape, dec0, M500, z)
    cfg = _MiniConfig([mapDict], tmp_path)
    f = _filter_spec(M500, z)
    res = engine.batchFilterTiles(cfg, f, verbose=False,
                                  undoPixelWindow=False)["PRIMARY"]
    rec = interp.subpixel_value(np.asarray(res["data"]),
                                shape[0] / 2.0, shape[1] / 2.0)
    assert abs(rec / Y0_IN - 1) < 1e-3, (dec0, shape, rec / Y0_IN)


def test_batched_absolute_calibration_two_band(tmp_path):
    """Two-band MMF at odd dims: the fSZ spectral weighting and the
    two-frequency calibration stack keep the absolute scale."""
    from nemo_tpu.parallel import engine

    M500, z = 5e14, 0.6
    shape = (301, 300)
    m150 = _painted_tile(shape, -40.0, M500, z, freqGHz=148.0, fwhm=1.4,
                         beam_name="beam_f150.txt")
    m090 = _painted_tile(shape, -40.0, M500, z, freqGHz=97.8, fwhm=2.1,
                         beam_name="beam_f090.txt")
    cfg = _MiniConfig([m090, m150], tmp_path)
    f = _filter_spec(M500, z)
    res = engine.batchFilterTiles(cfg, f, verbose=False,
                                  undoPixelWindow=False)["PRIMARY"]
    rec = interp.subpixel_value(np.asarray(res["data"]),
                                shape[0] / 2.0, shape[1] / 2.0)
    assert abs(rec / Y0_IN - 1) < 1e-3, rec / Y0_IN
