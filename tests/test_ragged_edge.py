"""Ragged data-coverage edge handling (VERDICT r4 next #3).

The round-4 DR5-scale record showed hard-edged coverage (observed
region not filling the tile rectangle, coverage == search mask)
leaving filter ringing in the S/N maps: ~60 spurious S/N > 8
detections at the boundary of two tiles and 2/1000 genuinely missed
clusters (docs/benchmarks/dr5_r4/README.md "Known issue").  The
reference avoids this only circumstantially - its real maps' coverage
extends past the search mask and its edge trim assumes a zero border
(``/root/reference/nemo/filters.py:727-744``).

``filters.raggedEdgeArrays`` restores both of the reference's implicit
conditions from the coverage geometry: a cosine taper at the coverage
edge before the FFT, and a coverage-edge erosion folded into the
survey mask so the 3 x noise-grid trim engages deterministically.
These tests pin that behaviour on a hard-edged single tile.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu import filters
from nemo_tpu.models import beams, profiles, sz
from nemo_tpu.ops import fourier, grf, interp
from nemo_tpu.utils import wcs as nwcs

from test_filters import _beam_path

SHAPE = (512, 512)
PIX_ARCMIN = 0.5
FREQ = 148.0
Y0 = 1e-3


def _coverage_mask(shape):
    """Wiggly vertical coverage boundary + one hole: a worst-case hard
    edge (coverage == search mask, like the round-4 DR5 sim)."""
    ny, nx = shape
    ys = np.arange(ny)
    edge = (390 + 25 * np.sin(ys / 23.0)).astype(int)
    mask = np.zeros(shape, dtype=np.uint8)
    for i in range(ny):
        mask[i, :edge[i]] = 1
    Y, X = np.mgrid[0:ny, 0:nx]
    mask[((Y - 140.0) ** 2 + (X - 120.0) ** 2) < 28.0 ** 2] = 0
    return mask


def _ragged_tile(seed=3):
    pix = (np.radians(PIX_ARCMIN / 60),) * 2
    w = nwcs.makeWCS(SHAPE, PIX_ARCMIN / 60.0, centreRADeg=30.0,
                     centreDecDeg=0.0)
    beam_path = _beam_path()
    beam = beams.BeamProfile(beamFileName=beam_path)
    cmb = np.asarray(grf.sim_cmb_map(jax.random.PRNGKey(seed), SHAPE, pix,
                                     beamBell=beam.Bell, beamEll=beam.ell,
                                     noiseLevel=15.0))
    deltaT0 = sz.convertToDeltaT(Y0, FREQ)
    cluster = np.asarray(fourier.apply_pixel_window(jnp.asarray(
        profiles.makeArnaudModelSignalMap(
            0.4, 2e14, SHAPE, pix, beam=beam_path, amplitude=deltaT0)),
        pow=1.0))
    coverage = _coverage_mask(SHAPE)
    data = (cmb + cluster) * coverage
    return {
        "data": data, "weights": coverage.astype(float), "wcs": w,
        "surveyMask": coverage.copy(),
        "pointSourceMask": np.ones(SHAPE, dtype=np.uint8),
        "flagMask": np.zeros(SHAPE, dtype=np.uint8),
        "beamFileName": beam_path, "obsFreqGHz": FREQ, "units": "uK",
    }, coverage


FILTER_DEF = {
    "label": "Arnaud_M2e14_z0p4", "class": "ArnaudModelMatchedFilter",
    "params": {
        "noiseParams": {"method": "dataMap", "noiseGridArcmin": 20.0},
        "outputUnits": "yc", "edgeTrimArcmin": 10.0,
        "GNFWParams": "default", "saveFilteredMaps": False,
        "saveRMSMap": False, "saveFilter": False,
        "M500MSun": 2e14, "z": 0.4,
    },
}


@pytest.fixture(scope="module")
def ragged_filtered(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ragged")
    mapDict, coverage = _ragged_tile()
    out = filters.filterMaps([mapDict], dict(FILTER_DEF), "PRIMARY",
                             diagnosticsDir=str(tmp / "diagnostics"),
                             selFnDir=str(tmp / "selFn"))
    return out, coverage


def test_coverage_edge_trim_engages(ragged_filtered):
    """The output mask must exclude >= max(trimPix, apodPix) pixels
    inward of the coverage edge - the reference's trim semantics, which
    a hard edge defeats (ringing fills the zero border)."""
    out, coverage = ragged_filtered
    from scipy.ndimage import distance_transform_edt
    edt = distance_transform_edt(coverage)
    trimPix = int(round((10.0 / 60.0) / (PIX_ARCMIN / 60.0)))  # 20 px
    gridPix = int(round((20.0 / 60.0) / (PIX_ARCMIN / 60.0)))  # 40 px
    erode = filters.coverageErodePix(20, trimPix, gridPix)
    near = edt <= erode
    assert out["surveyMask"][near].sum() == 0
    # ... and the interior survives in full (away from the standard
    # 20 px rectangular apod frame, which is excluded as always)
    ny, nx = out["surveyMask"].shape
    Y, X = np.mgrid[0:ny, 0:nx]
    border = np.minimum(np.minimum(Y, ny - 1 - Y),
                        np.minimum(X, nx - 1 - X))
    interior = (edt > erode) & (border >= 20)
    assert out["surveyMask"][interior].sum() == interior.sum()


def test_no_boundary_ringing_artifacts(ragged_filtered):
    """No spurious high-S/N peaks from coverage-edge ringing: the only
    S/N > 6 region in the searched area is the injected cluster."""
    out, coverage = ragged_filtered
    sn = np.asarray(out["SNMap"])
    ny, nx = sn.shape
    Y, X = np.mgrid[0:ny, 0:nx]
    awayFromCluster = ((Y - ny / 2) ** 2 + (X - nx / 2) ** 2) > 30 ** 2
    assert np.abs(sn[awayFromCluster]).max() < 6.0, \
        np.abs(sn[awayFromCluster]).max()
    # the cluster itself is still detected strongly
    assert interp.subpixel_value(sn, ny / 2, nx / 2) > 8.0


def test_interior_amplitude_unbiased(ragged_filtered):
    """The coverage taper must not bias photometry in the kept area."""
    out, _ = ragged_filtered
    ny, nx = out["data"].shape
    yc = interp.subpixel_value(out["data"], ny / 2, nx / 2)
    assert 0.85e-3 < yc < 1.1e-3, yc


def test_engine_staging_folds_ragged_arrays():
    """The batched engine's staging must (a) taper the apod window at
    the coverage edge and (b) erode the per-label survey mask."""
    from nemo_tpu.parallel import engine

    mapDict, coverage = _ragged_tile(seed=5)
    common = engine._stage_tile_common_from_maps([mapDict])
    assert common["coverEdt"] is not None
    # apod window tapered to ~zero just inside the coverage edge,
    # untouched deep inside
    apod = np.asarray(common["apodM"])
    from scipy.ndimage import distance_transform_edt
    edt = distance_transform_edt(coverage)
    ny, nx = SHAPE
    Y, X = np.mgrid[0:ny, 0:nx]
    border = np.minimum(np.minimum(Y, ny - 1 - Y),
                        np.minimum(X, nx - 1 - X))
    assert apod[(edt > 0) & (edt <= 2)].max() < 0.1
    assert apod[(edt > 60) & (border >= 20)].min() > 0.99

    # a fully-covered tile keeps the SHARED per-shape apod object
    # (upload dedup) and no EDT
    full = dict(mapDict)
    full["data"] = np.asarray(mapDict["data"]) + 1.0
    common2 = engine._stage_tile_common_from_maps([full])
    assert common2["coverEdt"] is None
    assert common2["apodM"] is engine._apod_np(SHAPE, 20)


def test_prepare_tile_erodes_common_survey_mask(tmp_path):
    """The bucket runner uploads common["surveyMask"] (not the per-label
    stacks copy), so the coverage-edge erosion must be folded into the
    COMMON dict - this is the exact contract that regressed once in
    round 5 (the fold initially landed only in stacks)."""
    from nemo_tpu.parallel import engine

    mapDict, coverage = _ragged_tile(seed=7)

    class _Cfg:
        parDict = {"photFilter": None, "bankPaintBatch": False}
        selFnDir = str(tmp_path / "selFn")
        diagnosticsDir = str(tmp_path / "diag")
        unfilteredMapsDictList = [mapDict]

    common = engine._stage_tile_common_from_maps([mapDict])
    before = common["surveyMask"].copy()
    f = dict(FILTER_DEF)
    _, stacks = engine._prepare_tile(_Cfg(), f, "PRIMARY",
                                     templateCache={},
                                     mapsList=[mapDict], common=common)
    from scipy.ndimage import distance_transform_edt
    edt = distance_transform_edt(coverage)
    trimPix = 20                                  # edgeTrimArcmin 10'
    gridPix = 40                                  # noiseGridArcmin 20'
    erode = filters.coverageErodePix(20, trimPix, gridPix)
    # the fold landed in COMMON (what gets uploaded)...
    assert common["surveyMask"][edt <= erode].sum() == 0
    assert common["surveyMask"][(edt > erode)].sum() > 0
    # ... was applied exactly once, and stacks reference it
    assert stacks["surveyMask"] is common["surveyMask"]
    assert before[(edt > 0) & (edt <= erode)].sum() > 0  # really changed
