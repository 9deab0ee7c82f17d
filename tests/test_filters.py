import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu import filters
from nemo_tpu.models import beams, profiles, sz
from nemo_tpu.ops import fourier, grf
from nemo_tpu.ops import noise as noise_ops
from nemo_tpu.utils import wcs as nwcs

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _beam_path(name="beam_f150.txt", fwhm=1.4):
    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, name)
    if not os.path.exists(path):
        beams.makeGaussianBeamFile(path, fwhm)
    return path


def _make_sim_tile(shape=(512, 512), pixArcmin=0.5, noise_uK=15.0,
                   y0=1e-3, z=0.4, M500=2e14, seed=0, freqGHz=148.0,
                   fwhm=1.4, beam_name="beam_f150.txt"):
    """CMB + white noise + one central cluster, pixel-window applied."""
    pix = (np.radians(pixArcmin / 60), np.radians(pixArcmin / 60))
    w = nwcs.makeWCS(shape, pixArcmin / 60.0, centreRADeg=30.0,
                     centreDecDeg=0.0)
    beam_path = _beam_path(beam_name, fwhm)
    beam = beams.BeamProfile(beamFileName=beam_path)
    key = jax.random.PRNGKey(seed)
    cmb = np.asarray(grf.sim_cmb_map(key, shape, pix, beamBell=beam.Bell,
                                     beamEll=beam.ell, noiseLevel=noise_uK))
    deltaT0 = sz.convertToDeltaT(y0, freqGHz)
    cluster = profiles.makeArnaudModelSignalMap(
        z, M500, shape, pix, beam=beam_path, amplitude=deltaT0)
    cluster = np.asarray(fourier.apply_pixel_window(jnp.asarray(cluster),
                                                    pow=1.0))
    data = cmb + cluster
    mapDict = {
        "data": data,
        "weights": np.ones(shape),
        "wcs": w,
        "surveyMask": np.ones(shape, dtype=np.uint8),
        "pointSourceMask": np.ones(shape, dtype=np.uint8),
        "flagMask": np.zeros(shape, dtype=np.uint8),
        "beamFileName": beam_path,
        "obsFreqGHz": freqGHz,
        "units": "uK",
    }
    return mapDict, cluster


FILTER_PARAMS = {
    "noiseParams": {"method": "dataMap", "noiseGridArcmin": 40.0},
    "outputUnits": "yc",
    "edgeTrimArcmin": 10.0,
    "GNFWParams": "default",
    "saveFilteredMaps": False, "saveRMSMap": False, "saveFilter": False,
    "M500MSun": 2e14, "z": 0.4,
}


@pytest.fixture(scope="module")
def filtered(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("filt")
    mapDict, cluster = _make_sim_tile()
    f = {"label": "Arnaud_M2e14_z0p4", "class": "ArnaudModelMatchedFilter",
         "params": dict(FILTER_PARAMS)}
    out = filters.filterMaps([mapDict], f, "PRIMARY",
                             diagnosticsDir=str(tmp / "diagnostics"),
                             selFnDir=str(tmp / "selFn"))
    return out, mapDict, cluster


def test_mf_recovers_cluster_amplitude(filtered):
    out, mapDict, cluster = filtered
    ny, nx = out["data"].shape
    # Central y_c should recover the injected 1e-3 to ~10% (noise-cov built
    # from the data itself biases slightly low, as in the reference's
    # expected 0.94 ratio on real data)
    from nemo_tpu.ops import interp
    yc = interp.subpixel_value(out["data"], ny / 2, nx / 2)
    assert 0.85e-3 < yc < 1.1e-3, yc
    # SNR at the cluster should be large
    sn = interp.subpixel_value(out["SNMap"], ny / 2, nx / 2)
    assert sn > 10


def test_mf_snmap_is_unit_normalised(filtered):
    out, _, _ = filtered
    sn = out["SNMap"]
    valid = (out["surveyMask"] > 0) & (sn != 0)
    # Exclude the cluster region
    ny, nx = sn.shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    rr = np.hypot(yy - ny / 2, xx - nx / 2)
    bg = valid & (rr > 40)
    assert abs(np.std(sn[bg]) - 1.0) < 0.15


def test_mf_output_fields(filtered):
    out, _, _ = filtered
    assert out["mapUnits"] == "yc"
    assert out["obsFreqGHz"] == "yc"
    assert out["surveyMask"].max() == 1
    # Edge trimmed: corners masked
    assert out["surveyMask"][0, 0] == 0
    assert out["SNMap"].shape == out["data"].shape


def test_mf_filter_cache_roundtrip(tmp_path):
    mapDict, _ = _make_sim_tile(shape=(256, 256))
    f = {"label": "cachetest", "class": "ArnaudModelMatchedFilter",
         "params": dict(FILTER_PARAMS, saveFilter=True)}
    diag = str(tmp_path / "diagnostics")
    out1 = filters.filterMaps([mapDict], f, "PRIMARY", diagnosticsDir=diag,
                              selFnDir=str(tmp_path / "selFn"))
    # Second run must reuse the cached filter and give identical data
    out2 = filters.filterMaps([mapDict], f, "PRIMARY", diagnosticsDir=diag,
                              selFnDir=str(tmp_path / "selFn"),
                              useCachedFilter=True)
    np.testing.assert_allclose(out2["data"], out1["data"], rtol=1e-5,
                               atol=1e-12)


def test_grid_rms_map_matches_reference_algorithm():
    """Oracle: direct numpy transcription of the reference's grid loop
    (filters.py:416-483, numBins=1, default estimator)."""
    rng = np.random.default_rng(10)
    m = rng.normal(0, 2.0, (300, 310))
    # zero borders as apodised maps have
    m[:25] = 0
    m[-25:] = 0
    m[:, :25] = 0
    m[:, -25:] = 0
    gridSize = 64

    def oracle(mapData, gridSize):
        overlapPix = gridSize // 2
        numX = mapData.shape[1] / gridSize
        numY = mapData.shape[0] / gridSize
        yC = np.linspace(0, mapData.shape[0], int(numY + 1), dtype=int)
        xC = np.linspace(0, mapData.shape[1], int(numX + 1), dtype=int)
        apodMask = mapData != 0
        out = np.zeros(mapData.shape)
        for i in range(len(yC) - 1):
            for k in range(len(xC) - 1):
                y0 = max(yC[i] - overlapPix, 0)
                y1 = min(yC[i + 1] + overlapPix, mapData.shape[0])
                x0 = max(xC[k] - overlapPix, 0)
                x1 = min(xC[k + 1] + overlapPix, mapData.shape[1])
                vals = mapData[y0:y1, x0:x1]
                good = apodMask[y0:y1, x0:x1]
                if good.sum() == 0:
                    continue
                sel = vals[good]
                if (sel != 0).sum() == 0:
                    rms = 0.0
                else:
                    mean, rms = np.mean(sel), np.std(sel)
                    for _ in range(10):
                        cl = np.abs(sel) < abs(mean + 3 * rms)
                        if cl.sum() > 0:
                            mean, rms = np.mean(sel[cl]), np.std(sel[cl])
                if rms > 0:
                    out[y0:y1, x0:x1] = rms
        return out

    ours = np.asarray(noise_ops.grid_rms_map(jnp.asarray(m), gridSize))
    ref = oracle(m, gridSize)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_whole_map_rms():
    rng = np.random.default_rng(11)
    m = rng.normal(0, 3.0, (128, 128))
    out = np.asarray(noise_ops.whole_map_rms(jnp.asarray(m)))
    assert abs(out[0, 0] / 3.0 - 1) < 0.1
    assert np.allclose(out, out[0, 0])


def test_percentile_estimator():
    rng = np.random.default_rng(12)
    m = rng.normal(0, 2.0, (200, 200))
    out = np.asarray(noise_ops.grid_rms_map(jnp.asarray(m), 50,
                                            estimator="percentile"))
    # 68.3 percentile of |N(0,2)| ~ 2.0
    interior = out[60:140, 60:140]
    assert abs(np.median(interior) / 2.0 - 1) < 0.15


def test_apply_filter_batch_axis(tmp_path):
    """applyFilter accepts (B, nf, ny, nx) batches and matches per-sample
    application."""
    mapDict, _ = _make_sim_tile(shape=(256, 256))
    f = {"label": "batchtest", "class": "ArnaudModelMatchedFilter",
         "params": dict(FILTER_PARAMS)}
    out, filterObj = filters.filterMaps(
        [mapDict], f, "PRIMARY", diagnosticsDir=str(tmp_path / "d"),
        selFnDir=str(tmp_path / "s"), returnFilter=True)
    rng = np.random.default_rng(0)
    stack = rng.normal(0, 50.0, (3, 1, 256, 256))
    single = np.stack([np.asarray(filterObj.applyFilter(s)) for s in stack])
    batched = np.asarray(filterObj.applyFilter(stack))
    np.testing.assert_allclose(batched, single, rtol=1e-10, atol=1e-12)


def test_smart_noise_grid(tmp_path):
    """noiseGridArcmin: 'smart' bins the RMS estimate by the weight map
    (reference filters.py:366-407): deep and shallow halves get distinct
    noise levels."""
    rng = np.random.default_rng(5)
    shape = (256, 256)
    mapDict, w = _make_sim_tile(shape=shape)
    # overwrite: two-depth noise + matching weights
    noise = np.zeros(shape)
    noise[:, :128] = rng.normal(0, 20.0, (256, 128))   # deep half
    noise[:, 128:] = rng.normal(0, 60.0, (256, 128))   # shallow half
    mapDict["data"] = noise
    weights = np.zeros(shape)
    weights[:, :128] = 1 / 20.0 ** 2
    weights[:, 128:] = 1 / 60.0 ** 2
    # weight maps are continuous in practice; the binning uses open
    # intervals (reference semantics), so jitter slightly
    weights = weights * rng.uniform(0.97, 1.03, shape)
    mapDict["weights"] = weights
    f = {"label": "smarttest", "class": "ArnaudModelMatchedFilter",
         "params": dict(FILTER_PARAMS,
                        noiseParams={"method": "dataMap",
                                     "noiseGridArcmin": "smart",
                                     "numNoiseBins": 3},
                        saveRMSMap=True)}
    selFnDir = str(tmp_path / "selFn")
    out = filters.filterMaps([mapDict], f, "PRIMARY",
                             diagnosticsDir=str(tmp_path / "d"),
                             selFnDir=selFnDir)
    from nemo_tpu.utils import fits as nfits
    rms, _ = nfits.read_image(os.path.join(
        selFnDir, "PRIMARY", "RMSMap_smarttest#PRIMARY.fits"))
    rms = np.asarray(rms, dtype=float)
    deep = rms[100:150, 40:90]
    shallow = rms[100:150, 170:220]
    assert np.median(deep) > 0 and np.median(shallow) > 0
    # shallow half noisier by roughly the injected factor of 3
    ratio = np.median(shallow) / np.median(deep)
    assert 1.8 < ratio < 4.5, ratio


def test_num_noise_bins_grid(tmp_path):
    """numNoiseBins > 1 with a numeric grid: per-cell weight binning
    separates depths inside each cell (reference filters.py:409-481)."""
    rng = np.random.default_rng(6)
    shape = (256, 256)
    mapDict, w = _make_sim_tile(shape=shape)
    noise = np.zeros(shape)
    noise[:, :128] = rng.normal(0, 20.0, (256, 128))
    noise[:, 128:] = rng.normal(0, 60.0, (256, 128))
    mapDict["data"] = noise
    weights = np.zeros(shape)
    weights[:, :128] = 1 / 20.0 ** 2
    weights[:, 128:] = 1 / 60.0 ** 2
    weights = weights * rng.uniform(0.97, 1.03, shape)
    mapDict["weights"] = weights
    f = {"label": "binstest", "class": "ArnaudModelMatchedFilter",
         "params": dict(FILTER_PARAMS,
                        noiseParams={"method": "dataMap",
                                     "noiseGridArcmin": 120.0,
                                     "numNoiseBins": 2},
                        saveRMSMap=True)}
    selFnDir = str(tmp_path / "selFn")
    filters.filterMaps([mapDict], f, "PRIMARY",
                       diagnosticsDir=str(tmp_path / "d"),
                       selFnDir=selFnDir)
    from nemo_tpu.utils import fits as nfits
    rms, _ = nfits.read_image(os.path.join(
        selFnDir, "PRIMARY", "RMSMap_binstest#PRIMARY.fits"))
    rms = np.asarray(rms, dtype=float)
    deep = np.median(rms[100:150, 40:90])
    shallow = np.median(rms[100:150, 170:220])
    assert deep > 0 and shallow > 0
    assert 1.8 < shallow / deep < 4.5, shallow / deep
