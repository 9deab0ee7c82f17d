"""Quantify the flat-sky simulation error at DR5 tile sizes.

The reference simulates CMB skies with a curved-sky SHT
(``nemo/maps.py:1257`` via ``curvedsky.rand_map``); this framework uses
per-tile flat-sky realisations (``nemo_tpu/maps.py:simCMBMap``) with the
pixel scale evaluated at the tile centre.  On a CAR grid the true
east-west pixel scale varies as cos(dec) across the tile, so a flat-sky
tile's effective multipole mapping is distorted by

    dl/l = cos(dec_centre) / cos(dec_row) - 1   (~ tan(dec) * ddec)

growing towards the tile's north/south edges.  The induced C_l error
follows from the local spectral slope: dC/C = (dln C / dln l) * dl/l.

This test computes those numbers EXACTLY from the WCS geometry and the
bundled lensed TT table at the ACT DR5 tile geometry (tiles ~ 7.5 deg
tall at 0.5 arcmin, survey dec range about -62..+22 deg) and pins the
documented bounds (PARITY.md "Flat-sky simulation error"):

  * dec centre 0:    |dl/l| < 0.3%  at the tile edge (measured 0.21%)
  * dec centre -40:  |dl/l| < 6.5%  at the tile edge (measured 6.05%)
  * dec centre -55:  |dl/l| < 11%   at the tile edge (measured 10.6%)
  * area-weighted RMS dl/l over a -55 deg tile < 6% (measured 5.5%)
  * bundled-spectrum envelope slopes dlnC/dlnl (band fits): -4.6
    (l 1000-2000), -7.9 (2000-4000), -9.4 (4000-6000)
  * C_l error of a flat-sky CMB model: < 2.1% everywhere at dec 0;
    up to ~100% in edge rows of a dec -55 tile in the damping tail.

Science impact: the default/primary ``dataMap`` noise method estimates
N(k) from the data *in the same flat geometry* and is self-consistent at
any declination; only the ``model`` / ``max(dataMap,CMB)`` covariances
and sky-sim contamination estimates inherit this distortion, and only
toward the survey's extreme south (the reference's SHT sims stay exact
there).
"""

import numpy as np

from nemo_tpu.utils import wcs as nwcs

TILE_SHAPE = (900, 1536)       # 7.5 x 12.8 deg at 0.5'
PIX_ARCMIN = 0.5


def _row_scale_distortion(decCentreDeg):
    """dl/l per row for a DR5-like tile centred at decCentreDeg, computed
    from the true WCS geometry (no small-angle approximations)."""
    w = nwcs.makeWCS(TILE_SHAPE, PIX_ARCMIN / 60.0, centreRADeg=30.0,
                     centreDecDeg=decCentreDeg)
    ny, nx = TILE_SHAPE
    cy, cx = ny // 2, nx // 2
    rows = np.arange(0, ny, 10)
    # true local x pixel scale at each row vs the centre row's
    ra0, dec0 = w.pix2wcs(np.full(rows.shape, float(cx)),
                          rows.astype(float)).T
    ra1, dec1 = w.pix2wcs(np.full(rows.shape, float(cx + 1)),
                          rows.astype(float)).T
    local = nwcs.calcAngSepDeg(ra0, dec0, ra1, dec1)
    centre = local[np.argmin(np.abs(rows - cy))]
    # flat-sky sim assumes `centre` everywhere; true scale is `local`:
    # a mode with wavelength n pixels carries l_true = l_assumed *
    # (centre / local)... the fractional multipole distortion is
    return centre / local - 1.0, rows


def test_flatsky_multipole_distortion_bounds():
    edge0 = np.max(np.abs(_row_scale_distortion(0.0)[0]))
    edge40 = np.max(np.abs(_row_scale_distortion(-40.0)[0]))
    edge55 = np.max(np.abs(_row_scale_distortion(-55.0)[0]))
    assert edge0 < 0.003, edge0
    assert 0.04 < edge40 < 0.065, edge40
    assert 0.08 < edge55 < 0.11, edge55
    # area-weighted RMS over the worst tile
    d55, _ = _row_scale_distortion(-55.0)
    rms = float(np.sqrt(np.mean(d55 ** 2)))
    assert rms < 0.06, rms


def test_flatsky_cl_error_bounds():
    """Propagate dl/l into C_l error with the bundled spectrum's band-fit
    envelope slopes; pin the documented numbers."""
    from nemo_tpu.ops import grf
    Cl = np.asarray(grf.lensedClTT())
    ls = np.arange(len(Cl))

    def bandSlope(lo, hi):
        m = (ls > lo) & (ls < hi) & (Cl > 0)
        return abs(np.polyfit(np.log(ls[m]), np.log(Cl[m]), 1)[0])

    s12 = bandSlope(1000, 2000)
    s24 = bandSlope(2000, 4000)
    s46 = bandSlope(4000, 6000)
    assert 4.0 < s12 < 5.2, s12
    assert 7.0 < s24 < 8.5, s24
    assert 8.5 < s46 < 10.0, s46

    edge0 = np.max(np.abs(_row_scale_distortion(0.0)[0]))
    edge55 = np.max(np.abs(_row_scale_distortion(-55.0)[0]))
    # dec 0: flat-sky CMB model good to ~2% even in the damping tail
    assert s46 * edge0 < 0.021
    # dec -55 edge rows: order-unity model error in the damping tail -
    # the documented reason 'model'-noise configs should prefer the SHT-
    # exact reference (or dataMap noise) at the survey's extreme south
    assert 0.5 < s46 * edge55 < 1.1


def test_decaware_synthesis_shrinks_distortion():
    """The declination-aware banded GRF (``grf.gaussian_field_decaware``)
    must track the EXACT per-row-scale shaping ~two orders of magnitude
    better than the single-scale draw at a dec -55 tile (VERDICT r2 #7).

    Deterministic check: all three fields share one white field's
    phases, so the per-row error of each approximation against the
    exact per-row shaping is noiseless."""
    import jax
    import jax.numpy as jnp

    from nemo_tpu.ops import grf

    shape = (256, 512)
    dy = np.radians(PIX_ARCMIN / 60.0)
    # dec range of a 7.5-deg-tall tile centred at -55 (rows span the
    # full tile height even at this reduced pixel count)
    decs = np.linspace(-58.75, -51.25, shape[0])
    dx_rows = dy * np.cos(np.radians(decs)) / np.cos(np.radians(-55.0))
    Cl = np.asarray(grf.lensedClTT())
    ell = np.arange(len(Cl), dtype=float)

    key = jax.random.PRNGKey(11)
    white = np.asarray(jax.random.normal(key, shape, dtype=jnp.float64))
    F = np.fft.rfft2(white)
    lyf = np.fft.fftfreq(shape[0]) * 2 * np.pi
    lxf = np.fft.rfftfreq(shape[1]) * 2 * np.pi

    def shaped(dx):
        lmap = np.sqrt((lyf / dy)[:, None] ** 2 + (lxf / dx)[None, :] ** 2)
        Cl2d = np.interp(lmap, ell, Cl, right=0.0)
        amp = np.sqrt(np.maximum(Cl2d, 0.0) / (dy * dx))
        return np.fft.irfft2(F * amp, s=shape)

    exact = np.empty(shape)
    for r in range(shape[0]):
        exact[r] = shaped(dx_rows[r])[r]

    nBands = grf.dec_band_count(dx_rows)
    assert nBands > 1
    banded = np.asarray(grf.gaussian_field_decaware(
        key, shape, dy, jnp.asarray(dx_rows), jnp.asarray(ell),
        jnp.asarray(Cl), n_bands=nBands))
    single = shaped(dx_rows[shape[0] // 2])

    norm = float(np.sqrt(np.mean(exact ** 2)))
    errBanded = float(np.sqrt(np.mean((banded - exact) ** 2))) / norm
    errSingle = float(np.sqrt(np.mean((single - exact) ** 2))) / norm
    # single-scale error is order 10% in field RMS at this geometry;
    # the banded blend must beat it by >= 30x
    assert errSingle > 0.02, errSingle
    assert errBanded < errSingle / 30, (errBanded, errSingle)


def test_sim_cmb_map_routes_decaware():
    """``sim_cmb_map(dx_rows=...)`` engages the banded path at high
    |dec| (band count > 1) and stays single-scale at the equator."""
    from nemo_tpu.ops import grf

    dy = np.radians(PIX_ARCMIN / 60.0)
    decsSouth = np.linspace(-58.75, -51.25, 128)
    dxSouth = dy * np.cos(np.radians(decsSouth)) / np.cos(np.radians(-55.0))
    assert grf.dec_band_count(dxSouth) > 1
    decsEq = np.linspace(-0.5, 0.5, 128)
    dxEq = dy * np.cos(np.radians(decsEq))
    assert grf.dec_band_count(dxEq) == 1


def test_flatsky_sim_power_matches_table_at_centre_scale():
    """Control: measured in its own (centre-scale) geometry, the flat-sky
    realisation's band power matches the input table - the distortion is
    purely the metric mismatch quantified above, not a sim bug.  (The
    r1 VERDICT item-3 test in test_ops.py pins this at <1% over many
    seeds; here one seed at the DR5 tile shape within cosmic variance.)"""
    import jax

    from nemo_tpu.ops import fourier, grf

    shape = (900, 900)
    pix = (np.radians(PIX_ARCMIN / 60.0),) * 2
    m = grf.sim_cmb_map(jax.random.PRNGKey(7), shape, pix)
    fm = np.asarray(fourier.rfft2(np.asarray(m)))
    lmap = np.asarray(fourier.rmodlmap(shape, pix))
    omega = pix[0] * pix[1]
    p2d = np.abs(fm) ** 2 * omega / (shape[0] * shape[1])
    Cl = np.asarray(grf.lensedClTT())
    sel = (lmap > 1000) & (lmap < 4000)
    measured = p2d[sel].mean()
    expected = np.interp(lmap[sel], np.arange(len(Cl)), Cl).mean()
    assert abs(measured / expected - 1) < 0.05
