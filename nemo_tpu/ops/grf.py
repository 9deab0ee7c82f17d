"""Gaussian random field simulation: CMB and instrument-noise maps.

Replaces ``nemo/maps.py:1223-1352`` (``simCMBMap`` via pixell
``curvedsky.rand_map`` and ``simNoiseMap``) with flat-sky per-tile
realisations: a tile's Fourier modes are drawn with
<|F(l)|^2> = N_pix * C(l) / Omega_pix, so that the empirical 2-d power
spectrum matches the input C_l.  The curved-sky difference only matters at
the largest scales (l < ~50 for >10-degree tiles) and is documented.

Randomness uses explicit jax.random keys throughout (the reference relies
on global np.random seeding, ``maps.py:44``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import fourier


# Fallback approximate lensed CMB TT spectrum: log-interpolated anchors of
# D_l = l(l+1)C_l/2pi in uK^2 through the well-known acoustic peak structure.
# Used only if the bundled CAMB table (data/lensed_cl_tt.txt) is missing.
_DL_ANCHORS_L = np.array([2, 10, 30, 60, 100, 150, 220, 300, 412, 537, 620,
                          686, 810, 920, 1020, 1120, 1250, 1400, 1600, 1800,
                          2000, 2300, 2600, 3000, 4000, 6000, 10000])
_DL_ANCHORS_D = np.array([1000, 950, 1000, 1150, 1400, 2500, 5750, 3900,
                          1650, 2550, 2100, 1850, 2500, 1850, 1300, 1250,
                          900, 550, 320, 190, 110, 55, 28, 12, 2.0, 0.1,
                          1e-3])


def approxLensedClTT(lmax=12000):
    """Analytic stand-in C_l (uK^2) for l = 0..lmax (fallback only)."""
    ell = np.arange(lmax + 1, dtype=float)
    Dl = np.exp(np.interp(np.log(np.maximum(ell, 2)),
                          np.log(_DL_ANCHORS_L), np.log(_DL_ANCHORS_D)))
    with np.errstate(divide="ignore", invalid="ignore"):
        Cl = 2 * np.pi * Dl / (ell * (ell + 1))
    Cl[:2] = 0.0
    return Cl


_lensedDlCache = {}


def lensedClTT(lmax=12000):
    """Lensed CMB TT C_l (uK^2) for l = 0..lmax.

    Reconstructed from the bundled CAMB table ``data/lensed_cl_tt.txt``
    (the Planck-like lensed spectrum the reference distributes as
    ``nemo/data/planck_lensedCls.dat`` and reads at ``maps.py:1245`` /
    ``filters.py:273``, resampled; cubic-spline reconstruction matches
    the full table to 0.02%).  Beyond the table's l=2100 the analytic
    damping-tail curve is continued, rescaled to join the table value
    continuously.  Falls back to :func:`approxLensedClTT` if the data
    file is missing.
    """
    if lmax in _lensedDlCache:
        return _lensedDlCache[lmax].copy()
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "lensed_cl_tt.txt")
    if not os.path.exists(path):
        return approxLensedClTT(lmax)
    tab = np.loadtxt(path)
    lAnchor, DlAnchor = tab[:, 0], tab[:, 1]
    from scipy.interpolate import CubicSpline

    cs = CubicSpline(lAnchor, np.log(DlAnchor))
    lTabMax = int(lAnchor[-1])
    ell = np.arange(lmax + 1, dtype=float)
    Dl = np.zeros(lmax + 1)
    top = min(lmax, lTabMax)
    Dl[2:top + 1] = np.exp(cs(ell[2:top + 1]))
    if lmax > lTabMax:
        tailL = ell[lTabMax + 1:]
        tail = np.exp(np.interp(np.log(tailL), np.log(_DL_ANCHORS_L),
                                np.log(_DL_ANCHORS_D)))
        joinRef = np.exp(np.interp(np.log(lTabMax),
                                   np.log(_DL_ANCHORS_L),
                                   np.log(_DL_ANCHORS_D)))
        Dl[lTabMax + 1:] = tail * (DlAnchor[-1] / joinRef)
    with np.errstate(divide="ignore", invalid="ignore"):
        Cl = 2 * np.pi * Dl / (ell * (ell + 1))
    Cl[:2] = 0.0
    if len(_lensedDlCache) > 8:
        _lensedDlCache.clear()
    _lensedDlCache[lmax] = Cl
    return Cl.copy()


@functools.partial(jax.jit, static_argnames=("shape", "pix_scales_rad",
                                              "dtype"))
def gaussian_field(key, shape, pix_scales_rad, ell, Cl, dtype=jnp.float64):
    """Draw a real GRF with isotropic power spectrum C(l) on a flat tile.

    Construction: rfft a white map (its half-grid coefficients have
    <|W|^2> = N and exactly the right Hermitian structure), shape by
    sqrt(C(l)/Omega_pix), and transform back - real FFTs only.
    """
    ny, nx = shape
    dy, dx = pix_scales_rad
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    lmap = fourier.rmodlmap_graph(shape, pix_scales_rad)
    Cl2d = jnp.interp(lmap, jnp.asarray(ell, dtype=lmap.dtype),
                      jnp.asarray(Cl, dtype=lmap.dtype), right=0.0)
    omega_pix = dy * dx
    amp = jnp.sqrt(jnp.maximum(Cl2d, 0.0) / omega_pix)
    white = jax.random.normal(key, shape, dtype=dtype)
    F = jnp.fft.rfft2(white)
    return jnp.fft.irfft2(F * amp, s=shape)


@functools.partial(jax.jit, static_argnames=("shape", "n_bands", "dtype"))
def gaussian_field_decaware(key, shape, dy, dx_rows, ell, Cl, n_bands=9,
                            dtype=jnp.float64):
    """GRF on a CAR tile honouring the cos(dec)-varying x pixel scale.

    A single-scale flat-sky draw maps multipoles with the tile-CENTRE
    pixel scale everywhere, distorting the local spectrum by
    dl/l = dx_centre/dx_row - 1 (up to ~10% at the edges of a dec -55
    DR5 tile; see tests/test_flatsky_bound.py).  Here ONE white field is
    shaped at ``n_bands`` reference scales spanning [min(dx), max(dx)]
    and each row linearly blends the two nearest bands.  All bands share
    the same Fourier phases, so the blend interpolates the shaping
    AMPLITUDE exactly; the residual error is the quadratic interpolation
    remainder over one band spacing - two orders of magnitude below the
    single-scale distortion - while the field stays a continuous,
    row-correlated realisation.
    """
    ny, nx = shape
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    white = jax.random.normal(key, shape, dtype=dtype)
    F = jnp.fft.rfft2(white)
    dx_rows = jnp.asarray(dx_rows, dtype=dtype)
    dxLo = jnp.min(dx_rows)
    dxHi = jnp.max(dx_rows)
    dxs = jnp.linspace(dxLo, dxHi, n_bands)
    ellA = jnp.asarray(ell, dtype=dtype)
    ClA = jnp.asarray(Cl, dtype=dtype)
    lyf = jnp.asarray(np.fft.fftfreq(ny) * 2 * np.pi, dtype=dtype)
    lxf = jnp.asarray(np.fft.rfftfreq(nx) * 2 * np.pi, dtype=dtype)

    def one_band(dx_b):
        lmap = jnp.sqrt((lyf / dy)[:, None] ** 2
                        + (lxf / dx_b)[None, :] ** 2)
        Cl2d = jnp.interp(lmap, ellA, ClA, right=0.0)
        amp = jnp.sqrt(jnp.maximum(Cl2d, 0.0) / (dy * dx_b))
        return jnp.fft.irfft2(F * amp, s=shape)

    bands = jax.lax.map(one_band, dxs)          # (B, ny, nx)
    t = (dx_rows - dxLo) / jnp.maximum(dxHi - dxLo, 1e-300) * (n_bands - 1)
    b0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n_bands - 2)
    w = jnp.clip(t - b0, 0.0, 1.0)[:, None]
    rows = jnp.arange(ny)
    return (1.0 - w) * bands[b0, rows, :] + w * bands[b0 + 1, rows, :]


def dec_band_count(dx_rows, target_frac=0.02, max_bands=16):
    """Number of reference scales so adjacent bands differ by less than
    ``target_frac`` in dl/l (host-side; 1 means a single-scale draw is
    already accurate to the target)."""
    dx_rows = np.asarray(dx_rows, dtype=float)
    spread = dx_rows.max() / max(dx_rows.min(), 1e-300) - 1.0
    if spread <= target_frac:
        return 1
    return int(np.clip(np.ceil(spread / target_frac) + 1, 2, max_bands))


def sim_cmb_map(key, shape, pix_scales_rad, beamBell=None, beamEll=None,
                noiseLevel=None, ClTT=None, dtype=jnp.float64,
                dx_rows=None):
    """Simulated (optionally beam-convolved) CMB map plus white noise.

    Parity with ``maps.simCMBMap`` (``nemo/maps.py:1223-1264``): the beam is
    applied to C_l (amplitude, matching the reference's ``ps *= lbeam``).

    ``dx_rows`` (per-row x pixel scale in radians) switches on the
    declination-aware banded synthesis (:func:`gaussian_field_decaware`),
    shrinking the flat-sky multipole distortion at high |dec| by ~two
    orders of magnitude relative to the reference's SHT-exact sims.
    """
    if ClTT is None:
        Cl = lensedClTT()
    else:
        Cl = np.asarray(ClTT)
    ell = np.arange(len(Cl), dtype=float)
    if beamBell is not None:
        lbeam = np.interp(ell, np.asarray(beamEll), np.asarray(beamBell))
        Cl = Cl * lbeam  # NOTE: reference multiplies C_l by B_l (not B_l^2)
    k1, k2 = jax.random.split(key)
    nBands = 1 if dx_rows is None else dec_band_count(dx_rows)
    if nBands > 1:
        m = gaussian_field_decaware(k1, shape, pix_scales_rad[0],
                                    jnp.asarray(dx_rows), ell, Cl,
                                    n_bands=nBands, dtype=dtype)
    else:
        m = gaussian_field(k1, shape, pix_scales_rad, ell, Cl, dtype=dtype)
    if noiseLevel is not None:
        m = m + sim_noise_map(k2, shape, noiseLevel, dtype=dtype)
    return m


def sim_noise_map(key, shape, noiseLevel, pix_scales_rad=None, lKnee=None,
                  alpha=-3.0, lmax_atm=6000, dtype=jnp.float64):
    """White or 1/f ('atmospheric') noise map.

    Parity with ``maps.simNoiseMap`` (``nemo/maps.py:1267-1352``): with
    ``lKnee`` the band-limited modes are shaped by
    N_l = (lKnee/l)^-alpha + 1 while modes beyond ``lmax_atm`` stay white,
    then scaled by the per-pixel noise level.
    """
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    noiseLevel = jnp.asarray(noiseLevel, dtype=dtype)
    white = jax.random.normal(key, shape, dtype=dtype)
    if lKnee is None:
        if noiseLevel.ndim == 0:
            return white * noiseLevel
        return jnp.where(noiseLevel > 0, white * noiseLevel, 0.0)
    if pix_scales_rad is None:
        raise ValueError("pix_scales_rad needed for 1/f noise")
    lmap = fourier.rmodlmap_graph(shape, pix_scales_rad)
    with np.errstate(divide="ignore"):
        Nl = jnp.where(lmap > 0, (lKnee / jnp.maximum(lmap, 1e-9)) ** -alpha
                       + 1.0, 0.0)
    shape_l = jnp.where(lmap <= lmax_atm, jnp.sqrt(Nl), 1.0)
    shaped = fourier.irfft2(fourier.rfft2(white) * shape_l, s=shape)
    if noiseLevel.ndim == 0:
        return shaped * noiseLevel
    return jnp.where(noiseLevel > 0, shaped * noiseLevel, 0.0)
