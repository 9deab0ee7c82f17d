"""PLIO_1 (IRAF line-list) codec, validated against libcfitsio.

The reference writes its masks with astropy/cfitsio PLIO_1 compression
(``nemo/maps.py:2371`` saveFITS compressionType='PLIO_1'), so reading a
reference-produced selFn directory needs a PLIO decoder.  libcfitsio
(present on this image) exports the codec primitives ``pl_p2li`` /
``pl_l2pi`` and the full writer - the strongest possible oracle: these
tests round-trip both directions and exchange whole FITS files with it.
Everything here skips cleanly if libcfitsio is unavailable.
"""

import ctypes as C

import numpy as np
import pytest

from nemo_tpu.utils import fits as nfits


def _cfitsio():
    try:
        lib = C.CDLL("libcfitsio.so.10")
    except OSError:
        try:
            lib = C.CDLL("libcfitsio.so")
        except OSError:
            pytest.skip("libcfitsio not available")
    lib.pl_p2li.restype = C.c_int
    lib.pl_l2pi.restype = C.c_int
    return lib


def _oracle_encode(lib, px):
    px = np.ascontiguousarray(px, dtype=np.int32).ravel()
    out = np.zeros(px.size * 7 + 32, dtype=np.int16)
    n = lib.pl_p2li(px.ctypes.data_as(C.c_void_p), C.c_int(1),
                    out.ctypes.data_as(C.c_void_p), C.c_int(px.size))
    assert n > 0
    return out[:n]


def _oracle_decode(lib, ll, npix):
    ll = np.ascontiguousarray(ll, dtype=np.int16)
    out = np.zeros(npix, dtype=np.int32)
    n = lib.pl_l2pi(ll.ctypes.data_as(C.c_void_p), C.c_int(1),
                    out.ctypes.data_as(C.c_void_p), C.c_int(npix))
    assert n >= 0
    return out


def _cases(rng):
    yield np.zeros(64, dtype=np.int32)
    yield np.ones(100, dtype=np.int32)
    yield (rng.random(1000) > 0.5).astype(np.int32)
    a = np.zeros(9000, dtype=np.int32)
    a[-1] = 1
    yield a
    a = np.zeros(30000, dtype=np.int32)
    a[10000:25000] = 1
    yield a
    yield (rng.integers(0, 8, 5000)).astype(np.int32)       # multi-value
    yield (rng.integers(0, 2 ** 20, 200)).astype(np.int32)  # large values
    a = np.zeros(8192, dtype=np.int32)
    a[::2] = rng.integers(1, 9, 4096)                       # alternating
    yield a


def test_plio_decode_matches_oracle_encode():
    lib = _cfitsio()
    rng = np.random.default_rng(11)
    for px in _cases(rng):
        ll = _oracle_encode(lib, px)
        got = nfits._plio_decode(ll.astype(">i2").tobytes(), px.size)
        np.testing.assert_array_equal(got, px)


def test_plio_encode_decodes_with_oracle():
    lib = _cfitsio()
    rng = np.random.default_rng(12)
    for px in _cases(rng):
        ll = nfits._plio_encode(px)
        got = _oracle_decode(lib, ll, px.size)
        np.testing.assert_array_equal(got, px)
        # and by our own decoder
        got2 = nfits._plio_decode(ll.astype(">i2").tobytes(), px.size)
        np.testing.assert_array_equal(got2, px)


def _cfitsio_write_plio(lib, path, data, tile=None, wcs=False):
    data = np.ascontiguousarray(data, dtype=np.int32)
    fptr = C.c_void_p()
    status = C.c_int(0)
    lib.ffinit(C.byref(fptr), ("!" + path).encode(), C.byref(status))
    assert status.value == 0, status.value
    lib.fits_set_compression_type(fptr, C.c_int(31), C.byref(status))
    assert status.value == 0, status.value
    if tile is not None:
        tiles = (C.c_long * 2)(tile[1], tile[0])
        lib.fits_set_tile_dim(fptr, C.c_int(2), tiles, C.byref(status))
        assert status.value == 0, status.value
    naxes = (C.c_long * 2)(data.shape[1], data.shape[0])
    lib.ffcrim(fptr, C.c_int(32), C.c_int(2), naxes, C.byref(status))
    assert status.value == 0, status.value
    if wcs:
        _cf_add_wcs(lib, fptr, status)
    lib.ffppr(fptr, C.c_int(31), C.c_longlong(1),
              C.c_longlong(data.size),
              data.ctypes.data_as(C.c_void_p), C.byref(status))
    assert status.value == 0, status.value
    lib.ffclos(fptr, C.byref(status))
    assert status.value == 0, status.value


def _cfitsio_read_image(lib, path, shape):
    fptr = C.c_void_p()
    status = C.c_int(0)
    # fits_open_image: auto-navigates past the empty primary to the
    # (compressed) image HDU - plain ffopen stays on the primary
    lib.ffiopn(C.byref(fptr), path.encode(), C.c_int(0), C.byref(status))
    assert status.value == 0, status.value
    out = np.zeros(shape, dtype=np.int32)
    anynul = C.c_int(0)
    lib.ffgpv(fptr, C.c_int(31), C.c_longlong(1),
              C.c_longlong(out.size), None,
              out.ctypes.data_as(C.c_void_p), C.byref(anynul),
              C.byref(status))
    assert status.value == 0, status.value
    lib.ffclos(fptr, C.byref(status))
    return out


def test_read_cfitsio_plio_file(tmp_path):
    """A cfitsio-written PLIO_1 tile-compressed mask (the reference's
    on-disk mask format) reads back exactly through our FITS layer."""
    lib = _cfitsio()
    rng = np.random.default_rng(13)
    mask = (rng.random((181, 233)) > 0.4).astype(np.int32)
    mask[40:90, 60:120] = 3          # multi-valued region
    path = str(tmp_path / "plio_cfitsio.fits")
    _cfitsio_write_plio(lib, path, mask)
    data, header = nfits.read_image(path)
    np.testing.assert_array_equal(np.asarray(data), mask)
    # non-default tiling too
    path2 = str(tmp_path / "plio_cfitsio_tiled.fits")
    _cfitsio_write_plio(lib, path2, mask, tile=(64, 100))
    data2, _ = nfits.read_image(path2)
    np.testing.assert_array_equal(np.asarray(data2), mask)


def test_write_plio_file_reads_back_everywhere(tmp_path):
    """Our PLIO_1 writer round-trips through our reader AND cfitsio."""
    lib = _cfitsio()
    rng = np.random.default_rng(14)
    mask = (rng.random((97, 143)) > 0.6).astype(np.uint8)
    path = str(tmp_path / "plio_ours.fits")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # must NOT warn/substitute
        nfits.write_image(path, mask, compressionType="PLIO_1")
    data, _ = nfits.read_image(path)
    np.testing.assert_array_equal(np.asarray(data), mask)
    theirs = _cfitsio_read_image(lib, path, mask.shape)
    np.testing.assert_array_equal(theirs, mask)


def _cf_add_extname(lib, fptr, name, status):
    lib.ffukys(fptr, b"EXTNAME", name.encode(), b"", C.byref(status))
    assert status.value == 0


def _cf_add_wcs(lib, fptr, status):
    for key, val in (("CTYPE1", "RA---CAR"), ("CTYPE2", "DEC--CAR")):
        lib.ffukys(fptr, key.encode(), val.encode(), b"",
                   C.byref(status))
    for key, val in (("CRVAL1", 30.0), ("CRVAL2", 0.0), ("CRPIX1", 25.0),
                     ("CRPIX2", 20.0), ("CDELT1", -0.01),
                     ("CDELT2", 0.01)):
        lib.ffukyd(fptr, key.encode(), C.c_double(val), C.c_int(10),
                   b"", C.byref(status))
    assert status.value == 0


def test_loadTile_reads_reference_style_masks(tmp_path):
    """The migration surface: completeness._loadTile reading a selFn
    layout as the reference writes it - PLIO_1-compressed masks, both as
    per-tile files and as a MEF with one EXTNAME'd extension per tile
    (reference completeness.py:696-828 handles both layouts)."""
    lib = _cfitsio()
    from nemo_tpu import completeness

    rng = np.random.default_rng(21)
    tiles = {"1_0_0": (rng.random((40, 50)) > 0.3).astype(np.int32),
             "1_0_1": (rng.random((40, 50)) > 0.6).astype(np.int32)}

    # per-tile layout: selFnDir/<tile>/areaMask#<tile>.fits
    selFn1 = tmp_path / "selFn_pertile"
    for t, m in tiles.items():
        d = selFn1 / t
        d.mkdir(parents=True)
        _cfitsio_write_plio(lib, str(d / ("areaMask#%s.fits" % t)), m,
                            wcs=True)
    for t, m in tiles.items():
        data, wcs = completeness._loadTile(t, str(selFn1), "areaMask")
        np.testing.assert_array_equal(np.asarray(data), m)

    # MEF layout: selFnDir/areaMask.fits with EXTNAME per tile
    selFn2 = tmp_path / "selFn_mef"
    selFn2.mkdir()
    path = str(selFn2 / "areaMask.fits")
    fptr = C.c_void_p()
    status = C.c_int(0)
    lib.ffinit(C.byref(fptr), ("!" + path).encode(), C.byref(status))
    assert status.value == 0
    for t, m in tiles.items():
        m = np.ascontiguousarray(m, dtype=np.int32)
        lib.fits_set_compression_type(fptr, C.c_int(31), C.byref(status))
        naxes = (C.c_long * 2)(m.shape[1], m.shape[0])
        lib.ffcrim(fptr, C.c_int(32), C.c_int(2), naxes, C.byref(status))
        assert status.value == 0
        _cf_add_extname(lib, fptr, t, status)
        _cf_add_wcs(lib, fptr, status)
        lib.ffppr(fptr, C.c_int(31), C.c_longlong(1),
                  C.c_longlong(m.size), m.ctypes.data_as(C.c_void_p),
                  C.byref(status))
        assert status.value == 0
    lib.ffclos(fptr, C.byref(status))
    assert status.value == 0
    for t, m in tiles.items():
        data, wcs = completeness._loadTile(t, str(selFn2), "areaMask")
        np.testing.assert_array_equal(np.asarray(data), m)
