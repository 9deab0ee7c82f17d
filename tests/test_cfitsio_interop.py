"""Whole-file interop with libcfitsio for RICE/GZIP tile compression.

ACT/SO survey products in the wild are cfitsio-compressed; these tests
exchange files with the real library in both directions, including the
quantised-float paths (ZSCALE/ZZERO, NO_DITHER and SUBTRACTIVE_DITHER_1)
whose conventions were previously validated only against this module's
own reading of the tiled-image specification.  Skips if libcfitsio is
unavailable.
"""

import ctypes as C

import numpy as np
import pytest

from nemo_tpu.utils import fits as nfits


def _cfitsio():
    try:
        return C.CDLL("libcfitsio.so.10")
    except OSError:
        try:
            return C.CDLL("libcfitsio.so")
        except OSError:
            pytest.skip("libcfitsio not available")


_COMP = {"RICE_1": 11, "GZIP_1": 21, "GZIP_2": 22, "PLIO_1": 31}
_IMG = {np.dtype(np.uint8): (8, 11), np.dtype(np.int16): (16, 21),
        np.dtype(np.int32): (32, 31), np.dtype(np.float32): (-32, 42),
        np.dtype(np.float64): (-64, 82)}  # (BITPIX, cfitsio datatype)


def _cf_write(lib, path, data, comp, quantizeLevel=None, dither=None):
    data = np.ascontiguousarray(data)
    bitpix, dtcode = _IMG[data.dtype]
    fptr = C.c_void_p()
    status = C.c_int(0)
    lib.ffinit(C.byref(fptr), ("!" + path).encode(), C.byref(status))
    assert status.value == 0
    lib.fits_set_compression_type(fptr, C.c_int(_COMP[comp]),
                                  C.byref(status))
    assert status.value == 0
    if quantizeLevel is not None:
        lib.fits_set_quantize_level.argtypes = [C.c_void_p, C.c_float,
                                                C.POINTER(C.c_int)]
        lib.fits_set_quantize_level(fptr, C.c_float(quantizeLevel),
                                    C.byref(status))
        assert status.value == 0
    if dither is not None:
        # SUBTRACTIVE_DITHER_1 = 1; seed via fits_set_dither_seed
        lib.fits_set_quantize_method(fptr, C.c_int(1), C.byref(status))
        lib.fits_set_dither_seed(fptr, C.c_int(dither), C.byref(status))
        assert status.value == 0
    naxes = (C.c_long * 2)(data.shape[1], data.shape[0])
    lib.ffcrim(fptr, C.c_int(bitpix), C.c_int(2), naxes, C.byref(status))
    assert status.value == 0
    lib.ffppr(fptr, C.c_int(dtcode), C.c_longlong(1),
              C.c_longlong(data.size),
              data.ctypes.data_as(C.c_void_p), C.byref(status))
    assert status.value == 0, (comp, status.value)
    lib.ffclos(fptr, C.byref(status))
    assert status.value == 0


def _cf_read(lib, path, shape, asfloat):
    fptr = C.c_void_p()
    status = C.c_int(0)
    lib.ffiopn(C.byref(fptr), path.encode(), C.c_int(0), C.byref(status))
    assert status.value == 0, status.value
    dt = np.float64 if asfloat else np.int32
    out = np.zeros(shape, dtype=dt)
    anynul = C.c_int(0)
    lib.ffgpv(fptr, C.c_int(82 if asfloat else 31), C.c_longlong(1),
              C.c_longlong(out.size), None,
              out.ctypes.data_as(C.c_void_p), C.byref(anynul),
              C.byref(status))
    assert status.value == 0, status.value
    lib.ffclos(fptr, C.byref(status))
    return out


def test_read_cfitsio_rice_int(tmp_path):
    lib = _cfitsio()
    rng = np.random.default_rng(5)
    img = rng.integers(-200, 4000, (157, 211)).astype(np.int16)
    path = str(tmp_path / "cf_rice_i16.fits")
    _cf_write(lib, path, img, "RICE_1")
    data, _ = nfits.read_image(path)
    np.testing.assert_array_equal(np.asarray(data), img)


def test_read_cfitsio_rice_quantized_float(tmp_path):
    """cfitsio-quantised float RICE (NO_DITHER): our reader reproduces
    cfitsio's own unquantised values EXACTLY (same ZSCALE/ZZERO maths)."""
    lib = _cfitsio()
    rng = np.random.default_rng(6)
    img = rng.normal(0, 50, (120, 180)).astype(np.float32)
    path = str(tmp_path / "cf_rice_f32.fits")
    _cf_write(lib, path, img, "RICE_1", quantizeLevel=16.0)
    ours, _ = nfits.read_image(path)
    theirs = _cf_read(lib, path, img.shape, asfloat=True)
    np.testing.assert_allclose(np.asarray(ours, dtype=np.float64),
                               theirs, rtol=0, atol=1e-5)
    # and quantisation error vs the original is bounded by the step
    step = np.std(img) / 16.0
    assert np.abs(np.asarray(ours) - img).max() < 1.2 * step


def test_read_cfitsio_rice_dithered_float(tmp_path):
    """SUBTRACTIVE_DITHER_1: our deterministic dither stream must match
    cfitsio's for the file's ZDITHER0 - values agree exactly with what
    cfitsio itself unquantises."""
    lib = _cfitsio()
    rng = np.random.default_rng(7)
    img = rng.normal(0, 50, (90, 140)).astype(np.float32)
    path = str(tmp_path / "cf_rice_dither.fits")
    _cf_write(lib, path, img, "RICE_1", quantizeLevel=16.0, dither=77)
    ours, _ = nfits.read_image(path)
    theirs = _cf_read(lib, path, img.shape, asfloat=True)
    np.testing.assert_allclose(np.asarray(ours, dtype=np.float64),
                               theirs, rtol=0, atol=1e-5)


def test_cfitsio_reads_our_quantized_float(tmp_path):
    """Our float RICE writes (incl. ditherSeed) unquantise identically
    under cfitsio."""
    lib = _cfitsio()
    rng = np.random.default_rng(8)
    img = rng.normal(0, 30, (110, 130)).astype(np.float64)
    for name, seed in (("plain", None), ("dither", 1234)):
        path = str(tmp_path / ("ours_%s.fits" % name))
        nfits.write_image(path, img, compressionType="RICE_1",
                          ditherSeed=seed)
        ours, _ = nfits.read_image(path)
        theirs = _cf_read(lib, path, img.shape, asfloat=True)
        # our reader returns the file's float32 and the two unquantise
        # with different f64 rounding order - agree to ~1 float32 ULP
        atol = 4 * np.finfo(np.float32).eps * np.abs(img).max()
        np.testing.assert_allclose(np.asarray(ours, dtype=np.float64),
                                   theirs, rtol=0, atol=atol)


def test_read_cfitsio_gzip_variants(tmp_path):
    lib = _cfitsio()
    rng = np.random.default_rng(9)
    img = rng.integers(0, 1000, (77, 97)).astype(np.int32)
    for comp in ("GZIP_1", "GZIP_2"):
        path = str(tmp_path / ("cf_%s.fits" % comp))
        _cf_write(lib, path, img, comp)
        data, _ = nfits.read_image(path)
        np.testing.assert_array_equal(np.asarray(data), img)
