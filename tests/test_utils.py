import numpy as np
import pytest

from nemo_tpu.utils import fits as nfits
from nemo_tpu.utils import tables, wcs


def test_fits_image_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.float64, np.float32, np.int32, np.uint8):
        data = (rng.normal(0, 100, (17, 23))).astype(dtype)
        path = tmp_path / ("img_%s.fits" % np.dtype(dtype).name)
        hdr = nfits.Header()
        hdr["CRVAL1"] = 12.5
        hdr["CTYPE1"] = "RA---CAR"
        hdr["TESTBOOL"] = True
        nfits.write_image(path, data, header=hdr)
        out, outhdr = nfits.read_image(path)
        np.testing.assert_array_equal(out, data)
        assert outhdr["CRVAL1"] == 12.5
        assert outhdr["CTYPE1"] == "RA---CAR"
        assert outhdr["TESTBOOL"] is True


def test_fits_mef_roundtrip(tmp_path):
    arrays = {"TILE_A": np.arange(12.0).reshape(3, 4),
              "TILE_B": np.ones((5, 2), dtype=np.uint8)}
    path = tmp_path / "mef.fits"
    nfits.write_mef(path, arrays)
    hdus = nfits.read(path)
    names = [h.name for h in hdus if h.data is not None]
    assert names == ["TILE_A", "TILE_B"]
    d, _ = nfits.read_image(path, ext="TILE_B")
    np.testing.assert_array_equal(d, arrays["TILE_B"])


def test_fits_table_roundtrip(tmp_path):
    tab = tables.Table({
        "name": np.array(["ACT-CL J0000.0+0000", "X"]),
        "RADeg": np.array([10.5, 350.2]),
        "SNR": np.array([5.5, 12.25], dtype=np.float32),
        "numSigPix": np.array([3, 99], dtype=np.int64),
        "flag": np.array([True, False]),
    })
    tab.meta["NEMOVER"] = "0.1.0"
    path = tmp_path / "cat.fits"
    tab.write(path)
    out = tables.Table.read(path)
    assert list(out.keys()) == list(tab.keys())
    np.testing.assert_allclose(out["RADeg"], tab["RADeg"])
    np.testing.assert_allclose(out["SNR"], tab["SNR"])
    np.testing.assert_array_equal(out["numSigPix"], tab["numSigPix"])
    np.testing.assert_array_equal(out["flag"], tab["flag"])
    assert out["name"][0] == "ACT-CL J0000.0+0000"
    assert out.meta["NEMOVER"] == "0.1.0"


def test_csv_roundtrip(tmp_path):
    tab = tables.Table({"a": np.array([1.5, 2.5]), "b": np.array([1, 2])})
    path = tmp_path / "t.csv"
    tab.write(path)
    out = tables.Table.read(path)
    np.testing.assert_allclose(out["a"], tab["a"])
    np.testing.assert_array_equal(out["b"], tab["b"])


def test_table_ops():
    tab = tables.Table({"x": np.array([3.0, 1.0, 2.0]),
                        "y": np.array([30, 10, 20])})
    tab.sort("x")
    np.testing.assert_array_equal(tab["y"], [10, 20, 30])
    sub = tab[tab["x"] > 1.5]
    assert len(sub) == 2
    stacked = tables.vstack([tab, sub])
    assert len(stacked) == 5
    row = tab[0]
    assert row["y"] == 10


def test_car_wcs_roundtrip():
    w = wcs.makeWCS((1031, 1032), 0.5 / 60.0, centreRADeg=35.0,
                    centreDecDeg=-5.0)
    ra, dec = w.pix2wcs(516.0, 515.5)
    x, y = w.wcs2pix(ra, dec)
    assert abs(x - 516.0) < 1e-8 and abs(y - 515.5) < 1e-8
    # vectorised
    xs = np.array([0.0, 100.0, 500.0])
    ys = np.array([0.0, 200.0, 900.0])
    coords = w.pix2wcs(xs, ys)
    back = w.wcs2pix(coords[:, 0], coords[:, 1])
    np.testing.assert_allclose(back[:, 0], xs, atol=1e-8)
    np.testing.assert_allclose(back[:, 1], ys, atol=1e-8)
    # RA decreases with x (cdelt1 < 0)
    ra0, _ = w.pix2wcs(0, 515)
    ra1, _ = w.pix2wcs(1000, 515)
    assert ra0 > ra1


def test_car_wcs_ra_wrap():
    w = wcs.makeWCS((100, 100), 0.5 / 60.0, centreRADeg=0.0, centreDecDeg=0.0)
    ra, dec = w.pix2wcs(0.0, 50.0)
    assert 0 <= ra < 360
    x, y = w.wcs2pix(ra, dec)
    assert abs(x) < 1e-6


def test_tan_wcs_roundtrip():
    w = wcs.makeWCS((200, 200), 1.0 / 60.0, centreRADeg=120.0,
                    centreDecDeg=-55.0, projection="TAN")
    ra, dec = w.pix2wcs(30.0, 170.0)
    x, y = w.wcs2pix(ra, dec)
    assert abs(x - 30.0) < 1e-6 and abs(y - 170.0) < 1e-6


def test_ang_sep():
    assert abs(wcs.calcAngSepDeg(0, 0, 1, 0) - 1.0) < 1e-10
    assert abs(wcs.calcAngSepDeg(0, 60, 1, 60) - 0.5) < 1e-3
    seps = wcs.calcAngSepDeg(10.0, 0.0, np.array([10.0, 11.0]),
                             np.array([0.0, 0.0]))
    np.testing.assert_allclose(seps, [0.0, 1.0], atol=1e-10)


def test_clip_radec():
    w = wcs.makeWCS((600, 600), 1.0 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    data = np.arange(600 * 600, dtype=float).reshape(600, 600)
    clip = wcs.clipUsingRADecCoords(data, w, 28.0, 32.0, -2.0, 2.0)
    assert clip["data"].shape[0] > 200 and clip["data"].shape[1] > 200
    # centre of clip should be at ~ (30, 0)
    cw = clip["wcs"]
    ra, dec = cw.pix2wcs(clip["data"].shape[1] / 2, clip["data"].shape[0] / 2)
    assert abs(ra - 30) < 0.1 and abs(dec) < 0.1
    # WCS consistency: a pixel in the clip maps to same sky coords as parent
    x0, x1, y0, y1 = clip["clippedSection"]
    ra_p, dec_p = w.pix2wcs(x0 + 10, y0 + 20)
    ra_c, dec_c = cw.pix2wcs(10, 20)
    assert abs(ra_p - ra_c) < 1e-8 and abs(dec_p - dec_c) < 1e-8


def test_load_wcs_from_header_text():
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "smallTestSurveyMaskHeader.txt")
    if not os.path.exists(path):
        pytest.skip("header fixture not present yet")
    w = wcs.loadWCSFromHeaderText(path)
    assert w.naxis1 == 1032 and w.naxis2 == 1031


def test_read_image_mmap_matches_full_read(tmp_path):
    import numpy as np
    from nemo_tpu.utils import fits as nfits
    rng = np.random.default_rng(1)
    m = rng.normal(0, 1, (120, 250)).astype(np.float32)
    path = str(tmp_path / "m.fits")
    nfits.write_image(path, m, nfits.Header({"CRVAL1": 30.0}))
    arr, header = nfits.read_image_mmap(path)
    assert header["CRVAL1"] == 30.0
    # the mapped view equals the full read (big-endian view vs native)
    full, _ = nfits.read_image(path)
    np.testing.assert_array_equal(np.asarray(arr, dtype=np.float32), full)
    # slicing a tile touches only that tile
    tile = np.array(arr[10:20, 30:90], dtype=np.float32)
    np.testing.assert_array_equal(tile, m[10:20, 30:90])
    # gzip and compressed HDUs refuse to map
    import pytest
    gzPath = str(tmp_path / "m.fits.gz")
    nfits.write_image(gzPath, m)
    with pytest.raises(IOError):
        nfits.read_image_mmap(gzPath)
    cPath = str(tmp_path / "c.fits")
    nfits.write_image(cPath, m, compressionType="RICE_1")
    with pytest.raises(IOError):
        nfits.read_image_mmap(cPath)


def test_fits_continue_long_strings(tmp_path):
    """Long-string (CONTINUE) convention in headers, as written by cfitsio
    for long file paths in real survey maps."""
    from nemo_tpu.utils import fits as nfits
    cards = []
    for s in ("SIMPLE  =                    T",
              "BITPIX  =                    8",
              "NAXIS   =                    0",
              "MYPATH  = '" + "a" * 60 + "&'",
              "CONTINUE  'bbbb.fits'",
              "END"):
        cards.append(s.ljust(80))
    blob = "".join(cards).encode()
    blob += b" " * ((2880 - len(blob) % 2880) % 2880)
    path = str(tmp_path / "cont.fits")
    with open(path, "wb") as f:
        f.write(blob)
    h = nfits.read(path)[0].header
    assert h["MYPATH"] == "a" * 60 + "bbbb.fits"
