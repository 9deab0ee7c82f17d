import numpy as np
import pytest

from nemo_tpu import catalogs, filters, photometry
from nemo_tpu.utils.tables import Table
from tests.test_filters import FILTER_PARAMS, _make_sim_tile


@pytest.fixture(scope="module")
def filtered(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phot")
    mapDict, cluster = _make_sim_tile(y0=1e-3)
    f = {"label": "Arnaud_M2e14_z0p4", "class": "ArnaudModelMatchedFilter",
         "params": dict(FILTER_PARAMS)}
    out = filters.filterMaps([mapDict], f, "PRIMARY",
                             diagnosticsDir=str(tmp / "diagnostics"),
                             selFnDir=str(tmp / "selFn"))
    return out, mapDict


def test_find_objects_recovers_cluster(filtered):
    out, mapDict = filtered
    cat = photometry.findObjects(out, threshold=4.0, minObjPix=1,
                                 rejectBorder=0, removeRings=False)
    assert len(cat) >= 1
    # The strongest detection should be the injected central cluster
    i = np.argmax(cat["SNR"])
    ny, nx = out["data"].shape
    raC, decC = out["wcs"].pix2wcs(nx / 2, ny / 2)
    sep = catalogs.calcAngSepDeg(cat["RADeg"][i], cat["decDeg"][i], raC, decC)
    assert sep * 60 < 0.5  # within 0.5 arcmin
    assert cat["SNR"][i] > 10
    assert cat["name"][i].startswith("ACT-CL J")
    # template / tileName bookkeeping
    assert cat["template"][i] == "Arnaud_M2e14_z0p4"
    assert cat["tileName"][i] == "PRIMARY"


def test_measure_fluxes(filtered):
    out, mapDict = filtered
    cat = photometry.findObjects(out, threshold=4.0, minObjPix=1,
                                 rejectBorder=0, removeRings=False)
    photometry.measureFluxes(cat, out, photFilteredMapDict={
        "SNMap": out["SNMap"], "data": out["data"]})
    i = np.argmax(cat["SNR"])
    # y_c column in units of 1e-4: injected 1e-3 -> ~10
    assert 8.0 < cat["y_c"][i] < 11.0
    assert cat["err_y_c"][i] > 0
    assert "fixed_y_c" in cat.keys()
    np.testing.assert_allclose(cat["fixed_y_c"], cat["y_c"], rtol=1e-6)
    # deltaT at 148 GHz should be negative for clusters
    assert cat["deltaT_c"][i] < 0


def test_forced_photometry(filtered):
    out, mapDict = filtered
    ny, nx = out["data"].shape
    raC, decC = out["wcs"].pix2wcs(nx / 2, ny / 2)
    inputCat = Table({"RADeg": np.array([raC]), "decDeg": np.array([decC]),
                      "name": np.array(["target"])})
    cat = photometry.makeForcedPhotometryCatalog(out, inputCat)
    assert len(cat) == 1
    photometry.measureFluxes(cat, out)
    assert 8.0 < cat["y_c"][0] < 11.0


def test_iau_names():
    # 10h30m, +2d30' -> J1030.0+0230
    name = catalogs.makeName(157.5, 2.5)
    assert name == "ACT-CL J1030.0+0230"
    name = catalogs.makeName(0.0, -0.5, prefix="MOCK-CL")
    assert name == "MOCK-CL J0000.0-0030"
    long = catalogs.makeLongName(157.5, 2.5)
    assert long.startswith("ACT-CL J103000.0+0230")


def test_galactic_lat():
    # North galactic pole
    b = catalogs.galacticLatDeg(192.85948, 27.12825)
    assert abs(b - 90) < 0.01
    # Galactic centre
    b = catalogs.galacticLatDeg(266.40499, -28.93617)
    assert abs(b) < 0.01


def test_select_from_catalog():
    tab = Table({"SNR": np.array([3.0, 6.0, 10.0]),
                 "name": np.array(["a", "b", "c"])})
    out = catalogs.selectFromCatalog(tab, ["SNR > 5.0"])
    assert len(out) == 2
    out = catalogs.selectFromCatalog(tab, ["SNR > 5.0", "SNR < 8"])
    assert len(out) == 1 and out["name"][0] == "b"


def test_optimal_catalog_merge():
    catalogDict = {
        "filt1#t": {"catalog": Table({
            "RADeg": np.array([30.0, 31.0]),
            "decDeg": np.array([0.0, 0.5]),
            "SNR": np.array([5.0, 8.0]),
            "name": np.array(["x", "y"])})},
        "filt2#t": {"catalog": Table({
            "RADeg": np.array([30.0001, 35.0]),
            "decDeg": np.array([0.0001, 1.0]),
            "SNR": np.array([7.0, 4.0]),
            "name": np.array(["x2", "z"])})},
    }
    merged = catalogs.makeOptimalCatalog(catalogDict)
    assert len(merged) == 3
    # The duplicate at (30, 0) keeps the SNR = 7 entry
    i = np.argmin(np.abs(np.asarray(merged["RADeg"]) - 30.0))
    assert merged["SNR"][i] == 7.0


def test_remove_duplicates():
    tab = Table({
        "RADeg": np.array([30.0, 30.0001, 40.0]),
        "decDeg": np.array([0.0, 0.0001, 0.0]),
        "SNR": np.array([5.0, 9.0, 6.0]),
        "name": np.array(["a", "b", "c"]),
    })
    out, nDup, names = catalogs.removeDuplicates(tab)
    assert len(out) == 2
    assert nDup == 2
    assert set(out["name"]) == {"b", "c"}


def test_cross_match():
    ref = Table({"RADeg": np.array([10.0, 20.0]),
                 "decDeg": np.array([0.0, 0.0]),
                 "SNR": np.array([5.0, 6.0])})
    other = Table({"RADeg": np.array([10.001, 50.0]),
                   "decDeg": np.array([0.0, 0.0]),
                   "z": np.array([0.3, 0.7])})
    refM, otherM, seps = catalogs.crossMatch(ref, other, radiusArcmin=2.5)
    assert len(refM) == 1
    assert otherM["z"][0] == 0.3
    left = catalogs.removeCrossMatched(ref, other, radiusArcmin=2.5)
    assert len(left) == 1 and left["RADeg"][0] == 20.0


def test_catalog_within_image():
    from nemo_tpu.utils import wcs as nwcs
    w = nwcs.makeWCS((100, 100), 1.0 / 60),
    w = nwcs.makeWCS((100, 100), 1.0 / 60, centreRADeg=30.0)
    tab = Table({"RADeg": np.array([30.0, 90.0]),
                 "decDeg": np.array([0.0, 0.0])})
    cut = catalogs.getCatalogWithinImage(tab, (100, 100), w)
    assert len(cut) == 1


def test_remove_rings():
    """Ring artefacts (annular segments whose centre falls outside the
    segment) are dropped when removeRings is on (photometry.py:56-73)."""
    from nemo_tpu.utils import wcs as nwcs
    shape = (300, 300)
    w = nwcs.makeWCS(shape, 0.5 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    sn = np.zeros(shape)
    # a genuine point-like object
    sn += 10.0 * np.exp(-((yy - 80) ** 2 + (xx - 80) ** 2) / (2 * 2.0 ** 2))
    # a ring artefact: bright annulus, empty centre
    r = np.hypot(yy - 200, xx - 200)
    sn += 8.0 * np.exp(-((r - 12.0) ** 2) / (2 * 1.5 ** 2))
    fmd = {"data": sn * 1e-5, "SNMap": sn, "wcs": w,
           "surveyMask": np.ones(shape), "flagMask": np.zeros(shape),
           "mapUnits": "yc", "label": "t", "tileName": "PRIMARY",
           "beamSolidAngle_nsr": 0.0, "obsFreqGHz": "yc"}
    from nemo_tpu import photometry
    # peak-pixel positions (findCenterOfMass=False): ring peaks sit ON the
    # annulus, so without the ring test they enter the catalog
    catNoRings = photometry.findObjects(dict(fmd), threshold=4.0,
                                        minObjPix=1, removeRings=False,
                                        findCenterOfMass=False,
                                        verbose=False)
    catClean = photometry.findObjects(dict(fmd), threshold=4.0,
                                      minObjPix=1, removeRings=True,
                                      ringThresholdSigma=3,
                                      findCenterOfMass=False,
                                      verbose=False)
    # both find the real object
    from nemo_tpu import catalogs
    ref = Table({"RADeg": np.array([w.pix2wcs(80, 80)[0]]),
                 "decDeg": np.array([w.pix2wcs(80, 80)[1]])})
    m1, _, _ = catalogs.crossMatch(ref, catNoRings, radiusArcmin=1.0)
    m2, _, _ = catalogs.crossMatch(ref, catClean, radiusArcmin=1.0)
    assert len(m1) == 1 and len(m2) == 1
    # the ring is detected without removal, dropped with it
    ring = Table({"RADeg": np.array([w.pix2wcs(200, 200)[0]]),
                  "decDeg": np.array([w.pix2wcs(200, 200)[1]])})
    r1, _, _ = catalogs.crossMatch(ring, catNoRings, radiusArcmin=8.0)
    r2, _, _ = catalogs.crossMatch(ring, catClean, radiusArcmin=8.0)
    assert len(r1) >= 1
    assert len(r2) == 0


def test_measure_shapes_elongated_source():
    """measureShapes: SExtractor-style moments tag elongated objects
    (photometry.py:127-178)."""
    from nemo_tpu.utils import wcs as nwcs
    shape = (200, 200)
    w = nwcs.makeWCS(shape, 0.5 / 60.0, centreRADeg=30.0, centreDecDeg=0.0)
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    # elongated along x: sigma_x = 6, sigma_y = 2
    sn = 12.0 * np.exp(-((yy - 100) ** 2 / (2 * 2.0 ** 2)
                         + (xx - 100) ** 2 / (2 * 6.0 ** 2)))
    fmd = {"data": sn * 1e-5, "SNMap": sn, "wcs": w,
           "surveyMask": np.ones(shape), "flagMask": np.zeros(shape),
           "mapUnits": "yc", "label": "t", "tileName": "PRIMARY",
           "beamSolidAngle_nsr": 0.0, "obsFreqGHz": "yc"}
    from nemo_tpu import photometry
    cat = photometry.findObjects(dict(fmd), threshold=4.0, minObjPix=5,
                                 removeRings=False, measureShapes=True,
                                 verbose=False)
    assert len(cat) == 1
    row = cat[0]
    for col in ("ellipse_PA", "ellipse_A", "ellipse_B", "ellipse_e",
                "ellipse_x0", "ellipse_y0"):
        assert col in cat.keys()
    assert row["ellipse_A"] > row["ellipse_B"] > 0
    assert row["ellipse_e"] > 0.3          # clearly elongated
    # major axis along x: PA near 0 or 180 (degrees, x-axis convention)
    pa = float(row["ellipse_PA"]) % 180.0
    assert pa < 20 or pa > 160, pa
    assert abs(row["ellipse_x0"] - 100) < 2
    assert abs(row["ellipse_y0"] - 100) < 2
