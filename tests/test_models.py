import numpy as np
import pytest

from nemo_tpu.models import beams, cosmology, gnfw, profiles, sz


@pytest.fixture(scope="module")
def cosmo():
    return cosmology.fiducialCosmoModel()


def test_background(cosmo):
    assert abs(cosmo.Ez(0.0) - 1.0) < 1e-4
    # E(1) for Om=0.3 flat: sqrt(0.3*8 + 0.7) ~ 1.7607 (+tiny radiation)
    assert abs(cosmo.Ez(1.0) - np.sqrt(0.3 * 8 + 0.7)) < 2e-3
    # Comoving distance to z=1 for this cosmology ~ 3303 Mpc (h=0.7)
    chi1 = cosmo.comovingDistance(1.0)
    assert abs(chi1 - 3303) < 15
    # Angular diameter distance to z=0.4 ~ 1120 Mpc
    da = cosmo.angularDiameterDistance(0.4)
    assert abs(da - 1120) < 15


def test_critical_density(cosmo):
    # rho_crit,0 = 2.775e11 h^2 MSun/Mpc^3
    assert abs(cosmo.rho_crit0 / (2.775e11 * 0.49) - 1) < 1e-3
    assert cosmo.criticalDensity(1.0) > cosmo.criticalDensity(0.0)


def test_growth(cosmo):
    assert abs(cosmo.growthFactor(0.0) - 1.0) < 1e-6
    # For Om=0.3 LCDM, D(1) ~ 0.61
    assert abs(cosmo.growthFactor(1.0) - 0.61) < 0.02
    assert cosmo.growthFactor(2.0) < cosmo.growthFactor(1.0)


def test_sigma8_normalisation(cosmo):
    s8 = cosmo.sigmaR(8.0 / cosmo.h)
    assert abs(s8 - 0.8) < 1e-6
    # sigma(M) decreasing with M
    Ms = np.array([1e13, 1e14, 1e15])
    sig = cosmo.sigmaM(Ms)
    assert np.all(np.diff(sig) < 0)
    # typical value: sigma(1e14 MSun) ~ 1.0 for this cosmology
    assert 0.8 < sig[1] < 1.3


def test_theta500(cosmo):
    # M500c = 2e14 at z = 0.4: theta500 should be a few arcmin
    t = cosmology.calcTheta500Arcmin(0.4, 2e14, cosmo)
    # R500 ~ 0.77 Mpc, DA ~ 1120 Mpc -> ~2.4 arcmin
    assert 2.0 < t < 3.0
    # round trip through M500cFromTheta500
    M = cosmology.M500cFromTheta500(t, 0.4, cosmo)
    assert abs(M / 2e14 - 1) < 1e-6
    # more massive or closer -> larger
    assert cosmology.calcTheta500Arcmin(0.4, 4e14, cosmo) > t
    assert cosmology.calcTheta500Arcmin(0.2, 2e14, cosmo) > t


def test_hmf_shape(cosmo):
    M = np.logspace(13.5, 15.5, 50)
    n0 = cosmo.dndlnM(M, 0.0, delta=500, rhoType="critical")
    n1 = cosmo.dndlnM(M, 1.0, delta=500, rhoType="critical")
    assert np.all(n0 > 0)
    assert np.all(np.diff(np.log(n0)) < 0)  # falling with mass
    # massive clusters are rarer at high z
    assert n1[-1] < n0[-1]
    # Rough abundance sanity: n(~2e14 Msun, z=0) dex^-1 ~ 1e-5.5 Mpc^-3
    i = np.argmin(abs(M - 2e14))
    dndlog10M = n0[i] * np.log(10)
    assert 10 ** -6.5 < dndlog10M < 10 ** -4.5


def test_mass_conversion_roundtrip(cosmo):
    M500c = 3e14
    M200m = cosmo.convertMassDef(M500c, 0.3, 500, "critical", 200, "matter")
    assert M200m > M500c  # enclosing lower density -> larger mass
    back = cosmo.convertMassDef(M200m, 0.3, 200, "matter", 500, "critical")
    assert abs(back / M500c - 1) < 0.02
    M200c = cosmo.convertMassDef(M500c, 0.3, 500, "critical", 200, "critical")
    assert M500c < M200c < M200m


def test_gnfw_los_against_log_riemann():
    # Independent oracle: log-spaced Riemann sum in u = ln x with analytic
    # wing corrections (the published Hasselfield algorithm).
    def oracle(b, p):
        def xfunc(x):
            r = np.sqrt(x ** 2 + b ** 2)
            return x * gnfw.profile3d(r, p)

        xg = np.logspace(np.log10(b) - 3, np.log10(b) + 3, 4000)
        y_max = xfunc(xg).max()
        G, B = p["gamma"], p["beta"]
        x_lo = (y_max * 1e-7) ** (1 / (1 - G))
        x_hi = (y_max * 1e-7) ** (1 / (1 - B))
        u = np.linspace(np.log(x_lo), np.log(x_hi), 3000)
        du = u[1] - u[0]
        x = np.exp(u)
        I1 = np.sum(du * xfunc(x))
        I2 = x_lo ** (1 - G) / (1 - G) + x_hi ** (1 - B) / (1 - B)
        return I1 + I2

    p = dict(gnfw.DEFAULT_PARAMS)
    for b in (0.1, 0.5, 1.0, 3.0):
        ours = gnfw.los_integral(b, p)
        ref = oracle(b, p)
        assert abs(ours / ref - 1) < 1e-4, (b, ours, ref)


def test_gnfw_cylindrical_profile():
    b, prof = gnfw.cylindrical_profile()
    assert prof[0] == 1.0  # normalised at the smallest b
    assert np.all(np.diff(prof) <= 1e-12)  # monotone decreasing
    assert prof[-1] < 1e-4


def test_beam_roundtrip(tmp_path):
    path = beams.makeGaussianBeamFile(str(tmp_path / "beam.txt"), 1.4)
    beam = beams.BeamProfile(beamFileName=str(path))
    assert abs(beam.FWHMArcmin - 1.4) < 0.05
    # B_ell of a Gaussian beam: exp(-l^2 sigma^2 / 2)
    sigma = np.radians(1.4 / 60) / (2 * np.sqrt(2 * np.log(2)))
    ells = np.array([1000.0, 5000.0, 10000.0])
    expected = np.exp(-ells ** 2 * sigma ** 2 / 2)
    got = np.interp(ells, beam.ell, beam.Bell)
    # 0.1%-level offset from the l->0 edge of the FFTLog grid is expected
    # (cancels in the matched filter's signal-norm calibration)
    np.testing.assert_allclose(got, expected, atol=2e-3)
    assert beam.solidAngle_nsr > 0


def test_fsz():
    # Null of the thermal SZ effect is ~217 GHz
    assert sz.fSZ(148.0) < 0
    assert sz.fSZ(300.0) > 0
    assert abs(sz.fSZ(217.5)) < 0.02
    # y <-> deltaT round trip
    y = 2e-4
    dT = sz.convertToDeltaT(y, 148.0)
    assert dT < 0
    back = sz.convertToY(dT, 148.0)
    assert abs(back / y - 1) < 1e-12


def test_jy_conversions():
    dT = 100.0
    jy = sz.deltaTToJyPerSr(dT, 148.0)
    back = sz.JyPerSrToDeltaT(jy, 148.0)
    assert abs(back / dT - 1) < 1e-12
    assert jy > 0


def test_frel():
    cosmo = cosmology.fiducialCosmoModel()
    Ez = cosmo.Ez(0.2)
    f = sz.calcFRel(0.2, 3e14, Ez, obsFreqGHz=148.0)
    # At 148 GHz, Y0 = x coth(x/2) - 4 < 0, so the correction suppresses
    # the decrement: fRel is a few percent below 1 (as in H13)
    assert 0.9 < f < 1.0
    # Heavier cluster (hotter) -> larger suppression
    f2 = sz.calcFRel(0.2, 8e14, Ez, obsFreqGHz=148.0)
    assert f2 < f
    weighted = sz.calcWeightedFRel(0.2, 3e14, Ez, {148.0: 0.7, 98.0: 0.3})
    assert 0.9 < weighted < 1.0


def test_arnaud_profile_and_signal_map():
    d = profiles.makeArnaudModelProfile(0.4, 2e14)
    assert abs(d["prof"][0] - 1.0) < 1e-12
    assert 2.0 < d["theta500Arcmin"] < 3.0

    shape = (128, 128)
    pix = (np.radians(0.5 / 60), np.radians(0.5 / 60))
    import os
    beam_path = os.path.join(os.path.dirname(__file__), "data",
                             "beam_f150.txt")
    if not os.path.exists(beam_path):
        beams.makeGaussianBeamFile(beam_path, 1.4)
    m = profiles.makeArnaudModelSignalMap(0.4, 2e14, shape, pix,
                                          beam=beam_path, amplitude=2e-4)
    m = np.asarray(m)
    # Peak near the centre, amplitude reduced by beam+profile smearing but
    # same order as input
    iy, ix = np.unravel_index(np.argmax(m), m.shape)
    assert (iy, ix) == (64, 64)
    assert 0.3 * 2e-4 < m[64, 64] <= 2e-4
    # Approximate radial symmetry
    assert abs(m[64, 70] - m[64, 58]) / m[64, 64] < 1e-6
    assert abs(m[70, 64] - m[64, 70]) / m[64, 64] < 1e-6


def test_battaglia_profile():
    d = profiles.makeBattagliaModelProfile(0.4, 2e14)
    assert abs(d["prof"][0] - 1.0) < 1e-12
    # B12 profile is less extended than A10 at large radii (beta smaller but
    # different shape); just check it differs measurably
    a = profiles.makeArnaudModelProfile(0.4, 2e14)
    common = np.linspace(0.01, 0.2, 50)
    pa = np.interp(common, a["rDeg"], a["prof"])
    pb = np.interp(common, d["rDeg"], d["prof"])
    assert np.max(np.abs(pa - pb)) > 1e-3


def test_default_transfer_is_boltzmann_and_plumbs(monkeypatch):
    """Reference parity (nemo/MockSurvey.py:66): the DEFAULT transfer is
    boltzmann_camb, flowing through MockSurvey into FlatLCDM's native
    Boltzmann path.  The ~50 s solve is monkeypatched with the EH98
    shape so this stays a wiring test, not a solver test
    (test_boltzmann.py covers the physics)."""
    from nemo_tpu.mock import MockSurvey

    calls = []

    def fakeSolve(H0, Om0, Ob0):
        calls.append((H0, Om0, Ob0))
        kb = np.logspace(-4, np.log10(30.0), 160)
        c = cosmology.FlatLCDM(H0, Om0, Ob0, 0.8, 0.95)
        return c._eh98_transfer(kb) * kb ** 2   # raw-solver convention

    monkeypatch.setattr(cosmology, "_boltzmann_Tk_cached", fakeSolve)
    ms = MockSurvey(1e13, 600.0, 0.0, 1.0, 70.0, 0.30, 0.05, 0.80, 0.95)
    assert ms.transferFunction == "boltzmann"
    assert ms.cosmoModel.transferFunction == "boltzmann"
    assert calls == [(70.0, 0.30, 0.05)]
    # the spliced power behaves: finite, positive, sigma8 normalised
    assert abs(ms.cosmoModel.sigmaR(8.0 / 0.7) - 0.80) < 1e-6


def test_fiducial_cosmology_is_background_lazy():
    """The fiducial model (filter construction / Q fitting) must touch
    only the background: with the Boltzmann-default transfer an eager
    power build would put a ~50 s solve on every fitQ run."""
    c = cosmology.fiducialCosmoModel()
    cosmology.calcTheta500Arcmin(0.4, 2e14, c)
    assert c._kGrid is None or c.transferFunction == "eh98"


def test_mock_survey_counts_and_mass_pdf():
    """calcNumClustersExpected and getPLog10M (MockSurvey.py:310-356):
    cluster counts are in the right ballpark for a Planck-like cosmology
    and P(log10 M) is a normalised, decreasing mass function."""
    from nemo_tpu.mock import MockSurvey
    ms = MockSurvey(1e13, 600.0, 0.0, 2.0, 70.0, 0.30, 0.05, 0.80, 0.95,
                    transferFunction="eisenstein_hu")
    # full-sky-scaled count of M > 5e14 clusters to z < 2: hundreds over
    # the whole sky -> tens over 600 deg2... order of magnitude check
    n = ms.calcNumClustersExpected(MLimit=5e14)
    assert 1 < n < 200, n
    nAll = ms.calcNumClustersExpected(MLimit=1e14)
    assert nAll > 10 * n
    # P(log10M) at z=0.4: reference normalisation is trapz over M
    # (MockSurvey.py:352), so integrate against dM
    p = np.asarray(ms.getPLog10M(0.4))
    assert p.shape == ms.log10M.shape
    assert abs(np.trapezoid(p, ms.M) - 1) < 1e-6
    assert p[0] > p[-1] * 1e3                 # steeply falling with mass


def test_calc_completeness_fast_vs_montecarlo():
    """calcCompleteness (completeness.py:1267-1419): the 'fast' log-normal
    survival estimate and the 'montecarlo' drawSample histogram agree, the
    grid is monotone in mass, and unsupported methods raise."""
    from nemo_tpu.utils.tables import Table
    from nemo_tpu import completeness
    from nemo_tpu.mock import MockSurvey

    ms = MockSurvey(1e13, 600.0, 0.0, 2.0, 70.0, 0.30, 0.05, 0.80, 0.95,
                    enableDrawSample=True,
                    transferFunction="eisenstein_hu")

    class FlatQ:
        def getQ(self, theta500s, z=None, tileName=None):
            return np.ones_like(np.asarray(theta500s, dtype=float))

    sr = {"tenToA0": 4.95e-5, "B0": 0.08, "Mpivot": 3e14,
          "sigma_int": 0.2, "relativisticCorrection": True}
    RMSTab = Table({"areaDeg2": np.array([300.0, 300.0]),
                    "y0RMS": np.array([1.5e-5, 3.0e-5])})
    comp = completeness.calcCompleteness(RMSTab, 5.0, "1_1_0", ms, sr,
                                         FlatQ())
    assert comp.shape == (len(ms.z), len(ms.log10M))
    assert np.all(comp >= 0) and np.all(comp <= 1)
    # monotone increasing with mass at fixed z (mid-grid z)
    k = len(ms.z) // 2
    assert comp[k, -1] > 0.99
    assert np.all(np.diff(comp[k]) > -1e-6)

    zTest = float(ms.z[k])
    fast1d = completeness.calcCompleteness(RMSTab, 5.0, "1_1_0", ms, sr,
                                           FlatQ(), z=zTest)
    mc1d = completeness.calcCompleteness(
        RMSTab, 5.0, "1_1_0", ms, sr, FlatQ(), z=zTest,
        method="montecarlo", numDraws=200000, numIterations=10,
        rng=np.random.default_rng(7))
    # The HMF falls steeply through the 20-80% completeness band, so
    # per-bin MC statistics are noisy even at 2e6 draws; compare the
    # band average (the reference's own check is "both methods should
    # give consistent results", completeness.py:1291-1293)
    sel = (fast1d > 0.2) & (fast1d < 0.8)
    assert sel.sum() > 3
    assert abs(np.mean(fast1d[sel]) - np.mean(mc1d[sel])) < 0.08
    assert np.mean(np.abs(fast1d[sel] - mc1d[sel])) < 0.12

    with pytest.raises(ValueError):
        completeness.calcCompleteness(RMSTab, 5.0, "1_1_0", ms, sr,
                                      FlatQ(), method="nope")
