"""Mass-pipeline tests: the nemoMass mass-table machinery and the mock ->
mass round trip (clusters.robot: 'Mock to mass' unbiased to 2-3%)."""

import os

import numpy as np
import pytest

from nemo_tpu import catalogs, completeness
from nemo_tpu.cli.nemoMass_main import calcMassTable
from nemo_tpu.mock import MockSurvey
from nemo_tpu.models.qfit import QFit
from nemo_tpu.utils.tables import Table
from tests.test_cluster_e2e import cluster_run  # noqa: F401
from tests.test_injection_and_spec import _ensure_outputs


@pytest.fixture(scope="module")
def mass_setup(cluster_run):  # noqa: F811
    inputTab, cat, config, simDir, w, configPath = cluster_run
    _ensure_outputs(config, cat)
    completeness.getFRelWeights(config)
    Q = QFit(QSource="fit", selFnDir=config.selFnDir)
    massOptions = dict(config.parDict["massOptions"])
    mockSurvey = MockSurvey(1e13, 600.0, 0.0, 2.0, massOptions["H0"],
                            massOptions["Om0"], massOptions["Ob0"],
                            massOptions["sigma8"], massOptions["ns"],
                            delta=massOptions["delta"],
                            rhoType=massOptions["rhoType"],
                            enableDrawSample=True,
                            transferFunction="eisenstein_hu")
    fRelWeightsDict = completeness.getFRelWeights(config)
    return config, Q, massOptions, mockSurvey, fRelWeightsDict


def test_calc_mass_table(mass_setup):
    config, Q, massOptions, mockSurvey, fRel = mass_setup
    # A fake catalog of strong clusters with known mass, via the forward
    # scaling relation
    from nemo_tpu.models import scaling
    zs = np.array([0.2, 0.4, 0.8])
    M500s = np.array([3e14, 4e14, 5e14])
    rows = {"name": [], "RADeg": [], "decDeg": [], "fixed_y_c": [],
            "fixed_err_y_c": [], "redshift": [], "redshiftErr": [],
            "tileName": []}
    for z, M in zip(zs, M500s):
        y0, _, _ = scaling.y0FromLogM500(
            np.log10(M), z, Q, mockSurvey.cosmoModel,
            tenToA0=massOptions["tenToA0"], B0=massOptions["B0"],
            Mpivot=massOptions["Mpivot"],
            applyRelativisticCorrection=False, tileName="PRIMARY")
        rows["name"].append("m%.1f" % (M / 1e14))
        rows["RADeg"].append(30.0)
        rows["decDeg"].append(0.0)
        rows["fixed_y_c"].append(float(y0) / 1e-4)
        rows["fixed_err_y_c"].append(float(y0) / 1e-4 / 15.0)
        rows["redshift"].append(z)
        rows["redshiftErr"].append(0.0)
        rows["tileName"].append("PRIMARY")
    tab = Table({k: np.array(v) for k, v in rows.items()})
    mo = dict(massOptions)
    mo["relativisticCorrection"] = False
    tab = calcMassTable(tab, mo, Q, fRel, mockSurvey)
    # Uncorrected masses recover truth to a few % (no noise, no scatter
    # applied; the Eddington-corrected masses sit a bit lower)
    rec = np.asarray(tab["M500cUncorr"]) * 1e14
    np.testing.assert_allclose(rec, M500s, rtol=0.03)
    # Corrected (de-biased) masses are lower but close
    recCorr = np.asarray(tab["M500c"]) * 1e14
    assert np.all(recCorr < rec * 1.02)
    assert np.all(recCorr > 0.7 * M500s)
    # Other mass definitions present and ordered sensibly
    assert np.all(np.asarray(tab["M200m"]) > np.asarray(tab["M500c"]))
    # Config-driven otherMassEstimates (reference bin/nemoMass:327-331):
    # a custom definition produces its columns, and an unsupported
    # concentration-mass relation raises instead of being swapped
    tab2 = calcMassTable(
        Table({k: np.array(v) for k, v in rows.items()}), mo, Q, fRel,
        mockSurvey,
        otherMassEstimates=[{"delta": 200, "rhoType": "critical",
                             "concMassRelation": "Bhattacharya13"}])
    assert "M200c" in tab2.keys() and "M200m" not in tab2.keys()
    assert np.all(np.asarray(tab2["M200c"]) > np.asarray(tab2["M500c"]))
    with pytest.raises(ValueError):
        calcMassTable(Table({k: np.array(v) for k, v in rows.items()}),
                      mo, Q, fRel, mockSurvey,
                      otherMassEstimates=[{"delta": 200,
                                           "rhoType": "matter",
                                           "concMassRelation": "Duffy08"}])
    # Calibrated masses (rescaleFactor) scale correctly
    if "M500cCal" in tab.keys():
        np.testing.assert_allclose(
            np.asarray(tab["M500cCal"]),
            np.asarray(tab["M500c"]) / massOptions["rescaleFactor"]
            if "rescaleFactor" in massOptions else
            np.asarray(tab["M500cCal"]))


def test_batched_mass_matches_per_row(mass_setup):
    """The one-device-call batched mass inference (scaling.calcMassBatch)
    reproduces the per-row calcMass path, including photo-z rows
    (zErr > 0) and the Eddington-de-biased + Uncorr variants."""
    config, Q, massOptions, mockSurvey, fRel = mass_setup
    from nemo_tpu.models import scaling
    rng = np.random.default_rng(123)
    n = 12
    y0s = 10 ** rng.uniform(-4.6, -3.6, n)
    y0Errs = y0s / rng.uniform(5, 20, n)
    zs = rng.uniform(0.1, 1.2, n)
    zErrs = np.where(rng.random(n) < 0.5, 0.0, rng.uniform(0.01, 0.05, n))
    batch = scaling.calcMassBatch(
        y0s, y0Errs, zs, zErrs, Q, mockSurvey,
        tenToA0=massOptions["tenToA0"], B0=massOptions["B0"],
        Mpivot=massOptions["Mpivot"], sigma_int=massOptions["sigma_int"],
        applyRelativisticCorrection=False,
        tileNames=["PRIMARY"] * n)
    for i in range(n):
        corr = scaling.calcMass(
            y0s[i], y0Errs[i], zs[i], zErrs[i], Q, mockSurvey,
            tenToA0=massOptions["tenToA0"], B0=massOptions["B0"],
            Mpivot=massOptions["Mpivot"],
            sigma_int=massOptions["sigma_int"],
            applyMFDebiasCorrection=True,
            applyRelativisticCorrection=False, tileName="PRIMARY")
        unCorr = scaling.calcMass(
            y0s[i], y0Errs[i], zs[i], zErrs[i], Q, mockSurvey,
            tenToA0=massOptions["tenToA0"], B0=massOptions["B0"],
            Mpivot=massOptions["Mpivot"],
            sigma_int=massOptions["sigma_int"],
            applyMFDebiasCorrection=False,
            applyRelativisticCorrection=False, tileName="PRIMARY")
        np.testing.assert_allclose(batch["M500c"][i], corr["M500c"],
                                   rtol=1e-5)
        np.testing.assert_allclose(batch["M500c_errPlus"][i],
                                   corr["M500c_errPlus"], rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(batch["M500c_errMinus"][i],
                                   corr["M500c_errMinus"], rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(batch["M500cUncorr"][i],
                                   unCorr["M500c"], rtol=1e-5)
        np.testing.assert_allclose(batch["Q"][i], corr["Q"], rtol=1e-5)


def test_mock_to_mass_round_trip(mass_setup):
    """Draw a mock with scatters off, push fixed_y_c back through the mass
    inference, compare with true masses (clusters.robot:8-14, 2%
    tolerance loosened slightly for EH98-vs-CAMB sigma(M))."""
    config, Q, massOptions, mockSurvey, fRel = mass_setup
    rng = np.random.default_rng(77)
    mock = mockSurvey.drawSample(
        3e-6, massOptions, QFit=Q, photFilterLabel="Arnaud_M2e14_z0p4",
        tileName="PRIMARY", SNRLimit=8.0, applySNRCut=True,
        applyPoissonScatter=False, applyIntrinsicScatter=False,
        applyNoiseScatter=False, applyRelativisticCorrection=False,
        rng=rng)
    assert mock is not None and len(mock) > 10
    from nemo_tpu.models import scaling
    sel = rng.choice(len(mock), size=min(10, len(mock)), replace=False)
    ratios = []
    for i in sel:
        row = mock[int(i)]
        massDict = scaling.calcMass(
            row["fixed_y_c"] * 1e-4, row["fixed_err_y_c"] * 1e-4,
            row["redshift"], 0.0, Q, mockSurvey,
            tenToA0=massOptions["tenToA0"], B0=massOptions["B0"],
            Mpivot=massOptions["Mpivot"],
            sigma_int=massOptions["sigma_int"],
            applyMFDebiasCorrection=False,
            applyRelativisticCorrection=False,
            calcErrors=False, tileName="PRIMARY")
        ratios.append(massDict["M500c"] / row["true_M500c"])
    ratios = np.array(ratios)
    assert abs(np.median(ratios) - 1) < 0.03, ratios
