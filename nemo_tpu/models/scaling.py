"""Mass-observable scaling relation and mass inference.

Rebuild of the mass part of ``nemo/signals.py`` (``calcMass``/``calcPMass``,
``signals.py:1293-1452``; ``getM500FromP``, ``signals.py:1207-1245``): the
UPP-style y0~ - M relation of Hasselfield et al. (2013), with Eddington
(mass-function) de-biasing and relativistic corrections.
"""

import numpy as np
from scipy import interpolate

from . import sz


def getM500FromP(P, log10M, calcErrors=True):
    """Maximum-likelihood mass + 68.3% interval from P(log10M)
    (``signals.py:1207-1245``).  Masses in 1e14 MSun."""
    tck = interpolate.splrep(log10M, P)
    fineLog10M = np.linspace(log10M.min(), log10M.max(), 10000)
    fineP = interpolate.splev(fineLog10M, tck)
    fineP = fineP / np.trapezoid(fineP, fineLog10M)
    index = int(np.argmax(fineP))
    clusterLogM500 = fineLog10M[index]
    clusterM500 = 10 ** clusterLogM500 / 1e14
    errMinus = errPlus = 0.0
    if calcErrors:
        for n in range(fineP.shape[0]):
            lo = index - n
            hi = index + n
            if lo < 0 or hi > fineP.shape[0]:
                break
            p = np.trapezoid(fineP[lo:hi], fineLog10M[lo:hi])
            if p >= 0.6827:
                errMinus = (10 ** clusterLogM500
                            - 10 ** fineLog10M[lo]) / 1e14
                errPlus = (10 ** fineLog10M[hi]
                           - 10 ** clusterLogM500) / 1e14
                break
    return clusterM500, errMinus, errPlus


def calcPMass(y0, y0Err, z, zErr, QFit, mockSurvey, tenToA0=4.95e-5, B0=0.08,
              Mpivot=3e14, sigma_int=0.2, Ez_gamma=2,
              onePlusRedshift_power=0.0, applyMFDebiasCorrection=True,
              applyRelativisticCorrection=True,
              fRelWeightsDict={148.0: 1.0}, return2D=False, returnQ=False,
              tileName=None):
    """P(log10 M500) for one cluster (``signals.py:1339-1452``)."""
    if zErr > 0:
        zMin = z - zErr * 5
        zMax = z + zErr * 5
        zMask = (mockSurvey.z >= zMin) & (mockSurvey.z < zMax)
        zRange = mockSurvey.z[zMask]
        Pz = np.exp(-((z - zRange) ** 2) / (2 * zErr ** 2))
        Pz = Pz / np.trapezoid(Pz, zRange)
    else:
        zRange = [z]
        Pz = np.ones(1)

    log_y0 = np.log(y0)
    log_y0Err = y0Err / y0
    log10Ms = mockSurvey.log10M

    PArr = []
    Qs = None
    for k, zk in enumerate(zRange):
        if mockSurvey.delta != 500 or mockSurvey.rhoType != "critical":
            log10M500c_zk = np.log10(mockSurvey._toM500c(10 ** log10Ms, zk))
        else:
            log10M500c_zk = log10Ms
        zIndex = int(np.argmin(np.abs(mockSurvey.z - zk)))
        theta500s = interpolate.splev(log10M500c_zk,
                                      mockSurvey.theta500Splines[zIndex],
                                      ext=3)
        Qs = QFit.getQ(theta500s, zk, tileName=tileName)
        fRels = interpolate.splev(log10M500c_zk,
                                  mockSurvey.fRelSplines[zIndex], ext=3)
        fRels = np.where(fRels <= 0, 1e-4, fRels)
        y0pred = tenToA0 * mockSurvey.Ez[zIndex] ** Ez_gamma \
            * (10 ** log10Ms / Mpivot) ** (1 + B0) * Qs
        y0pred = y0pred * (1 + zk) ** onePlusRedshift_power
        if applyRelativisticCorrection:
            y0pred = y0pred * fRels
        if np.any(y0pred < 0):
            raise ValueError("Some predicted y0 values are negative")
        with np.errstate(divide="ignore"):
            log_y0pred = np.log(y0pred)
        Py0GivenM = np.exp(-((log_y0 - log_y0pred) ** 2)
                           / (2 * (log_y0Err ** 2 + sigma_int ** 2)))
        norm = np.trapezoid(Py0GivenM, log10Ms)
        if norm > 0:
            Py0GivenM = Py0GivenM / norm
        if applyMFDebiasCorrection:
            PLog10M = mockSurvey.getPLog10M(zk)
            PLog10M = PLog10M / np.trapezoid(PLog10M, log10Ms)
        else:
            PLog10M = 1.0
        PArr.append(Py0GivenM * PLog10M * Pz[k])

    PArr = np.array(PArr)
    P = PArr.sum(axis=0)
    P = P / np.trapezoid(P, log10Ms)

    PQ = P / np.trapezoid(P, Qs)
    fittedQ = Qs[np.argmax(PQ)]

    if return2D:
        P2D = np.zeros(mockSurvey.clusterCount.shape)
        if zErr == 0:
            P2D[np.argmin(np.abs(mockSurvey.z - z))] = PArr[0]
        else:
            P2D[(mockSurvey.z >= z - zErr * 5)
                & (mockSurvey.z < z + zErr * 5)] = PArr
        P = P2D / P2D.sum()
    if returnQ:
        return P, fittedQ
    return P


def calcMass(y0, y0Err, z, zErr, QFit, mockSurvey, tenToA0=4.95e-5, B0=0.08,
             Mpivot=3e14, sigma_int=0.2, Ez_gamma=2,
             onePlusRedshift_power=0.0, applyMFDebiasCorrection=True,
             applyRelativisticCorrection=True, calcErrors=True,
             fRelWeightsDict={148.0: 1.0}, tileName=None):
    """M500 with errors for one cluster (``signals.py:1293-1336``).

    Returns dict keyed by the mockSurvey's mass definition label."""
    if y0 < 0:
        raise ValueError("y0 cannot be negative")
    if y0 > 1e-2:
        raise ValueError("y0 suspiciously large - multiply by 1e-4?")
    P, bestQ = calcPMass(
        y0, y0Err, z, zErr, QFit, mockSurvey, tenToA0=tenToA0, B0=B0,
        Mpivot=Mpivot, sigma_int=sigma_int, Ez_gamma=Ez_gamma,
        onePlusRedshift_power=onePlusRedshift_power,
        applyMFDebiasCorrection=applyMFDebiasCorrection,
        applyRelativisticCorrection=applyRelativisticCorrection,
        fRelWeightsDict=fRelWeightsDict, tileName=tileName, returnQ=True)
    M500, errMinus, errPlus = getM500FromP(P, mockSurvey.log10M,
                                           calcErrors=calcErrors)
    label = mockSurvey.mdefLabel
    return {label: M500, "%s_errPlus" % label: errPlus,
            "%s_errMinus" % label: errMinus, "Q": bestQ}


def y0FromLogM500(log10M500, z, QFit, cosmoModel, tenToA0=4.95e-5, B0=0.08,
                  Mpivot=3e14, sigma_int=0.2,
                  applyRelativisticCorrection=True,
                  fRelWeightsDict={148.0: 1.0}, tileName=None):
    """Predicted y0~ for a given mass and redshift (``signals.py:1248-1290``)."""
    from . import cosmology as cosmo_mod
    M500 = 10 ** np.asarray(log10M500)
    theta500Arcmin = cosmo_mod.calcTheta500Arcmin(z, M500, cosmoModel)
    Q = QFit.getQ(theta500Arcmin, z, tileName=tileName)
    Ez = cosmoModel.Ez(z)
    if applyRelativisticCorrection:
        fRel = sz.calcWeightedFRel(z, M500, Ez, fRelWeightsDict)
    else:
        fRel = 1.0
    y0pred = tenToA0 * Ez ** 2 * (M500 / Mpivot) ** (1 + B0) * Q * fRel
    return y0pred, theta500Arcmin, Q
