"""Guiding-center machinery vs hand-transcribed reference formulas.

The reference propagates every derivative by hand
(``python/05_tokamak/SympGPR/common.py:57-117`` chain rule over the analytic
field-derivative arrays of ``field_test.py:15-47``); here those formulas are
transcribed once in numpy as the *golden spec* and the autodiff
implementation must match them.
"""

import numpy as np
import pytest

from sympgpr_tpu.systems import guiding_center as gc

QE, M, C, MU = 1.0, 1.0, 1.0, 1e-5
B0, IOTA0, A, R0 = gc.B0, gc.IOTA0, gc.A_MINOR, gc.R0


def _field_ref(r, th):
    """field_test.py:15-47 values + hand-written derivative arrays.

    6-vectors: (rr, thth, phph, rth, rph, thph); nothing depends on ph.
    """
    cth, sth = np.cos(th), np.sin(th)
    f = {}
    f["Ath"] = B0 * (r**2 / 2 - r**3 / (3 * R0) * cth)
    f["dAth"] = np.array([B0 * (r - r**2 / R0 * cth),
                          B0 * r**3 * sth / (3 * R0), 0.0])
    f["d2Ath"] = np.array([B0 * (1 - 2 * r / R0 * cth),
                           B0 * r**3 * cth / (3 * R0), 0.0,
                           B0 * r**2 / R0 * sth, 0.0, 0.0])
    f["Aph"] = -B0 * IOTA0 * (r**2 / 2 - r**4 / (4 * A**2))
    f["dAph"] = np.array([-B0 * IOTA0 * (r - r**3 / A**2), 0.0, 0.0])
    f["d2Aph"] = np.array([-B0 * IOTA0 * (1 - 3 * r**2 / A**2),
                           0.0, 0.0, 0.0, 0.0, 0.0])
    f["hth"] = IOTA0 * (1 - r**2 / A**2) * r**2 / R0
    f["dhth"] = np.array([(2 * IOTA0 * r * (A**2 - 2 * r**2)) / (A**2 * R0),
                          0.0, 0.0])
    f["d2hth"] = np.array([(2 * IOTA0 * (A**2 - 6 * r**2)) / (A**2 * R0),
                           0.0, 0.0, 0.0, 0.0, 0.0])
    f["hph"] = R0 + r * cth
    f["dhph"] = np.array([cth, -r * sth, 0.0])
    # field_test.py:40 writes only 5 entries (a latent shape bug); the true
    # 6-vector is (0, -r cth, 0, -sth, 0, 0).
    f["d2hph"] = np.array([0.0, -r * cth, 0.0, -sth, 0.0, 0.0])
    f["B"] = B0 * (1 - r / R0 * cth)
    f["dB"] = np.array([-B0 / R0 * cth, B0 * r / R0 * sth, 0.0])
    f["d2B"] = np.array([0.0, B0 * r / R0 * cth, 0.0, B0 / R0 * sth, 0.0, 0.0])
    return f


def _ref_der2(z):
    """common.py:47-117 transcription (get_val + get_der + get_der2)."""
    r, th, ph, pph = z
    f = _field_ref(r, th)
    vpar = 1.0 / f["hph"] * (pph - QE / C * f["Aph"])
    H = M * vpar**2 / 2 + MU * f["B"]
    pth = M * f["hth"] * vpar + QE / C * f["Ath"]

    dvpardx = -(QE / (M * C) * f["dAph"] + vpar * f["dhph"]) / f["hph"]
    dvpardpph = 1.0 / (M * f["hph"])
    dHdx = M * vpar * dvpardx + MU * f["dB"]
    dHdpph = M * vpar / f["hph"]
    dpthdx = M * dvpardx * f["hth"] + M * vpar * f["dhth"] + QE / C * f["dAth"]
    dpthdpph = f["hth"] / f["hph"]

    d2vpardx2 = np.zeros(6)
    d2vpardpphdz = np.zeros(4)
    d2vpardx2[:3] = -(QE / (M * C) * f["d2Aph"][:3] + f["d2hph"][:3] * vpar
                      + 2 * f["dhph"] * dvpardx) / f["hph"]
    d2vpardx2[3] = -(QE / (M * C) * f["d2Aph"][3] + f["d2hph"][3] * vpar
                     + f["dhph"][0] * dvpardx[1]
                     + f["dhph"][1] * dvpardx[0]) / f["hph"]
    d2vpardpphdz[:3] = -1.0 / (M * f["hph"] ** 2) * f["dhph"]

    d2pthdx2 = np.zeros(6)
    d2pthdpphdz = np.zeros(4)
    d2pthdx2[:3] = M * (d2vpardx2[:3] * f["hth"] + 2 * dvpardx * f["dhth"]
                        + vpar * f["d2hth"][:3] + QE / (M * C) * f["d2Ath"][:3])
    d2pthdx2[3] = M * (d2vpardx2[3] * f["hth"] + dvpardx[0] * f["dhth"][1]
                       + dvpardx[1] * f["dhth"][0] + vpar * f["d2hth"][3]
                       + QE / (M * C) * f["d2Ath"][3])
    d2pthdpphdz[:3] = f["dhth"] / f["hph"] - f["hth"] / f["hph"] ** 2 * f["dhph"]

    d2Hdx2 = np.zeros(6)
    d2Hdpphdz = np.zeros(4)
    d2Hdx2[:3] = M * (dvpardx**2 + vpar * d2vpardx2[:3]) + MU * f["d2B"][:3]
    d2Hdx2[3] = M * (dvpardx[0] * dvpardx[1] + vpar * d2vpardx2[3]) \
        + MU * f["d2B"][3]
    d2Hdpphdz[:3] = M * (1.0 / f["hph"] * dvpardx
                         - vpar / f["hph"] ** 2 * f["dhph"])
    # common.py never assigns d2Hdpphdz[3]; the true value (tested separately)
    # is 1/(M hph^2).

    return dict(H=H, pth=pth, vpar=vpar, dHdx=dHdx, dHdpph=dHdpph,
                dpthdx=dpthdx, dpthdpph=dpthdpph, dvpardx=dvpardx,
                dvpardpph=dvpardpph, d2pthdx2=d2pthdx2,
                d2pthdpphdz=d2pthdpphdz, d2Hdx2=d2Hdx2, d2Hdpphdz=d2Hdpphdz,
                d2vpardx2=d2vpardx2, d2vpardpphdz=d2vpardpphdz,
                hph=f["hph"])


def _points(n=8):
    rng = np.random.default_rng(3)
    r = rng.uniform(0.05, 0.45, n)
    th = rng.uniform(0, 2 * np.pi, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    vpar0 = rng.uniform(-0.01, 0.01, n)
    pph = np.asarray(gc.pph_from_ics(r, th, ph, vpar0))
    return np.stack([r, th, ph, pph], 1)


def test_get_val_matches_reference():
    for z in _points():
        ref = _ref_der2(z)
        H, pth, vpar = gc.get_val(z)
        np.testing.assert_allclose(float(H), ref["H"], rtol=1e-12)
        np.testing.assert_allclose(float(pth), ref["pth"], rtol=1e-12)
        np.testing.assert_allclose(float(vpar), ref["vpar"], rtol=1e-12)


def test_get_der_matches_reference():
    for z in _points():
        ref = _ref_der2(z)
        out = gc.get_der(z)
        names = ["H", "pth", "vpar", "dHdx", "dHdpph", "dpthdx", "dpthdpph",
                 "dvpardx", "dvpardpph"]
        for name, got in zip(names, out):
            np.testing.assert_allclose(
                np.asarray(got), ref[name], rtol=1e-10, atol=1e-18,
                err_msg=name)


def test_get_der2_matches_reference():
    for z in _points(4):
        ref = _ref_der2(z)
        out = gc.get_der2(z)
        names = ["d2pthdx2", "d2pthdpphdz", "d2Hdx2", "d2Hdpphdz",
                 "d2vpardx2", "d2vpardpphdz"]
        for name, got in zip(names, out[9:]):
            got = np.asarray(got)
            if name == "d2Hdpphdz":
                # reference leaves [3] unassigned (common.py bug); compare
                # the filled entries and check the true value separately
                np.testing.assert_allclose(got[:3], ref[name][:3],
                                           rtol=1e-9, atol=1e-18)
                np.testing.assert_allclose(
                    got[3], 1.0 / (M * ref["hph"] ** 2), rtol=1e-12)
            else:
                np.testing.assert_allclose(got, ref[name], rtol=1e-9,
                                           atol=1e-18, err_msg=name)


def test_batched_matches_scalar():
    zs = _points(6)
    Hb, pthb, vparb = gc.get_val_batch(zs, gc.GCParams())
    for i, z in enumerate(zs):
        H, pth, vpar = gc.get_val(z)
        np.testing.assert_allclose(float(Hb[i]), float(H), rtol=1e-14)
        np.testing.assert_allclose(float(pthb[i]), float(pth), rtol=1e-14)
        np.testing.assert_allclose(float(vparb[i]), float(vpar), rtol=1e-14)


def test_pph_roundtrip():
    # vpar recovered by get_val equals the vpar0 used to build pph0
    r, th, ph, vpar0 = 0.1, 1.5, 0.0, 0.37
    pph0 = gc.pph_from_ics(r, th, ph, vpar0)
    _, _, vpar = gc.get_val(np.array([r, th, ph, float(pph0)]))
    np.testing.assert_allclose(float(vpar), vpar0, rtol=1e-13)


def test_timesteps():
    dt, nt = gc.timesteps(100, 3)
    assert dt == pytest.approx(78.0) and nt == 300


def test_newton_scalar_batched():
    # batched cubic x^3 = a with per-lane targets
    a = np.array([8.0, 27.0, 0.001, 5.0])

    def fdf(x, a):
        return x**3 - a, 3 * x**2

    x = gc.newton_scalar(fdf, np.full(4, 2.5), rtol=1e-14, atol=1e-14,
                         args=(a,))
    np.testing.assert_allclose(np.asarray(x), np.cbrt(a), rtol=1e-12)
