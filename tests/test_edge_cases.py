"""Input-validation and robustness probes on the public fit API.

These are the edge cases the project's verify recipe drives by hand:
mismatched inputs, invalid flag combinations, tiny spectra, extreme data
scales, object reuse, and irregular grids.
"""
import numpy as np
import pytest

from hybdrt_tpu import DRT


def _zarc(f, r, tau0, a=0.9):
    return r / (1 + (2j * np.pi * f * tau0) ** a)


def _spectrum(n=41, seed=0, r=1.2, tau0=1e-2, r_inf=0.4, noise=1e-3):
    rng = np.random.default_rng(seed)
    f = np.logspace(5, -1, n)
    z = r_inf + _zarc(f, r, tau0)
    return f, z + rng.normal(0, noise, n) + 1j * rng.normal(0, noise, n)


def test_mismatched_lengths_raise():
    f, z = _spectrum()
    drt = DRT(warn=False)
    with pytest.raises(Exception):
        drt.fit_eis(f[:-3], z)


def test_typo_kwarg_raises():
    f, z = _spectrum()
    drt = DRT(warn=False)
    with pytest.raises((TypeError, ValueError)):
        drt.fit_eis(f, z, nonneg_typo=True)


def test_series_neg_with_nonneg_false_raises():
    f, z = _spectrum()
    drt = DRT(warn=False)
    with pytest.raises(ValueError):
        drt.fit_eis(f, z, series_neg=True, nonneg=False)


def test_tiny_spectrum_fits():
    """A 7-point spectrum still produces a finite, sane fit."""
    f, z = _spectrum(n=7, noise=1e-4)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)
    assert np.all(np.isfinite(drt.fit_parameters["x"]))
    assert 0.5 < drt.predict_r_p() < 3.0


def test_data_scaling_exact():
    """Scaling the data by 1e-3 scales Rp and R_inf by exactly 1e-3 (the
    self-tuned scaling removes the data magnitude)."""
    f, z = _spectrum(seed=5)
    d1 = DRT(warn=False)
    d1.fit_eis(f, z)
    d2 = DRT(warn=False)
    d2.fit_eis(f, z * 1e-3)
    assert d2.predict_r_p() == pytest.approx(1e-3 * d1.predict_r_p(),
                                             rel=1e-6)
    assert d2.fit_parameters["R_inf"] == pytest.approx(
        1e-3 * d1.fit_parameters["R_inf"], rel=1e-6)


def test_refit_same_object():
    """Refitting a DRT instance on new data fully replaces the old fit."""
    f1, z1 = _spectrum(seed=1, tau0=1e-3, r=1.0)
    f2, z2 = _spectrum(n=35, seed=2, tau0=1e-1, r=2.0)
    drt = DRT(warn=False)
    drt.fit_eis(f1, z1)
    rp1 = drt.predict_r_p()
    drt.fit_eis(f2, z2)
    assert drt.predict_r_p() == pytest.approx(2.0, abs=0.1)
    assert drt.num_eis == 35
    z_hat = drt.predict_z(f2)
    assert np.linalg.norm(z_hat - z2) / np.linalg.norm(z2) < 0.01
    assert rp1 == pytest.approx(1.0, abs=0.1)


def test_descending_vs_ascending_grid():
    """Frequency order does not change the physics of the fit."""
    f, z = _spectrum(seed=3)
    d1 = DRT(warn=False)
    d1.fit_eis(f, z)
    d2 = DRT(warn=False)
    d2.fit_eis(f[::-1], z[::-1])
    assert d2.predict_r_p() == pytest.approx(d1.predict_r_p(), rel=1e-3)
    assert d2.fit_parameters["R_inf"] == pytest.approx(
        d1.fit_parameters["R_inf"], rel=1e-3)


def test_irregular_grid():
    """A non-log-uniform (jittered) frequency grid fits fine."""
    rng = np.random.default_rng(7)
    f = np.logspace(5, -1, 41) * 10 ** rng.uniform(-0.05, 0.05, 41)
    f = np.sort(f)[::-1]
    z = 0.4 + _zarc(f, 1.2, 1e-2)
    z = z + rng.normal(0, 1e-3, 41) + 1j * rng.normal(0, 1e-3, 41)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)
    assert drt.predict_r_p() == pytest.approx(1.2, abs=0.06)


def test_nonneg_false_allows_negative_lobes():
    f, z = _spectrum(seed=4)
    drt = DRT(warn=False)
    drt.fit_eis(f, z, nonneg=False)
    assert np.all(np.isfinite(drt.fit_parameters["x"]))
    # nonneg fit of the same data has strictly nonnegative coefficients
    d2 = DRT(warn=False)
    d2.fit_eis(f, z, nonneg=True)
    assert np.min(d2.fit_parameters["x"]) >= -1e-12


def test_fit_dop_with_inductive_spectrum():
    """fit_dop handles a spectrum with a strong inductive branch."""
    rng = np.random.default_rng(8)
    f = np.logspace(5, -1, 51)
    z = 0.4 + _zarc(f, 1.0, 1e-2) + 2j * np.pi * f * 1e-6
    z = z + rng.normal(0, 1e-3, 51) + 1j * rng.normal(0, 1e-3, 51)
    drt = DRT(warn=False, fit_dop=True)
    drt.fit_eis(f, z)
    assert np.all(np.isfinite(drt.fit_parameters["x"]))
    assert drt.predict_r_p() == pytest.approx(1.0, abs=0.1)
