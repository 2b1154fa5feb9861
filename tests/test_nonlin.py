"""Tests for the nonlinear (bias-dependent) DRT."""
import numpy as np
import pytest

from hybdrt_tpu.models.nonlin import NonlinearDRT, get_func_from_string


def _simulate_bias_dependent():
    rng = np.random.default_rng(1)
    t_pre = np.linspace(-0.01, -0.0005, 10)
    t1 = np.logspace(-5, -0.4, 80)
    t2 = 0.5 + np.logspace(-5, -0.4, 80)
    times = np.concatenate([t_pre, t1, t2])
    i_sig = np.where(times >= 0.5, -0.1, np.where(times >= 0, 0.1, 0.0))

    def resp(t0, amp, r_pol):
        dt = np.maximum(times - t0, 0)
        return amp * np.where(times >= t0, 0.2 + r_pol * (1 - np.exp(-dt / 1e-2)), 0.0)

    v = 0.05 + resp(0.0, 0.1, 1.0) + resp(0.5, -0.1, 1.6)
    v = v + rng.normal(size=len(times)) * 2e-4
    return times, i_sig, v


def test_weighting_functions():
    f = get_func_from_string("v_lin")
    w = f(None, None, np.linspace(-1, 1, 100))
    assert w.min() >= 0 and w.max() <= 1
    assert w[-1] > w[0]
    with pytest.raises(ValueError):
        get_func_from_string("x_quad")


def test_nonlinear_fit_detects_bias_dependence():
    times, i_sig, v = _simulate_bias_dependent()
    drt = NonlinearDRT(warn=False)
    drt.fit_chrono(times, i_sig, v, nonlin_function="v_lin", nl_lambda_0=10)
    # Both halves present in fit parameters
    assert "R_inf_neg" in drt.fit_parameters
    assert "R_inf_pos" in drt.fit_parameters
    rp_pos = drt.predict_r_p(kind="pos")
    rp_neg = drt.predict_r_p(kind="neg")
    assert rp_pos != rp_neg
    # Net response reproduces the data
    v_hat = drt.predict_response()
    assert np.median(np.abs(v_hat - v)) < 5e-3
    # to_linear roundtrip
    lin = drt.to_linear("mean")
    assert abs(lin.predict_r_p() - 0.5 * (rp_pos + rp_neg)) < 1e-10


def test_nonlinear_rejects_eis_only():
    drt = NonlinearDRT(warn=False)
    with pytest.raises(ValueError):
        drt.fit_eis(np.logspace(3, 0, 10), np.ones(10, dtype=complex))
