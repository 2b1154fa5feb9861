"""Evaluation metrics/DrtScorer and Fourier impedance extraction
(reference hybdrt/evaluation.py, fourier.py)."""
import numpy as np
import pytest

from hybdrt_tpu import evaluation, fourier


def _zarc_gamma(tau, tau_0, beta, r=1.0):
    lt = np.log(tau / tau_0)
    return r * np.sin((1 - beta) * np.pi) / (
        2 * np.pi * (np.cosh(beta * lt) - np.cos((1 - beta) * np.pi)))


def test_regression_metrics_perfect_and_degraded():
    tau = np.logspace(-5, 1, 200)
    y = _zarc_gamma(tau, 1e-2, 0.85)
    reg = evaluation.calculate_regression_metrics(tau, y, y)
    assert reg["r2"] == pytest.approx(1.0)
    assert reg["rss"] == pytest.approx(0.0, abs=1e-20)
    # Degraded estimate scores worse
    reg2 = evaluation.calculate_regression_metrics(tau, y, 0.7 * y)
    assert reg2["r2"] < reg["r2"]


def test_divergences_on_known_distributions():
    tau = np.logspace(-5, 1, 400)
    p = _zarc_gamma(tau, 1e-2, 0.9)
    q = _zarc_gamma(tau, 3e-2, 0.9)
    kl_pp = evaluation.kl_divergence(tau, p, p, normalize=True)
    kl_pq = evaluation.kl_divergence(tau, p, q, normalize=True)
    assert abs(kl_pp) < 1e-10
    assert kl_pq > 0
    js = evaluation.js_divergence(tau, p, q, normalize=True)
    assert 0 < js <= np.log(2) + 1e-12
    # JS is symmetric
    assert js == pytest.approx(evaluation.js_divergence(tau, q, p, normalize=True),
                               rel=1e-6)


def test_peak_matching_and_cls_metrics():
    est = np.array([1e-3, 1.1e-1])
    true = np.array([1e-3, 1e-1, 1e1])
    cls = evaluation.calculate_cls_metrics(est, true, {"epsilon": 1.0, "order": 2})
    # 2 of 3 true peaks found, no false positives
    assert cls["recall"] < 1.0
    assert cls["precision"] > 0.9
    assert 0 < cls["f1"] < 1.0
    perfect = evaluation.calculate_cls_metrics(true, true,
                                               {"epsilon": 1.0, "order": 2})
    assert perfect["f1"] == pytest.approx(1.0, abs=1e-6)


def test_drt_scorer_end_to_end():
    from hybdrt_tpu.models.elements import DiscreteElementModel
    tau_reg = np.logspace(-5, 1, 200)
    tau_cls = np.logspace(-5, 1, 300)
    exact = lambda t: _zarc_gamma(t, 1e-2, 0.85)
    est = DiscreteElementModel("RQ1")
    est.set_parameter_values([1.0, np.log(1.2e-2), 0.83])
    scorer = evaluation.DrtScorer()
    res = scorer.evaluate_models(exact, est, tau_reg, tau_cls,
                                 exact_peak_tau=np.array([1e-2]))
    assert set(res) == {"regression", "classification", "combined"}
    assert res["regression"]["r2"] > 0.9
    assert res["classification"]["f1"] > 0.5


def test_fft_impedance_recovers_rc():
    """FFT impedance of an R-RC chrono response matches the analytic Z."""
    r_inf, r1, tau1 = 0.5, 1.0, 1e-2
    t_sample = 1e-4
    times = np.arange(0, 2.0, t_sample)
    rng = np.random.default_rng(0)
    # PRBS-like random current excitation (rich spectrum)
    i_sig = np.repeat(rng.choice([-1.0, 1.0], size=len(times) // 20 + 1), 20)[:len(times)]
    # Simulate v = r_inf*i + RC response via exact discrete convolution
    v = r_inf * i_sig.copy()
    state = 0.0
    a = np.exp(-t_sample / tau1)
    for k in range(len(times)):
        state = a * state + r1 * (1 - a) * i_sig[k]
        v[k] += state
    freq, z_est = fourier.fft_impedance(times, i_sig, v)
    # Compare in a clean band away from DC and Nyquist
    band = (freq > 1.0) & (freq < 300.0)
    z_true = r_inf + r1 / (1 + 2j * np.pi * freq[band] * tau1)
    rel = np.abs(z_est[band] - z_true) / np.abs(z_true)
    assert np.median(rel) < 0.05

    with pytest.raises(ValueError):
        fourier.fft_impedance(np.logspace(-3, 0, 50), np.ones(50), np.ones(50))
