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


def test_peakthresh_pr_curve():
    """PR curve over peak-prominence threshold: a two-peak estimate of a
    two-peak model should reach (recall=1, precision=1) at some threshold, and
    the endpoints must be the all-detections / zero-detections limits
    (reference evaluation.py:724)."""
    exact = lambda t: _zarc_gamma(t, 1e-3, 0.9) + _zarc_gamma(t, 1e0, 0.9)
    # Estimate: slightly shifted peaks plus a tiny spurious bump
    est = lambda t: (_zarc_gamma(t, 1.2e-3, 0.88) + _zarc_gamma(t, 0.9e0, 0.9)
                     + 0.02 * _zarc_gamma(t, 3e-2, 0.97))
    tau_cls = np.logspace(-6, 2, 400)

    ppv, tpr, thresh = evaluation.peakthresh_pr_curve(
        exact, est, tau_cls, return_thresholds=True)
    assert len(ppv) == len(tpr) == len(thresh)
    # Zero-detection limit appended at the end
    assert tpr[-1] == 0.0 and ppv[-1] == 1.0 and np.isinf(thresh[-1])
    # Some threshold keeps exactly the two real peaks: near-perfect point
    best_f1 = np.max(2 * ppv * tpr / np.maximum(ppv + tpr, 1e-12))
    assert best_f1 > 0.9
    # Curve area is meaningful
    auc = evaluation.pr_auc(ppv, tpr)
    assert 0.5 < auc <= 1.0 + 1e-12


def test_find_model_peaks_prominences():
    exact = lambda t: _zarc_gamma(t, 1e-3, 0.9) + 0.3 * _zarc_gamma(t, 1e0, 0.9)
    tau_cls = np.logspace(-6, 2, 400)
    peak_tau, prom = evaluation.find_model_peaks(
        exact, tau_cls, find_peaks_kw={"height": 0, "prominence": 0},
        return_prominence=True)
    assert len(peak_tau) == len(prom) >= 2
    # The dominant peak has the larger curvature prominence
    i_main = np.argmin(np.abs(np.log(peak_tau) - np.log(1e-3)))
    assert prom[i_main] == np.max(prom)


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


def test_evaluation_helper_functions():
    """Module-level scoring helpers (reference evaluation.py):
    r2_dev_arrays / rss_array / sqe_distance_array / get_model_r_p /
    p2p_distance / merge_singular_peaks / process_model_instance."""
    from hybdrt_tpu import evaluation as ev

    tau = np.logspace(-4, 0, 81)
    x = np.log(tau)
    p = np.exp(-0.5 * ((x + 4.6) / 0.5) ** 2)
    q = np.exp(-0.5 * ((x + 4.4) / 0.5) ** 2)

    resid, dev = ev.r2_dev_arrays(p, q)
    assert 1 - np.sum(resid ** 2) / np.sum(dev ** 2) == pytest.approx(
        ev.r2_score(p, q))

    # rss_array: zero for identical distributions, variance-model weights
    assert np.all(ev.rss_array(p, p) == 0)
    wrss = ev.rss_array(p, q, normalize=True)
    assert np.all(np.isfinite(wrss)) and np.sum(wrss) > 0
    assert np.all(ev.sqe_distance_array(x, p, p, normalize=True) < 1e-20)

    class FakeModel:
        def predict_distribution(self, t):
            return np.exp(-0.5 * ((np.log(t) + 4.6) / 0.5) ** 2)

    rp = ev.get_model_r_p(FakeModel(), tau)
    assert rp == pytest.approx(np.sqrt(2 * np.pi) * 0.5, rel=0.01)

    y_reg, peak_tau = ev.process_model_instance(FakeModel(), tau, tau)
    assert y_reg.shape == tau.shape
    assert len(peak_tau) == 1
    assert abs(np.log10(peak_tau[0]) + 2) < 0.1  # exp(-4.6) ~ 1e-2

    d = ev.p2p_distance(np.array([1e-2, 1e-1]), np.array([2e-2]),
                        np.array([0, -1]))
    assert d[0] == pytest.approx(np.log(2))
    assert np.isinf(d[1])
    assert len(ev.p2p_distance(np.array([]), np.array([1.0]), np.array([]))) == 0

    merged, sing_idx = ev.merge_singular_peaks(
        tau, np.array([1e-2]), [(0.5, 1e-3)])
    assert len(merged) == 2 and merged[0] == pytest.approx(1e-3)
    assert sing_idx.tolist() == [0]


def test_review_regressions_merge_and_prominence():
    """Round-2 review regressions: merge_singular_peaks returns the sorted
    POSITIONS of appended singular peaks, and find_model_peaks keeps
    peak_tau and prominences aligned when find_peaks_kw omits
    'prominence'."""
    from hybdrt_tpu import evaluation as ev

    tau = np.logspace(-4, 0, 81)
    # Singular peak smaller than all smooth peaks -> sorted position 0
    merged, sing_idx = ev.merge_singular_peaks(
        tau, np.array([1e-2, 1e-1, 1.0]), [(1.0, 1e-4)])
    assert merged.tolist() == [1e-4, 1e-2, 1e-1, 1.0]
    assert sing_idx.tolist() == [0]
    # Singularity coinciding with an existing peak: nothing appended
    merged2, sing_idx2 = ev.merge_singular_peaks(
        tau, np.array([1e-2, 1e-1]), [(1.0, 1e-2)])
    assert len(merged2) == 2 and len(sing_idx2) == 0

    class TwoPeaks:
        def predict_distribution(self, t):
            x = np.log(t)
            return (np.exp(-0.5 * ((x + 4.6) / 0.3) ** 2)
                    + 0.4 * np.exp(-0.5 * ((x + 2.3) / 0.3) ** 2))

    peak_tau, prom = ev.find_model_peaks(
        TwoPeaks(), tau, normalize=False,
        find_peaks_kw={"height": 0}, return_prominence=True)
    assert len(peak_tau) == len(prom)
    assert np.all(prom >= 0)


def test_js_divergence_normalizes_before_mixture():
    """Review regression: JS divergence of differently-scaled but
    identically-shaped distributions is ~0 and always within [0, ln 2]."""
    from hybdrt_tpu import evaluation as ev
    x = np.linspace(-3, 3, 200)
    p = np.exp(-0.5 * x ** 2)
    q = 10.0 * p  # same shape, 10x the mass
    js = ev.js_divergence(x, p, q, normalize=True)
    assert abs(js) < 1e-3
    r = np.exp(-0.5 * (x - 2.0) ** 2) * 5.0
    js2 = ev.js_divergence(x, p, r, normalize=True)
    assert 0 <= js2 <= np.log(2) + 1e-6


def test_evaluate_data_and_metric_summary():
    """evaluate_data scores from raw arrays (reference evaluation.py:153-190)
    and matches evaluate_models on the same inputs."""
    tau_reg = np.logspace(-5, 1, 200)
    tau_cls = np.logspace(-5, 1, 300)
    exact = lambda t: _zarc_gamma(t, 1e-2, 0.85)
    est = lambda t: _zarc_gamma(t, 1.3e-2, 0.83)

    scorer = evaluation.DrtScorer()
    res_models = scorer.evaluate_models(exact, est, tau_reg, tau_cls)
    summary = scorer.metric_summary
    assert set(summary) >= {"r2", "f1", "precision", "recall", "f1-js"}

    # Same inputs through evaluate_data give identical results
    scorer2 = evaluation.DrtScorer()
    reg_data = (tau_reg, exact(tau_reg), est(tau_reg))
    cls_data = (tau_cls, evaluation.find_model_peaks(exact, tau_cls),
                evaluation.find_model_peaks(est, tau_cls))
    res_data = scorer2.evaluate_data(reg_data, cls_data)
    for grp in ("regression", "classification", "combined"):
        for k, v in res_models[grp].items():
            assert res_data[grp][k] == pytest.approx(v, rel=1e-12), (grp, k)

    # Perfect estimate: all combined metrics ~1
    scorer3 = evaluation.DrtScorer()
    scorer3.evaluate_models(exact, exact, tau_reg, tau_cls)
    s3 = scorer3.metric_summary
    assert s3["f1"] == pytest.approx(1.0, abs=1e-6)
    assert s3["r2"] == pytest.approx(1.0)


def test_compute_rc_curve():
    """Metric curves over an experiment axis (reference
    evaluation.py:253-302): fit quality should degrade monotonically as the
    fit function's tau-offset argument grows."""
    tau_reg = np.logspace(-5, 1, 150)
    tau_cls = np.logspace(-5, 1, 200)
    exact = lambda t: _zarc_gamma(t, 1e-2, 0.85)

    # "fit function": returns a model whose tau_0 is offset from the truth
    # by the experiment argument; data_list entries perturb it slightly
    def fit_function(data, log_offset):
        return lambda t: _zarc_gamma(t, 1e-2 * 10 ** (log_offset + data),
                                     0.85)

    data_list = [0.0, 0.02]
    arg_array = np.array([[0.0], [0.3], [0.8]])
    scorer = evaluation.DrtScorer()
    curves = scorer.compute_rc_curve(exact, data_list, fit_function,
                                     arg_array, tau_reg, tau_cls)
    assert set(curves) >= {"r2", "f1", "f1-js"}
    assert all(len(v) == 3 for v in curves.values())
    # Quality decreases with offset
    assert curves["js_index"][0] > curves["js_index"][1] > curves["js_index"][2]
    assert scorer.rc_curve_metrics is not None
    assert np.array_equal(scorer.rc_curve_args, arg_array)


def test_plot_drt_comparison():
    import matplotlib
    matplotlib.use("Agg")
    tau_reg = np.logspace(-5, 1, 150)
    tau_cls = np.logspace(-5, 1, 200)
    exact = lambda t: _zarc_gamma(t, 1e-2, 0.85)
    est = lambda t: _zarc_gamma(t, 2e-2, 0.8)
    scorer = evaluation.DrtScorer()
    with pytest.raises(ValueError):
        scorer.plot_drt_comparison()
    scorer.evaluate_models(exact, est, tau_reg, tau_cls)
    ax = scorer.plot_drt_comparison()
    assert len(ax.lines) >= 2
    labels = [ln.get_label() for ln in ax.lines]
    assert "Exact" in labels and "Estimate" in labels
