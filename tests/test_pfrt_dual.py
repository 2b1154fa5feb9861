"""Tests for PFRT probabilistic deconvolution and dual inversion."""
import numpy as np
import pytest

from hybdrt_tpu.models.drt import DRT
from hybdrt_tpu.models import pfrt as pfrt_mod


def _spectrum(seed=42, noise=0.005):
    rng = np.random.default_rng(seed)
    freq = np.logspace(5, -1, 61)

    def zarc(f, r, tau0, a):
        return r / (1 + (2j * np.pi * f * tau0) ** a)

    z = 0.5 + zarc(freq, 1.0, 1e-3, 0.85) + zarc(freq, 2.0, 1e0, 0.9)
    z = z + (rng.normal(size=61) + 1j * rng.normal(size=61)) * noise
    return freq, z


@pytest.fixture(scope="module")
def pfrt_fit():
    freq, z = _spectrum()
    drt = DRT(warn=False)
    drt.pfrt_fit_eis(freq, z, factors=np.logspace(-1, 1, 7))
    return drt


def test_pfrt_llh_profile(pfrt_fit):
    llh = np.asarray(pfrt_fit.pfrt_result["step_llh"])
    assert len(llh) == 7
    assert np.all(np.isfinite(llh))
    # LLH should peak at an intermediate regularization factor
    assert 0 < np.argmax(llh) < 7


def test_predict_pfrt_finds_true_peaks(pfrt_fit):
    pf = pfrt_fit.predict_pfrt()
    tau_p = pfrt_fit.pfrt_result["tau_pfrt"]
    assert pf.shape == tau_p.shape
    assert np.isclose(np.max(pf), 1.0)
    # High-probability regions must include both true peaks
    for true_tau in (1e-3, 1e0):
        idx = np.argmin(np.abs(np.log(tau_p / true_tau)))
        assert np.max(pf[max(0, idx - 3):idx + 4]) > 0.5, true_tau


def test_pfrt_helpers():
    pf = np.array([0, 0.2, 0.9, 0.3, 0, 0, 0.5, 1.0, 0.4, 0])
    starts, ends = pfrt_mod.get_peak_ranges(pf, 0.1)
    assert len(starts) == 2
    peaks = pfrt_mod.identify_peaks(pf, 0.1)
    assert list(peaks) == [2, 7]
    idx, areas = pfrt_mod.integrate_peaks(pf, 0.1)
    assert np.all(areas > 0)
    ranked_idx, mags = pfrt_mod.rank_peaks(pf, 0.1)
    assert ranked_idx[0] == 7  # larger integrated peak first


def test_select_candidates(pfrt_fit):
    pfrt_fit.predict_pfrt()
    targets, cands = pfrt_fit.select_pfrt_candidates()
    assert len(targets) == len(cands)
    assert len(targets) >= 1


@pytest.fixture(scope="module")
def dual_fit():
    freq, z = _spectrum()
    drt = DRT(warn=False)
    drt.dual_fit_eis(freq, z, discrete_kw={"model_init_kw": {"element_types": "RQ"}})
    return drt


def test_dual_fit_selects_true_model(dual_fit):
    best = dual_fit.get_best_candidate_id("discrete", "bic")
    assert best == 2
    model = dual_fit.discrete_candidate_dict[2]["model"]
    p = model.get_parameter_dict()
    assert abs(p["R_RQ1"] - 1.0) < 0.1
    assert abs(p["R_RQ2"] - 2.0) < 0.1


def test_dual_fit_bayes_factors(dual_fit):
    bf = dual_fit.evaluate_norm_bayes_factors("discrete", "bic")
    best_idx = np.argmax(bf)
    df = dual_fit.discrete_candidate_df
    assert df["model_id"].values[best_idx] == 2
    assert np.isclose(np.max(bf), 1.0)


def test_predict_pdrt(dual_fit):
    pdrt = dual_fit.predict_pdrt()
    tau = dual_fit.get_tau_eval(20)
    assert np.isclose(np.max(pdrt), 1.0)
    for true_tau in (1e-3, 1e0):
        idx = np.argmin(np.abs(np.log(tau / true_tau)))
        assert pdrt[idx] > 0.5, true_tau


def test_candidate_accessors_and_bayes_factor(dual_fit):
    """predict_candidate_drt, plot-free accessors, pairwise Bayes factors,
    reordered model search (reference drt1d.py:2221,2355-2410)."""
    drt = dual_fit
    tau = np.logspace(-5, 1, 40)
    g_cont = drt.predict_candidate_drt(2, "continuous", tau=tau)
    g_disc = drt.predict_candidate_distribution(2, "discrete", tau=tau)
    assert g_cont.shape == (40,) and g_disc.shape == (40,)
    assert np.all(np.isfinite(g_cont)) and np.all(np.isfinite(g_disc))
    # Pairwise Bayes factor consistent with normalized factors
    bf_12 = drt.evaluate_bayes_factor(1, 2, "discrete")
    bf_21 = drt.evaluate_bayes_factor(2, 1, "discrete")
    # The 2-peak model should beat the 1-peak model on this 2-ZARC data
    # (overwhelmingly - the factor may overflow to inf)
    assert bf_12 > 1 and bf_21 < 1
    # estimate_peak_drts alias
    assert np.allclose(drt.estimate_peak_drts(tau=tau),
                       drt.estimate_peak_distributions(tau=tau))
