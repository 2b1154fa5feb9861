"""End-to-end chrono and hybrid fit tests on synthetic data with exact
ground truth (RC elements have closed-form step responses and impedances)."""
import numpy as np
import pytest

from hybdrt_tpu.models.drt import DRT


RNG = np.random.default_rng(0)


def _simulate_chrono(r_inf=0.3, rcs=((1.0, 1e-3), (0.8, 1e-1)), v_base=0.05,
                     i_step=0.1, noise=2e-4):
    t_pre = np.linspace(-0.01, -0.0005, 20)
    t_post = np.logspace(-5, 0.5, 150)
    times = np.concatenate([t_pre, t_post])
    i_sig = np.where(times >= 0, i_step, 0.0)
    v = v_base + r_inf * i_sig
    for r, tau in rcs:
        v = v + i_step * np.where(times >= 0, r * (1 - np.exp(-np.maximum(times, 0) / tau)), 0.0)
    v = v + RNG.normal(size=len(times)) * noise
    return times, i_sig, v


def _simulate_eis(r_inf=0.3, rcs=((1.0, 1e-3), (0.8, 1e-1)), induc=1e-7, noise=2e-3):
    freq = np.logspace(5, -1, 41)
    z = r_inf + 2j * np.pi * freq * induc
    for r, tau in rcs:
        z = z + r / (1 + 2j * np.pi * freq * tau)
    z = z + (RNG.normal(size=len(freq)) + 1j * RNG.normal(size=len(freq))) * noise
    return freq, z


def test_fit_chrono_recovers_parameters():
    times, i_sig, v = _simulate_chrono()
    drt = DRT()
    drt.fit_chrono(times, i_sig, v)
    assert abs(drt.fit_parameters["R_inf"] - 0.3) < 0.02
    assert abs(drt.predict_r_p() - 1.8) < 0.05
    assert abs(drt.fit_parameters["v_baseline"][0] - 0.05) < 1e-3
    v_hat = drt.predict_response(times)
    assert np.median(np.abs(v_hat - v)) < 1e-3


def test_fit_chrono_step_detection():
    """Steps are auto-detected from the input signal."""
    times, i_sig, v = _simulate_chrono()
    drt = DRT()
    drt.fit_chrono(times, i_sig, v)
    assert len(drt.step_times) == 1
    # Step offset places the step one sample before the first changed sample
    assert -0.001 < drt.step_times[0] < 1e-4


def test_fit_hybrid_recovers_parameters():
    times, i_sig, v = _simulate_chrono()
    freq, z = _simulate_eis()
    drt = DRT()
    drt.fit_hybrid(times, i_sig, v, freq, z)
    assert abs(drt.fit_parameters["R_inf"] - 0.3) < 0.02
    assert abs(drt.predict_r_p() - 1.8) < 0.05
    assert abs(drt.fit_parameters["inductance"] - 1e-7) < 2e-8
    # vz_offset should be small for consistent chrono/EIS data
    assert abs(drt.fit_parameters["vz_offset"]) < 0.05
    assert drt.fit_type == "qphb_hybrid"
    # Sigma vectors exist for both domains
    assert drt.fit_parameters["v_sigma_tot"] is not None
    assert drt.fit_parameters["z_sigma_tot"] is not None


def test_fit_hybrid_weight_factor_methods():
    times, i_sig, v = _simulate_chrono()
    freq, z = _simulate_eis()
    for method in ("weight", "rp", None):
        drt = DRT()
        drt.fit_hybrid(times, i_sig, v, freq, z, hybrid_weight_factor_method=method)
        assert abs(drt.predict_r_p() - 1.8) < 0.1, method


def test_fit_chrono_downsample():
    times, i_sig, v = _simulate_chrono()
    drt = DRT()
    drt.fit_chrono(times, i_sig, v, downsample=True,
                   downsample_kw={"prestep_samples": 5, "ppd": 10})
    assert len(drt.get_fit_times()) < len(times)
    assert abs(drt.predict_r_p() - 1.8) < 0.1


def test_fit_chrono_multi_step():
    """Two steps of different sign."""
    t_pre = np.linspace(-0.01, -0.0005, 10)
    t1 = np.logspace(-5, -0.31, 60)
    t2 = 0.5 + np.logspace(-5, -0.31, 60)
    times = np.concatenate([t_pre, t1, t2])
    i_sig = np.where(times >= 0.5, -0.05, np.where(times >= 0, 0.1, 0.0))
    def resp(t0, amp):
        dt = np.maximum(times - t0, 0)
        on = times >= t0
        return amp * np.where(on, 0.3 + 1.0 * (1 - np.exp(-dt / 1e-2)), 0.0)
    v = 0.02 + resp(0.0, 0.1) + resp(0.5, -0.15)
    v = v + RNG.normal(size=len(times)) * 1e-4
    drt = DRT()
    drt.fit_chrono(times, i_sig, v)
    assert len(drt.step_times) == 2
    assert abs(drt.fit_parameters["R_inf"] - 0.3) < 0.05
    assert abs(drt.predict_r_p() - 1.0) < 0.1


def test_fit_eis_with_outlier_model():
    """Bernoulli outlier error model downweights a corrupted point."""
    freq, z = _simulate_eis(noise=1e-3)
    z_bad = z.copy()
    z_bad[12] += 0.3 + 0.3j  # gross outlier
    drt = DRT()
    drt.fit_eis(freq, z_bad, outlier_p=0.05)
    out_t = drt.qphb_params["outlier_t"]
    # The corrupted point should have high outlier probability
    n = len(freq)
    assert (1 - out_t[12]) > 0.5 or (1 - out_t[n + 12]) > 0.5
    # Fit should still recover parameters approximately
    assert abs(drt.predict_r_p() - 1.8) < 0.1


def test_remove_outliers_prefit():
    freq, z = _simulate_eis(noise=1e-3)
    z_bad = z.copy()
    z_bad[20] += 0.5 - 0.4j
    drt = DRT()
    drt.fit_eis(freq, z_bad, remove_outliers=True, outlier_p=0.05)
    assert drt.eis_outlier_index is not None
    assert drt.eis_outlier_index[20]
    assert abs(drt.predict_r_p() - 1.8) < 0.1


def test_fit_chrono_background_subtraction():
    """Static GP background subtraction runs and captures drift structure."""
    rng = np.random.default_rng(0)
    t_pre = np.linspace(-0.01, -0.0005, 15)
    t_post = np.logspace(-5, 0.5, 120)
    times = np.concatenate([t_pre, t_post])
    i_sig = np.where(times >= 0, 0.1, 0.0)
    v = 0.05 + 0.1 * np.where(times >= 0,
                              0.3 + 1.5 * (1 - np.exp(-np.maximum(times, 0) / 1e-2)), 0.0)
    drift = 0.01 * np.sin(2 * np.pi * times / 1.5) + 0.008 * times
    v = v + drift + rng.normal(size=len(times)) * 2e-4

    drt = DRT(warn=False)
    drt.fit_chrono(times, i_sig, v, subtract_background=True,
                   estimate_background_kw={"gp_kw": {"n_grid": 4}})
    assert drt.raw_response_background is not None
    assert drt.raw_response_background.shape == times.shape
    assert np.std(drt.raw_response_background) > 0
    assert abs(drt.predict_r_p() - 1.5) < 0.3
    # Background prediction available at new times
    bkg = drt.predict_chrono_background(times[:10])
    assert bkg.shape == (10,)
    # Invalid background type raises clearly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        DRT(warn=False).fit_chrono(times, i_sig, v, subtract_background=True,
                                   background_type="bogus")


def test_fit_chrono_background_dynamic_and_scaled():
    """Dynamic (design-matrix projection) and scaled (special-column) GP
    background modes (reference drt1d.py:482-492,964-970,1013-1030)."""
    rng = np.random.default_rng(0)
    t_pre = np.linspace(-0.01, -0.0005, 15)
    t_post = np.logspace(-5, 0.5, 120)
    times = np.concatenate([t_pre, t_post])
    i_sig = np.where(times >= 0, 0.1, 0.0)
    v = 0.05 + 0.1 * np.where(times >= 0,
                              0.3 + 1.5 * (1 - np.exp(-np.maximum(times, 0) / 1e-2)), 0.0)
    drift = 0.01 * np.sin(2 * np.pi * times / 1.5) + 0.008 * times
    v = v + drift + rng.normal(size=len(times)) * 2e-4

    rp = {}
    for btype in ("dynamic", "scaled"):
        drt = DRT(warn=False)
        drt.fit_chrono(times, i_sig, v, subtract_background=True,
                       background_type=btype,
                       estimate_background_kw={"gp_kw": {"n_grid": 4}})
        bkg = np.asarray(drt.raw_response_background)
        assert bkg.shape == times.shape
        assert np.all(np.isfinite(bkg))
        rp[btype] = float(drt.predict_r_p())
        assert abs(rp[btype] - 1.5) < 0.3
    # scaled mode registers and fits the background_scale amplitude
    assert drt.fit_parameters.get("background_scale") is not None
    # Both in-QP background treatments should land near the same solution
    assert abs(rp["dynamic"] - rp["scaled"]) < 0.05


def test_decimation_family():
    """get_decimation_index / select_decimation_interval /
    sigma_from_decimate_index / get_ocv_index / get_input_signal_scale
    (reference preprocessing.py decimation API)."""
    from hybdrt_tpu import preprocessing as pp

    t_sample = 1e-4
    times = np.arange(-0.01, 1.0, t_sample)
    step_times = np.array([0.0, 0.5])

    idx = pp.get_decimation_index(times, step_times, t_sample,
                                  prestep_points=5, decimation_interval=10,
                                  decimation_factor=2, max_t_sample=0.05)
    assert np.all(np.diff(idx) > 0)
    assert len(idx) < len(times) / 5
    # the sample right before each later step is retained
    second_start = np.argmax(times >= 0.5)
    assert second_start - 1 in idx
    # first points after a step are kept densely (stride 1)
    assert np.all(np.diff(idx[(times[idx] >= 0) & (times[idx] < 0.001)]) == 1)

    interval = pp.select_decimation_interval(times, step_times, t_sample, 5,
                                             2, 0.05, target_size=len(idx))
    assert 2 <= interval <= 1000

    sig = pp.sigma_from_decimate_index(np.zeros(len(times)), idx)
    assert sig.shape == times.shape
    gaps = np.diff(idx)
    min_gap = np.minimum(np.insert(gaps, 0, gaps[0]),
                         np.append(gaps, gaps[-1]))
    assert np.all(sig[idx[min_gap < 2]] == 0)      # dense regions unfiltered
    assert np.all(sig[idx[min_gap >= 2]] > 0)      # decimated regions filtered
    assert np.max(sig) > 0

    i_sig = np.where(times >= 0, 0.1, 0.0) + np.where(times >= 0.5, 0.1, 0.0)
    ocv = pp.get_ocv_index(times, step_times, [0.1, 0.1], i_sig,
                           samples_per_step=3)
    # Only the first step starts from OCV (input == 0 before it)
    assert len(ocv) == 3
    assert np.all(i_sig[ocv] == 0)

    # Consecutive ideal steps merge for scaling
    scale = pp.get_input_signal_scale(times, [0.0, 1e-5], [0.05, 0.05], "ideal")
    assert np.isclose(scale, 0.1)
    scale2 = pp.get_input_signal_scale(times, [0.0, 0.5], [0.05, 0.05], "ideal")
    assert np.isclose(scale2, 0.05)


def test_filter_chrono_signal_ramped_sigma():
    """Review regression: the antialiasing filter ramps sigma with time
    since the step (reference :507-601), preserving the sharp early
    transient while smoothing the slow tail; the decimate_index argument
    caps sigma near retained samples."""
    from hybdrt_tpu import preprocessing as pp

    t_sample = 1e-4
    times = np.arange(-0.01, 1.0, t_sample)
    rng = np.random.default_rng(0)
    clean = np.where(times >= 0, 1 - np.exp(-np.maximum(times, 0) / 1e-3), 0.0)
    noisy = clean + rng.normal(0, 0.01, len(times))

    filt = pp.filter_chrono_signal(times, noisy, step_index=[100],
                                   sigma_factor=0.01)
    # Early transient (t < 5 tau) preserved to much better than noise level
    early = (times > 0) & (times < 5e-3)
    assert np.max(np.abs(filt[early] - clean[early])) < 0.03
    # Late tail strongly smoothed (residual noise well below input noise)
    late = times > 0.5
    assert np.std(filt[late] - clean[late]) < 0.3 * np.std(
        noisy[late] - clean[late])

    # remove_outliers replaces gross spikes with filtered values
    spiked = noisy.copy()
    spiked[5000] += 5.0
    filt2 = pp.filter_chrono_signal(times, spiked, step_index=[100],
                                    remove_outliers=True)
    assert abs(filt2[5000] - clean[5000]) < 0.1

    # fixed_tau_rise is honored in the returned parameter vector
    sig = np.where(times >= 0, 1 - np.exp(-np.maximum(times, 0) / 1e-3), 0.0)
    fit = pp.fit_signal_steps(times, sig, fixed_tau_rise=1e-4)
    n_steps = len(fit["step_times"])
    assert np.allclose(np.exp(fit["x"][n_steps + 1:]), 1e-4)


def test_remove_outliers_with_downsample():
    """Review regression: the outlier pre-fit's downsampled-grid mask is
    mapped back onto the original full-length arrays before indexing
    (previously IndexError)."""
    times, i_sig, v = _simulate_chrono()
    v_bad = v.copy()
    v_bad[60] += 0.5  # gross outlier in the post-step region
    drt = DRT(warn=False)
    drt.fit_chrono(times, i_sig, v_bad, downsample=True,
                   downsample_kw={"prestep_samples": 5, "ppd": 15},
                   remove_outliers=True, outlier_p=0.05)
    assert abs(drt.predict_r_p() - 1.8) < 0.15
    assert drt.chrono_outlier_index is None \
        or len(drt.chrono_outlier_index) == len(times)


def test_predict_response_applies_vz_offset():
    """Review regression: hybrid chrono predictions apply the fitted
    vz_offset factor (reference applies (1 + vz*strength) before the
    baseline), so fit-time predictions match the converged model."""
    times, i_sig, v = _simulate_chrono()
    freq, z = _simulate_eis()
    # Introduce a genuine chrono/EIS inconsistency so vz_offset is nonzero
    drt = DRT(warn=False)
    drt.fit_hybrid(times, i_sig, v * 1.05, freq, z)
    vz = drt.fit_parameters["vz_offset"]
    assert abs(vz) > 1e-4
    v_with = drt.predict_response()
    v_without = drt.predict_response(include_vz_offset=False)
    assert not np.allclose(v_with, v_without)
    # With the factor applied, fit-time residuals are at the noise scale
    resid = v_with - drt.raw_response_signal
    assert np.std(resid) < 5 * np.std(
        (v_without - drt.raw_response_signal))
    assert np.std(resid) < 3e-3
