"""Tests: multi-spectrum co-fit, PFRT-discrete models, profiling, md utils."""
import numpy as np
import pytest

from hybdrt_tpu.models.elements import DiscreteElementModel
from hybdrt_tpu import profiling
from hybdrt_tpu.utils import md


def test_fit_eis_multi_tracks_drift():
    rng = np.random.default_rng(0)
    freq = np.logspace(4, 0, 31)
    b = 6
    rs = 1.0 + 0.1 * np.arange(b)
    taus = np.log(1e-2) + 0.1 * np.arange(b)
    z_list = [0.4 + rs[i] / (1 + (2j * np.pi * freq * np.exp(taus[i])) ** 0.9)
              + (rng.normal(size=31) + 1j * rng.normal(size=31)) * 0.002
              for i in range(b)]
    m = DiscreteElementModel("R0-RQ1")
    m.parameter_values = np.array([0.5, 1.0, np.log(1e-2), 0.9])
    m.fit_eis_multi(freq, z_list, similarity_strength=1.0)
    pv = m.parameter_values_multi
    assert pv.shape == (b, 4)
    assert np.max(np.abs(pv[:, 1] - rs)) < 0.02
    assert np.max(np.abs(pv[:, 2] - taus)) < 0.02
    # Smoothness: co-fit parameters vary monotonically
    assert np.all(np.diff(pv[:, 1]) > 0)


def test_timer_and_block_time():
    import jax.numpy as jnp
    timer = profiling.Timer()
    with timer.section("outer"):
        with timer.section("inner"):
            _ = jnp.ones(10).sum()
    summary = timer.summary()
    assert "outer" in summary and "outer/inner" in summary
    assert summary["outer"]["total"] >= summary["outer/inner"]["total"]
    out, t = profiling.block_and_time(lambda x: x * 2, jnp.ones(4), repeats=2)
    assert t >= 0


def test_md_utils_roundtrip():
    vecs = [np.arange(3.0), np.arange(5.0), np.arange(2.0)]
    v, starts = md.concatenate_vectors(vecs)
    back = md.split_vector(v, starts)
    for a, b in zip(vecs, back):
        assert np.allclose(a, b)
    arr, mask = md.pad_vectors(vecs)
    assert arr.shape == (3, 5)
    assert mask.sum() == 10


def test_series_neg_fit():
    """series_neg: stacked nonneg pos/neg coefficient sets recover a series
    negative feature (reference drt1d.py:152-153,359-360,2963-2991)."""
    import pytest
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(1)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    z = 0.3 + 1.5 / (1 + (w * 1e-3) ** 0.9) - 0.5 / (1 + (w * 1e0) ** 0.9)
    z = z + rng.normal(0, 5e-4, 41) + 1j * rng.normal(0, 5e-4, 41)

    drt = DRT(warn=False)
    drt.fit_eis(f, z, nonneg=True, series_neg=True)
    tau = np.logspace(-6, 2, 100)
    g_pos = drt.predict_distribution(tau, sign=1)
    g_neg = drt.predict_distribution(tau, sign=-1)
    g_tot = drt.predict_distribution(tau, sign=0)
    # Signed components land at the true time constants
    assert abs(np.log10(tau[np.argmax(g_pos)]) - (-3)) < 0.5
    assert abs(np.log10(tau[np.argmin(g_neg)]) - 0.0) < 0.5
    assert np.all(g_pos >= -1e-10) and np.all(g_neg <= 1e-10)
    assert np.allclose(g_tot, g_pos + g_neg, atol=1e-10)
    # Net Rp = 1.5 - 0.5; ohmic recovered; data reproduced
    assert abs(drt.predict_r_p() - 1.0) < 0.1
    assert abs(drt.fit_parameters["R_inf"] - 0.3) < 0.02
    zh = drt.predict_z(f)
    assert np.linalg.norm(zh - z) / np.linalg.norm(z) < 0.01
    # series_neg requires nonneg (reference drt1d.py:152-153)
    with pytest.raises(ValueError):
        DRT(warn=False).fit_eis(f, z, nonneg=False, series_neg=True)


def test_drt_parity_methods():
    """Thin parity methods: CIs, DOP covariance, split_r_p, chi-sq, Fisher,
    peak probability (reference drt1d.py:3153-3750,3596,3631,4140)."""
    import pytest
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(0)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    z = 0.4 + 1.0 / (1 + (w * 1e-3) ** 0.9) + 0.8 / (1 + (w * 1e-1) ** 0.85)
    z = z + rng.normal(0, 1e-3, 41) + 1j * rng.normal(0, 1e-3, 41)
    drt = DRT(warn=False, fit_dop=True)
    drt.fit_eis(f, z)

    tau = np.logspace(-6, 2, 80)
    lo, hi = drt.predict_distribution_ci(tau=tau)
    assert np.all(hi >= lo)
    # split at 1e-2 separates the two ZARC areas; sum preserves Rp
    areas = drt.split_r_p([1e-2])
    assert areas.shape == (2,)
    assert abs(np.sum(areas) - drt.predict_r_p()) < 0.05
    assert abs(areas[0] - 1.0) < 0.15 and abs(areas[1] - 0.8) < 0.15
    # chi-sq small for a good fit; modulus weighting accepted
    assert drt.evaluate_chi_sq() < 1e-4
    assert drt.evaluate_chi_sq(weights="modulus") < 1e-4
    with pytest.raises(ValueError):
        drt.evaluate_chi_sq(weights=np.ones(3))
    # Fisher matrix: PSD, full param dimension
    fim = drt.fisher_matrix()
    assert fim.shape[0] == fim.shape[1]
    assert np.all(np.linalg.eigvalsh(fim) > -1e-8)
    # sigma accessors
    assert drt.predict_sigma("eis").shape == f.shape
    with pytest.raises(ValueError):
        drt.predict_sigma("bogus")
    # data tau limits bracket the measured frequency window
    tmin, tmax = drt.get_data_tau_limits()
    assert tmin < 1e-5 and tmax > 1e-1
    # DOP covariance + CI
    cov = drt.estimate_dop_cov()
    assert np.all(np.diag(cov) >= 0)
    dlo, dhi = drt.predict_dop_ci()
    assert np.all(dhi >= dlo)
    # Peak probability finds a peak with high confidence on a fine grid
    tau_f = np.logspace(-5, 1, 600)
    prob = drt.predict_peak_prob(tau_f)
    assert prob.max() > 0.9
    pk = drt.find_peaks_byprob(tau_f, height=0.3)
    assert len(pk) >= 1
    assert np.any(np.abs(np.log10(pk) - (-1)) < 0.3)
    # norm/sign/alias helpers
    assert drt.get_drt_norm(False) == 1.0
    assert drt.get_drt_norm(True) == pytest.approx(drt.predict_r_p())
    assert drt.default_dist_sign() == 1
    assert drt.integrate_distribution(1e-4, 1e0) == pytest.approx(
        drt.integrate_drt(1e-4, 1e0))
    assert np.allclose(drt.predict_v_baseline(np.linspace(0, 1, 5)), 0)


def test_preprocessing_outlier_and_density_helpers():
    """flag_chrono_outliers / outlier_prob / get_time_ppd / get_ppd
    (reference preprocessing.py:594-600, 860-905)."""
    from scipy import ndimage
    from hybdrt_tpu import preprocessing as pp
    rng = np.random.default_rng(0)
    y = np.sin(np.linspace(0, 5, 200)) + rng.normal(0, 0.01, 200)
    y[50] += 0.5
    y[120] -= 0.4
    y_filt = ndimage.gaussian_filter1d(y, 3)
    flags = pp.flag_chrono_outliers(y, y_filt)
    hits = set(np.flatnonzero(flags).tolist())
    assert 50 in hits and 120 in hits
    # Gaussian smoothing spreads each spike over neighbors; still localized
    assert len(hits) <= 15

    t = np.concatenate([np.linspace(-1e-3, -1e-4, 5), np.logspace(-5, 0, 101)])
    ppd = pp.get_time_ppd(t, [0.0])
    assert abs(ppd - 20) < 1.0
    assert pp.get_ppd(np.logspace(0, 2, 21)) == pytest.approx(10.0)
    # alias
    assert pp.generate_loguniform_times is pp.generate_log_times


def test_drt_save_load_roundtrip(tmp_path):
    """Fit -> save_attributes -> load into a fresh instance -> identical
    predictions (reference drt1d.py:6325-6391)."""
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(0)
    f = np.logspace(5, -1, 31)
    w = 2j * np.pi * f
    z = 0.4 + 1.5 / (1 + (w * 1e-3) ** 0.9)
    z = z + rng.normal(0, 1e-3, 31) + 1j * rng.normal(0, 1e-3, 31)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)
    dest = tmp_path / "fit.pkl"
    drt.save_attributes(["config", "fit_core"], dest)

    drt2 = DRT(warn=False, interpolate_integrals=False)
    drt2.load_attributes(str(dest))
    drt2.interpolate_lookups = drt.interpolate_lookups
    drt2.integrate_method = drt.integrate_method
    assert np.allclose(drt2.fit_parameters["x"], drt.fit_parameters["x"])
    tau = np.logspace(-5, 1, 40)
    assert np.allclose(drt2.predict_distribution(tau), drt.predict_distribution(tau))
    assert np.allclose(drt2.predict_z(f), drt.predict_z(f))
    assert drt2.predict_r_p() == pytest.approx(drt.predict_r_p())


def test_map_samples_and_posterior_mean():
    """generate_map_samples/estimate_posterior_mean: vmapped
    pinned-coordinate conditional QPs around the (refined) MAP. The
    reference's implementation (drt1d.py:4147) depends on
    qphb.optimize_lp_semi_fixed which is commented out upstream; this is a
    working equivalent, so the test asserts the math, not golden values."""
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(0)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    z = 0.4 + 1.0 / (1 + (w * 1e-3) ** 0.9) + 0.8 / (1 + (w * 1e-1) ** 0.85)
    z = z + rng.normal(0, 1e-3, 41) + 1j * rng.normal(0, 1e-3, 41)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)

    s = drt.generate_map_samples()
    n_drt = len(drt.basis_tau)
    assert s["x"].shape == (n_drt * 6, drt.get_qp_mat_offset() + n_drt)
    assert np.all(np.isfinite(s["lp"]))
    # The refined MAP dominates every conditionally-constrained sample
    assert np.all(s["lp"] <= s["lp_hat"] + 1e-7)
    # Pinned coordinates actually took their requested (clipped) values
    k = len(s["index"]) // 2
    i = s["index"][k]
    assert s["x"][k, i] >= 0  # nonneg respected

    # Posterior mean stays near the MAP for well-identified data, and
    # physical predictions agree
    x_mean = drt.estimate_posterior_mean()
    pm = drt.extract_qphb_parameters(x_mean)
    assert abs(drt.predict_r_p(x=pm["x"]) - drt.predict_r_p()) < 0.05

    # Cache: same kwargs return the same object; refresh re-runs
    assert drt.generate_map_samples() is s
    assert drt.generate_map_samples(shift_scale=2.0) is not s


def test_basis_area_and_count_properties():
    """tau_basis_area/nu_basis_area/num_eis/num_chrono parity properties
    (reference drtbase.py:256-260,599-613)."""
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(1)
    f = np.logspace(5, -1, 31)
    w = 2j * np.pi * f
    z = 0.4 + 1.0 / (1 + (w * 1e-2) ** 0.9)
    z = z + rng.normal(0, 1e-3, 31) + 1j * rng.normal(0, 1e-3, 31)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)
    assert drt.tau_basis_area > 0
    assert drt.num_eis == 31
    assert drt.num_chrono == 0


def test_get_parameter_quantile():
    """Posterior quantiles bracket the MAP and are monotone in the quantile
    (reference drt1d.py:4403)."""
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(2)
    f = np.logspace(5, -1, 31)
    w = 2j * np.pi * f
    z = 0.4 + 1.2 / (1 + (w * 1e-2) ** 0.9)
    z = z + rng.normal(0, 1e-3, 31) + 1j * rng.normal(0, 1e-3, 31)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)
    qs = drt.get_parameter_quantile([0.025, 0.5, 0.975])
    assert qs.shape == (3, drt.get_qp_mat_offset() + len(drt.basis_tau))
    assert np.all(qs[0] <= qs[1] + 1e-12) and np.all(qs[1] <= qs[2] + 1e-12)
    # Median stays near the refined MAP
    x_hat = drt.map_samples["x_hat"]
    big = np.abs(x_hat) > 0.05  # well-identified coordinates
    assert np.all(np.abs(qs[1][big] - x_hat[big]) / np.abs(x_hat[big]) < 0.5)


def test_compilation_cache_dir_is_machine_keyed(tmp_path, monkeypatch):
    # Cached XLA:CPU executables are ISA-specialized; reusing them across VM
    # migrations with different CPU features can SIGILL. The default cache
    # location must therefore embed a stable machine fingerprint.
    from hybdrt_tpu.utils import device as dev

    fp1, fp2 = dev._machine_fingerprint(), dev._machine_fingerprint()
    assert fp1 == fp2 and len(fp1) == 10

    import jax
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("HYBDRT_TPU_COMPILE_CACHE_DIR", raising=False)
        # The suite env disables the cache globally (tests/conftest.py);
        # this unit test exercises the default-on behavior
        monkeypatch.delenv("HYBDRT_TPU_NO_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        assert dev.init_compilation_cache()
        assert jax.config.jax_compilation_cache_dir.endswith("jax_cache-" + fp1)

        # Explicit relocation and full opt-out still honored
        monkeypatch.setenv("HYBDRT_TPU_COMPILE_CACHE_DIR", str(tmp_path / "x"))
        assert dev.init_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "x")
        monkeypatch.setenv("HYBDRT_TPU_NO_COMPILE_CACHE", "1")
        assert not dev.init_compilation_cache()
        monkeypatch.delenv("HYBDRT_TPU_NO_COMPILE_CACHE")

        # Read-only mode: hits are served but the unreachable write threshold
        # means jax never calls the native executable.serialize() (which has
        # segfaulted long-lived many-compile processes)
        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        monkeypatch.setenv("HYBDRT_TPU_COMPILE_CACHE_READONLY", "1")
        assert dev.init_compilation_cache()
        assert jax.config.jax_persistent_cache_min_compile_time_secs >= 1e9
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
