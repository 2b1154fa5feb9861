"""Tests for the multi-dimensional mapping layer (DRTMD + resolve)."""
import numpy as np
import pytest

from hybdrt_tpu.mapping.drtmd import DRTMD


FREQ = np.logspace(5, -1, 41)
TAU_SUPER = np.logspace(-7, 2, 91)
B = 10
PSIS = np.linspace(0, 1, B)


def _zarc(f, r, tau0, a=0.9):
    return r / (1 + (2j * np.pi * f * tau0) ** a)


def _make_map_data():
    rng = np.random.default_rng(0)
    z_list = []
    for p in PSIS:
        tau_peak = 10 ** (-3 + 2 * p)
        z = 0.3 + 0.2 * p + _zarc(FREQ, 1.0 + 0.5 * p, tau_peak)
        z = z + (rng.normal(size=len(FREQ)) + 1j * rng.normal(size=len(FREQ))) * 0.002
        z_list.append(z)
    return z_list


@pytest.fixture(scope="module")
def fitted_md():
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False, print_progress=False)
    for p, z in zip(PSIS, _make_map_data()):
        md.add_observation([p], None, (FREQ, z), group_id="g1")
    md.fit_all()
    return md


def test_fit_all_recovers_trends(fitted_md):
    md = fitted_md
    assert md.obs_fit_status.all()
    rp = md.predict_r_p()
    assert np.max(np.abs(rp - (1.0 + 0.5 * PSIS))) < 0.05
    r_inf = md.obs_special["R_inf"]
    assert np.max(np.abs(r_inf - (0.3 + 0.2 * PSIS))) < 0.05


def test_obs_x_on_supergrid(fitted_md):
    md = fitted_md
    assert md.obs_x.shape == (B, len(TAU_SUPER))
    # Peak location should move with psi
    peak_tau = TAU_SUPER[np.argmax(md.obs_x, axis=1)]
    assert np.all(np.diff(np.log(peak_tau)) > -0.5)
    assert peak_tau[-1] > 10 * peak_tau[0]


def test_resolve_group(fitted_md):
    md = fitted_md
    md.resolve_group("g1", psi_sort_dims=["T"])
    assert md.obs_resolve_status.all()
    rp_res = md.predict_r_p(resolved=True)
    assert np.max(np.abs(rp_res - (1.0 + 0.5 * PSIS))) < 0.05
    # Resolution smooths across psi: total curvature should not increase much
    def roughness(x):
        return np.sum(np.diff(x, n=2, axis=0) ** 2)
    assert roughness(md.obs_x_resolved) < roughness(md.obs_x) * 1.5


def test_batched_fit_matches_serial(fitted_md):
    md2 = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False, print_progress=False)
    for p, z in zip(PSIS, _make_map_data()):
        md2.add_observation([p], None, (FREQ, z), group_id="g1")
    md2.fit_all(batched=True)
    assert md2.obs_fit_status.all()
    assert np.allclose(md2.obs_x, fitted_md.obs_x, atol=1e-7)
    # Resolve works from the batched path (lazy P,q reconstruction)
    md2.resolve_group("g1", psi_sort_dims=["T"])
    assert md2.obs_resolve_status.all()


def test_predict_at_psi(fitted_md):
    md = fitted_md
    x = md.predict_x(psi=[[0.5]], resolved=False)
    assert x.shape == (1, len(TAU_SUPER))
    drt_curves = md.predict_drt(obs_index=[0, 5], resolved=False)
    assert drt_curves.shape == (2, len(TAU_SUPER))


def test_persistence_roundtrip(tmp_path, fitted_md):
    md = fitted_md
    dest = tmp_path / "md.pkl"
    md.save_attributes(dest)
    md2 = DRTMD.from_source(str(dest))
    assert np.allclose(md2.obs_x, md.obs_x)
    assert np.allclose(md2.predict_r_p(resolved=False), md.predict_r_p(resolved=False))


def test_ignore_errors():
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False, print_progress=False)
    md.add_observation([0.0], None, (FREQ, _make_map_data()[0]))
    md.add_observation([1.0], None, (FREQ[:5], np.full(5, np.nan + 0j)))  # bad data
    md.fit_all(ignore_errors=True)
    assert md.obs_fit_status[0]
    assert not md.obs_fit_status[1]
    assert md.obs_ignore_flag[1]


def test_drtmd_pfrt_fit_type():
    """fit_type='pfrt': per-factor solutions stored for each observation
    (reference drtmd.py:32,98-100,820-821,925-975,1137-1158)."""
    import pytest
    from hybdrt_tpu import DRTMD

    def sim_eis(tau0, seed):
        rng = np.random.default_rng(seed)
        f = np.logspace(5, -1, 31)
        w = 2j * np.pi * f
        z = 0.4 + 1.5 / (1 + (w * tau0) ** 0.9)
        return f, z + rng.normal(0, 1e-4, 31) + 1j * rng.normal(0, 1e-4, 31)

    factors = np.logspace(-0.5, 0.5, 5)
    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               fit_type="pfrt", pfrt_factors=factors,
               print_progress=False, warn=False)
    for i, t0 in enumerate([1e-3, 2e-3]):
        md.add_observation([700 + 50 * i], None, sim_eis(t0, i))
    md.fit_all()

    assert md.obs_x.shape == (2, 5, 91)
    assert md.predict_x(obs_index=[0, 1]).shape == (2, 5, 91)
    assert md.predict_x(obs_index=[0, 1], factor_index=2).shape == (2, 91)
    # Specials resolved per factor; R_inf recovered at every level
    rinf = md.predict_special("R_inf", obs_index=[0])
    assert rinf.shape == (1, 5)
    assert np.allclose(rinf, 0.4, atol=0.05)
    # Covariances per factor level
    assert md.predict_x_cov([0], factor_index=2).shape == (1, 91, 91)
    assert md.predict_x_cov([0]).shape == (1, 5, 91, 91)
    # Resolve is drt-only (batched pfrt is supported separately)
    with pytest.raises(ValueError):
        md.resolve_observations([0, 1])
    with pytest.raises(ValueError):
        DRTMD(tau_supergrid=np.logspace(-7, 2, 91), fit_type="bogus")


def test_drtmd_convenience_and_qc():
    """Convenience accessors, filtered maps, QC scoring, probability maps
    (reference drtmd.py:561-1135)."""
    from hybdrt_tpu import DRTMD

    def sim_eis(tau0, seed):
        rng = np.random.default_rng(seed)
        f = np.logspace(5, -1, 31)
        w = 2j * np.pi * f
        z = 0.4 + 1.5 / (1 + (w * tau0) ** 0.9)
        return f, z + rng.normal(0, 1e-4, 31) + 1j * rng.normal(0, 1e-4, 31)

    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               print_progress=False, warn=False)
    for i, t0 in enumerate([1e-3, 1.5e-3, 2e-3, 3e-3]):
        md.add_observation([700 + 25 * i], None, sim_eis(t0, i), group_id="g")
    md.fit_all()

    assert md.fitted_obs_index().tolist() == [0, 1, 2, 3]
    assert md.unique_group_ids() == ["g"]
    assert md.get_psi_index([[710]]).tolist() == [0]
    assert md.tau_basis_area > 0
    df = md.obs_psi_df()
    assert list(df["T"]) == [700, 725, 750, 775]

    tau = md.get_tau_eval(5)
    var = md.predict_drt_var([0, 1], tau=tau)
    assert var.shape == (2, len(tau)) and np.all(var >= -1e-12)
    # peak probability concentrates near the true tau of each spectrum
    pp = md.predict_peak_prob(obs_index=[0, 1, 2, 3], tau=tau)
    assert pp.shape == (4, len(tau))
    assert np.nanmax(pp) > 0.5

    oi, x_f, sp_f = md.filter_observations(psi_sort_dims=["T"])
    assert x_f.shape == (4, 91)
    assert np.any(md.obs_x_filt != 0)
    _, rss = md.score_group_fit_badness("g", psi_sort_dims=["T"])
    assert rss.shape == (4,) and np.all(np.isfinite(rss))

    md.clear_fits()
    assert not md.obs_fit_status.any()
    assert np.all(md.obs_x == 0)


def test_drtmd_batched_hybrid():
    """fit_all(batched=True) dispatches hybrid observations on a shared
    protocol to the vmapped hybrid fitter."""
    from hybdrt_tpu import DRTMD
    rng = np.random.default_rng(0)
    times = np.concatenate([np.linspace(-0.005, -0.0005, 8), np.logspace(-5, 0, 60)])
    i_sig = np.where(times >= 0, 0.1, 0.0)
    f = np.logspace(5, -1, 25)
    w = 2j * np.pi * f

    def sim(seed):
        r = np.random.default_rng(seed)
        tau0, r0 = 10 ** r.uniform(-3, -2), r.uniform(1.0, 2.0)
        v = 0.3 * i_sig + 0.1 * r0 * (1 - np.exp(-np.maximum(times, 0) / tau0)) \
            * (times >= 0) + r.normal(0, 2e-4, len(times))
        z_ = 0.3 + r0 / (1 + (w * tau0)) + r.normal(0, 1e-3, 25) * (1 + 1j)
        return (times, i_sig, v), (f, z_), r0

    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               print_progress=False, warn=False)
    truths = []
    for i in range(4):
        cd, ed, r0 = sim(i)
        md.add_observation([700 + i], cd, ed, group_id="h")
        truths.append(r0)
    md.fit_all(batched=True)
    assert md.obs_fit_status.all()
    rp = md.predict_r_p(obs_index=np.arange(4), resolved=False)
    assert np.max(np.abs(rp - np.array(truths))) < 0.08
    rinf = md.predict_special("R_inf", obs_index=np.arange(4), resolved=False)
    assert np.allclose(rinf, 0.3, atol=0.03)


def test_drtmd_batched_pfrt():
    """fit_type='pfrt' + batched=True: one vmapped PFRT sweep over all
    observations."""
    from hybdrt_tpu import DRTMD

    def sim_eis(tau0, seed):
        rng = np.random.default_rng(seed)
        f = np.logspace(5, -1, 31)
        w = 2j * np.pi * f
        z = 0.4 + 1.5 / (1 + (w * tau0) ** 0.9)
        return f, z + rng.normal(0, 1e-4, 31) + 1j * rng.normal(0, 1e-4, 31)

    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               fit_type="pfrt", pfrt_factors=np.logspace(-0.5, 0.5, 5),
               print_progress=False, warn=False)
    for i, t0 in enumerate([1e-3, 2e-3, 3e-3]):
        md.add_observation([700 + 25 * i], None, sim_eis(t0, i))
    md.fit_all(batched=True)
    assert md.obs_fit_status.all()
    assert md.obs_x.shape == (3, 5, 91)
    assert md.predict_x(obs_index=[0, 1, 2], factor_index=2).shape == (3, 91)
    rinf = md.predict_special("R_inf", obs_index=[0, 1, 2])
    assert np.allclose(rinf, 0.4, atol=0.02)
    # llh recorded per observation
    assert np.all(np.isfinite(md.obs_llh[:3]))


def test_batched_pfrt_covariance_matches_serial():
    """get_fit/predict_param_cov for batched-pfrt observations: the per-step
    posterior precision P is rebuilt on demand from the stored sweep state
    and matches a serial pfrt_fit covariance (the reference can always
    produce estimate_param_cov from any fit, drt1d.py:4116-4146)."""
    from hybdrt_tpu import DRTMD
    from hybdrt_tpu.models.drt import DRT as _DRT

    def sim_eis(tau0, seed):
        rng = np.random.default_rng(seed)
        f = np.logspace(5, -1, 31)
        w = 2j * np.pi * f
        z = 0.4 + 1.5 / (1 + (w * tau0) ** 0.9)
        return f, z + rng.normal(0, 1e-4, 31) + 1j * rng.normal(0, 1e-4, 31)

    factors = np.logspace(-0.5, 0.5, 3)
    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               fit_type="pfrt", pfrt_factors=factors,
               print_progress=False, warn=False)
    obs = [sim_eis(t0, i) for i, t0 in enumerate([1e-3, 3e-3])]
    for i, (f, z) in enumerate(obs):
        md.add_observation([700 + 25 * i], None, (f, z))
    md.fit_all(batched=True)
    assert md.obs_fit_status.all()

    # get_fit now works for batched-pfrt observations
    drt_b = md.get_fit(0)
    assert drt_b.pfrt_result is not None
    assert len(drt_b.pfrt_result["step_p_mat"]) == len(factors)

    # Serial oracle on the same observation
    drt_s = _DRT(tau_supergrid=md.tau_supergrid, warn=False)
    drt_s.pfrt_fit_eis(*obs[0], factors=factors)

    for k in range(len(factors)):
        cov_b = drt_b.estimate_param_cov(
            p_matrix=drt_b.pfrt_result["step_p_mat"][k])
        cov_s = drt_s.estimate_param_cov(
            p_matrix=drt_s.pfrt_result["step_p_mat"][k])
        scale = np.max(np.abs(np.diag(cov_s)))
        assert np.allclose(cov_b, cov_s, atol=1e-6 * scale), k

    # The DRTMD-level accessors work end-to-end
    covs = md.predict_param_cov([0, 1], factor_index=1)
    assert covs[0].shape == covs[1].shape
    assert np.all(np.isfinite(covs[0]))
    x_cov = md.predict_x_cov([0], factor_index=1)
    assert x_cov.shape == (1, 91, 91)
    x_cov_all = md.predict_x_cov([0])
    assert x_cov_all.shape == (1, len(factors), 91, 91)


def test_resolve_group_batched_matches_serial(fitted_md):
    """Device-parallel resolve: all overlapping windows solved as one vmapped
    computation must match the serial per-window path to 1e-8, with and
    without an 8-device mesh (the reference loops windows serially through
    cvxopt, reference drtmd.py:486-560)."""
    import copy
    import jax
    from hybdrt_tpu.parallel.sharding import make_mesh

    md_serial = copy.deepcopy(fitted_md)
    md_serial.resolve_group("g1", psi_sort_dims=["T"])

    md_batched = copy.deepcopy(fitted_md)
    md_batched.resolve_group("g1", psi_sort_dims=["T"], batched=True)
    assert md_batched.obs_resolve_status.all()
    assert np.allclose(md_batched.obs_x_resolved, md_serial.obs_x_resolved,
                       rtol=1e-8, atol=1e-10)
    for key in md_serial.obs_special_resolved:
        assert np.allclose(md_batched.obs_special_resolved[key],
                           md_serial.obs_special_resolved[key],
                           rtol=1e-8, atol=1e-10), key

    md_mesh = copy.deepcopy(fitted_md)
    mesh = make_mesh(jax.devices("cpu"))
    md_mesh.resolve_group("g1", psi_sort_dims=["T"], batched=True, mesh=mesh)
    assert np.allclose(md_mesh.obs_x_resolved, md_serial.obs_x_resolved,
                       rtol=1e-8, atol=1e-10)


def test_batched_ignore_errors_and_telemetry():
    """Batched fit_all with one NaN-poisoned observation: with
    ignore_errors=True the poisoned obs is flagged and the rest are fitted;
    fit_convergence_summary reports per-obs telemetry (batched analog of the
    reference's serial try/except loop, drtmd.py:303-319)."""
    z_list = _make_map_data()
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False, print_progress=False)
    for k, (p, z) in enumerate(zip(PSIS[:4], z_list[:4])):
        if k == 2:
            z = z.copy()
            z[10] = np.nan + 1j * np.nan
        md.add_observation([p], None, (FREQ, z), group_id="g1")

    md.fit_all(batched=True, ignore_errors=True)
    assert md.obs_fit_status[[0, 1, 3]].all()
    assert not md.obs_fit_status[2]
    assert md.obs_ignore_flag[2]
    assert md.obs_fit_errors[2] is not None

    summary = md.fit_convergence_summary()
    assert summary["num_fitted"] == 3
    assert summary["num_failed"] == 1
    assert summary["errors"][2] is not None
    assert summary["n_iter"][0] > 0
    # Healthy fits still match an unpoisoned serial fit
    md_ref = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                   print_progress=False)
    md_ref.add_observation([PSIS[0]], None, (FREQ, z_list[0]))
    md_ref.fit_all()
    assert np.allclose(md.obs_x[0], md_ref.obs_x[0], atol=1e-6)

    # Without ignore_errors the poisoned batch raises
    md2 = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                print_progress=False)
    z_bad = z_list[0].copy()
    z_bad[:] = np.nan + 1j * np.nan
    md2.add_observation([0.0], None, (FREQ, z_bad))
    with pytest.raises(ValueError):
        md2.fit_all(batched=True)


def test_filter_psi_and_obs_dtype(fitted_md):
    md = fitted_md
    idx = md.filter_psi(dim_gt={"T": 0.5})
    assert np.all(PSIS[idx] > 0.5)
    mask = md.filter_psi(dim_lt={"T": 0.5}, return_index=False)
    assert mask.dtype == bool and mask.sum() == np.sum(PSIS < 0.5)
    assert md.filter_psi(dim_eq={"T": PSIS[3]}).tolist() == [3]
    assert md.obs_dtype == ["eis"] * B


def test_load_attributes_roundtrip(tmp_path, fitted_md):
    md = fitted_md
    dest = tmp_path / "md_attrs.pkl"
    md.save_attributes(dest)
    md2 = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False, print_progress=False)
    md2.load_attributes(str(dest))
    assert np.allclose(md2.obs_x, md.obs_x)
    assert md2.num_obs == md.num_obs


def test_batched_pfrt_mixed_grids():
    """fit_type='pfrt' + batched=True partitions observations by frequency
    grid and runs one vmapped sweep per group (previously raised on mixed
    grids)."""
    from hybdrt_tpu import DRTMD as _DRTMD

    def sim(f, tau0, seed):
        rng = np.random.default_rng(seed)
        z = 0.4 + 1.5 / (1 + (2j * np.pi * f * tau0) ** 0.9)
        return z + rng.normal(0, 1e-4, len(f)) + 1j * rng.normal(0, 1e-4, len(f))

    factors = np.logspace(-0.5, 0.5, 3)
    md = _DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                print_progress=False, fit_type="pfrt", pfrt_factors=factors)
    grids = [np.logspace(5, -1, 31), np.logspace(4, -2, 27)]
    taus = [1e-3, 3e-3, 1e-2, 3e-2]
    for k, t0 in enumerate(taus):
        md.add_observation([k * 0.1], None, (grids[k % 2], sim(grids[k % 2], t0, k)))
    md.fit_all(batched=True)
    assert md.obs_fit_status.all()
    # Each observation's best-llh solution peaks at its true tau
    for k, t0 in enumerate(taus):
        attr = md.obs_fit_attr[k]
        assert attr.get("pfrt")
        best = int(np.argmax(attr["step_llh"]))
        x_best = md.obs_x[k, best]
        peak_tau = TAU_SUPER[np.argmax(x_best)]
        assert abs(np.log10(peak_tau / t0)) < 0.3


def test_uniform_batched_llh_matches_serial_and_reload_rebuild(tmp_path):
    """Review regressions: uniform batched fits store the same weighted
    scaled-space llh/rss as the serial path, and a reloaded DRTMD rebuilds
    its shared-grid fitter for get_fit/resolve (previously AttributeError)."""
    z_list = _make_map_data()[:4]
    md_b = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                 print_progress=False)
    md_s = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                 print_progress=False)
    for p, z in zip(PSIS[:4], z_list):
        md_b.add_observation([p], None, (FREQ, z), group_id="g1")
        md_s.add_observation([p], None, (FREQ, z), group_id="g1")
    md_b.fit_all(batched=True)
    md_s.fit_all()
    assert np.allclose(md_b.obs_llh[:4], md_s.obs_llh[:4], rtol=1e-3, atol=0.5)
    assert np.allclose(md_b.obs_rss[:4], md_s.obs_rss[:4], rtol=1e-3,
                       atol=1e-6)

    dest = tmp_path / "md_uniform.pkl"
    md_b.save_attributes(dest)
    md2 = DRTMD.from_source(str(dest))
    drt0 = md2.get_fit(0)  # rebuilds the fitter from stored config
    cov = drt0.estimate_param_cov()
    assert cov is not None and np.all(np.isfinite(np.diag(cov)))
    md2.resolve_group("g1", psi_sort_dims=["T"])
    assert md2.obs_resolve_status[:4].all()


def test_persistence_keeps_model_config(tmp_path):
    """Review regression: save/load round-trips the full model configuration
    (fit flags, step model, chrono mode), and clear_obs keeps it."""
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False, fit_capacitance=True,
               step_model="expdecay")
    dest = tmp_path / "cfg.pkl"
    md.save_attributes(dest)
    md2 = DRTMD.from_source(str(dest))
    assert md2.fit_capacitance is True
    assert md2.step_model == "expdecay"

    md.clear_obs()
    assert md.fit_capacitance is True and md.step_model == "expdecay"


def test_estimate_obs_drt_var_for_batched(fitted_md):
    """Batched fits can reconstruct per-observation DRT variance on demand,
    matching the serially stored values."""
    md2 = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                print_progress=False)
    for p, z in zip(PSIS[:3], _make_map_data()[:3]):
        md2.add_observation([p], None, (FREQ, z), group_id="g1")
    md2.fit_all(batched=True)
    assert np.all(md2.obs_drt_var[:3] == 0)
    md2.estimate_obs_drt_var()
    assert np.all(md2.obs_drt_var[:3] >= 0)
    assert np.any(md2.obs_drt_var[:3] > 0)
    # Matches the serial path's stored variance inside the basis window
    # (the extend_var extrapolation beyond it is sensitive to edge values)
    li, ri = md2.obs_tau_indices[0]
    interior = slice(li + 2, ri - 2)
    rel = np.abs(md2.obs_drt_var[0][interior]
                 - fitted_md.obs_drt_var[0][interior]) \
        / (np.max(fitted_md.obs_drt_var[0][interior]) + 1e-30)
    assert np.max(rel) < 1e-2


def test_incremental_batched_fit_all_reuses_fitter():
    """Incremental mapping: add observations, fit_all(batched=True), add
    more (on a NEW grid), fit_all again. The second call must reuse the
    cached ragged fitter (no fresh jit entry per call — that costs ~10 s
    per call on a 1-vCPU host) and still produce fits matching a
    fresh-instance fit of the same observations."""
    rng = np.random.default_rng(3)
    grids = [np.logspace(5, -1, 31), np.logspace(4, -2, 25)]

    def obs_for(k):
        f = grids[k % 2]
        z = 0.35 + _zarc(f, 1.0 + 0.1 * k, 10 ** (-2 + 0.3 * k))
        return f, z + (rng.normal(size=len(f))
                       + 1j * rng.normal(size=len(f))) * 1e-3

    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    all_obs = [obs_for(k) for k in range(7)]
    for k in range(4):
        md.add_observation([float(k)], None, all_obs[k])
    md.fit_all(batched=True)
    fitter1 = md._fitter_cache[next(iter(md._fitter_cache))]
    for k in range(4, 7):
        md.add_observation([float(k)], None, all_obs[k])
    md.fit_all(batched=True)  # only fits the 3 new obs
    assert md.obs_fit_status.all()
    assert len(md._fitter_cache) == 1
    assert next(iter(md._fitter_cache.values())) is fitter1

    md_fresh = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                     print_progress=False)
    for k in range(7):
        md_fresh.add_observation([float(k)], None, all_obs[k])
    md_fresh.fit_all(batched=True)
    assert np.allclose(md.obs_x, md_fresh.obs_x, rtol=1e-6, atol=1e-9)
    assert np.allclose(md.obs_llh, md_fresh.obs_llh, rtol=1e-6, atol=1e-8)


def test_batch_fit_kw_forwards_throughput_knobs():
    """DRTMD(batch_fit_kw=...) forwards the throughput knobs (QP straggler
    caps, data-space early stop) to every batched fitter; results stay
    within the documented accuracy envelope of the default solver."""
    rng = np.random.default_rng(9)
    grids = [np.logspace(5, -1, 31), np.logspace(4, -2, 25)]

    def build(**kw):
        md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                   print_progress=False, **kw)
        for k in range(4):
            f = grids[k % 2]
            z = 0.35 + _zarc(f, 1.0 + 0.1 * k, 10 ** (-2 + 0.3 * k))
            z = z + (rng.normal(size=len(f))
                     + 1j * rng.normal(size=len(f))) * 1e-3
            md.add_observation([float(k)], None, (f, z))
        return md

    rng = np.random.default_rng(9)
    md_fast = build(batch_fit_kw=dict(qp_max_iter=20, qp_max_iter_warm=8,
                                      pred_stop=True))
    md_fast.fit_all(batched=True)
    rng = np.random.default_rng(9)
    md_ref = build()
    md_ref.fit_all(batched=True)
    assert md_fast.obs_fit_status.all()
    fitter = next(iter(md_fast._fitter_cache.values()))
    assert fitter.qp_max_iter == 20 and fitter.pred_stop
    assert np.allclose(md_fast.predict_r_p(), md_ref.predict_r_p(),
                       rtol=2e-3)


def test_batch_fit_kw_routes_staged_scheduling():
    """batch_fit_kw scheduling keys (adaptive/phase_budgets/
    staged_capacities) are fit-call kwargs, not constructor kwargs: DRTMD
    must route them to the shared-grid fitters' fit() calls, and the staged
    single-dispatch schedule must reproduce the plain batched fit bitwise."""
    rng = np.random.default_rng(13)

    def build(**kw):
        md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
                   print_progress=False, **kw)
        for k in range(5):
            z = 0.35 + _zarc(FREQ, 1.0 + 0.1 * k, 10 ** (-2 + 0.3 * k))
            z = z + (rng.normal(size=len(FREQ))
                     + 1j * rng.normal(size=len(FREQ))) * 1e-3
            md.add_observation([float(k)], None, (FREQ, z))
        return md

    rng = np.random.default_rng(13)
    md_staged = build(batch_fit_kw={"adaptive": "staged",
                                    "phase_budgets": (6, 15),
                                    "staged_capacities": (3, 1)})
    md_staged.fit_all(batched=True)
    rng = np.random.default_rng(13)
    md_plain = build()
    md_plain.fit_all(batched=True)
    assert md_staged.obs_fit_status.all()
    # scheduling keys must not reach the fitter constructor
    fitter = next(iter(md_staged._fitter_cache.values()))
    assert not hasattr(fitter, "adaptive")
    # near-bitwise: same trajectories, fusion differs across the gathered
    # sub-batches (same tolerance as test_parallel staged parity)
    assert np.allclose(md_staged.predict_r_p(), md_plain.predict_r_p(),
                       rtol=1e-9, atol=1e-11)


def test_fitter_cache_invalidated_by_structural_change():
    """Mutating structural model config (e.g. fit_dop) between fit_all calls
    must invalidate the cached batched fitters, which were assembled from the
    old attributes — reusing them would silently fit new observations with
    the stale structure."""
    rng = np.random.default_rng(11)

    def obs_for(k):
        z = 0.35 + _zarc(FREQ, 1.0 + 0.1 * k, 10 ** (-2 + 0.3 * k))
        return FREQ, z + (rng.normal(size=len(FREQ))
                          + 1j * rng.normal(size=len(FREQ))) * 1e-3

    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    for k in range(3):
        md.add_observation([float(k)], None, obs_for(k))
    md.fit_all(batched=True)
    assert len(md._fitter_cache) == 1
    fitter_before = next(iter(md._fitter_cache.values()))
    assert not fitter_before.template.fit_dop

    md.fit_dop = True
    md.add_observation([3.0], None, obs_for(3))
    md.fit_all(batched=True)
    assert md.obs_fit_status.all()
    assert len(md._fitter_cache) == 2
    fitter_after = [f for f in md._fitter_cache.values()
                    if f is not fitter_before][0]
    assert fitter_after.template.fit_dop


def test_uncacheable_fitter_keys_not_retained():
    """Cache keys flagged _UNCACHEABLE (non-primitive fit kwargs) build a
    fresh fitter and must NOT be stored — inserting them would retain one
    unreachable fitter per fit_all call."""
    from hybdrt_tpu.mapping.drtmd import _UNCACHEABLE

    md = DRTMD(TAU_SUPER, warn=False, print_progress=False,
               batch_fit_kw={"pred_rtol": np.array(1e-2)})
    # array-valued kwargs are not hashable -> signature opts out of caching
    assert md._batch_kw_sig() is _UNCACHEABLE

    built = []
    f1 = md._cached_fitter(("eis", md._batch_kw_sig()),
                           lambda: built.append(1) or object())
    f2 = md._cached_fitter(("eis", md._batch_kw_sig()),
                           lambda: built.append(1) or object())
    assert f1 is not f2 and len(built) == 2
    assert not getattr(md, "_fitter_cache", {})


def test_batched_pfrt_rebuild_ignores_incompatible_batch_fitter():
    """get_fit/covariance for a batched-pfrt observation must not trust
    self._batch_fitter: a later hybrid fit_all can leave a hybrid fitter
    there whose template has hybrid-shaped matrices (a frequency-grid check
    alone would accept it). The rebuild falls back to a cached EIS fitter."""
    from hybdrt_tpu import DRTMD

    def sim_eis(tau0, seed):
        rng = np.random.default_rng(seed)
        f = np.logspace(5, -1, 31)
        w = 2j * np.pi * f
        z = 0.4 + 1.5 / (1 + (w * tau0) ** 0.9)
        return f, z + rng.normal(0, 1e-4, 31) + 1j * rng.normal(0, 1e-4, 31)

    factors = np.logspace(-0.5, 0.5, 3)
    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               fit_type="pfrt", pfrt_factors=factors,
               print_progress=False, warn=False)
    for i, t0 in enumerate([1e-3, 3e-3]):
        md.add_observation([700 + 25 * i], None, sim_eis(t0, i))
    md.fit_all(batched=True)
    drt_ref = md.get_fit(0)
    cov_ref = drt_ref.estimate_param_cov(
        p_matrix=drt_ref.pfrt_result["step_p_mat"][1])

    class _FakeHybridFitter:
        frequencies = np.logspace(5, -1, 31)  # passes a frequency-only check

    md._batch_fitter = _FakeHybridFitter()
    md._batch_fitters.pop("pfrt", None)
    md._fitter_cache.clear()
    drt_b = md.get_fit(0)
    cov_b = drt_b.estimate_param_cov(
        p_matrix=drt_b.pfrt_result["step_p_mat"][1])
    scale = np.max(np.abs(np.diag(cov_ref)))
    assert np.allclose(cov_b, cov_ref, atol=1e-6 * scale)


def test_reload_rebuild_honors_batch_fit_kw(tmp_path):
    """batch_fit_kw hyper overrides shape the template hypers and hence the
    rebuilt P matrix: they must survive save/load (now in _persist_attrs)
    and be forwarded by the reload fallbacks in _rebuild_batched_fit /
    _rebuild_ragged_fit. Previously a reloaded map rebuilt covariance under
    DEFAULT hypers."""
    kw = {"l2_lambda_0": 1e-2}  # non-default; enters hypers -> calculate_pq
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False, batch_fit_kw=kw)
    for p, z in zip(PSIS[:3], _make_map_data()[:3]):
        md.add_observation([p], None, (FREQ, z), group_id="g1")
    md.fit_all(batched=True)
    cov0 = md.get_fit(0).estimate_param_cov()

    dest = tmp_path / "md_kw.pkl"
    md.save_attributes(dest)
    md2 = DRTMD.from_source(str(dest))
    assert md2.batch_fit_kw == kw
    cov1 = md2.get_fit(0).estimate_param_cov()
    scale = np.max(np.abs(np.diag(cov0)))
    assert np.allclose(cov1, cov0, atol=1e-8 * scale)

    # Without the override the rebuilt P (and covariance) must differ --
    # proves the knob actually flows through the rebuild path
    md2.batch_fit_kw = {}
    md2._fitter_cache = {}
    md2._batch_fitters = {}
    md2._batch_fitter = None
    cov_default = md2.get_fit(0).estimate_param_cov()
    assert not np.allclose(cov_default, cov0, atol=1e-8 * scale)


def test_estimate_obs_drt_var_group_matches_per_obs():
    """The vectorized group path (_estimate_drt_var_group: one vmapped
    P-rebuild + inverse + basis transform for all uniform-batched obs)
    must reproduce the per-observation path (get_fit ->
    estimate_distribution_cov) exactly."""
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    for p, z in zip(PSIS[:4], _make_map_data()[:4]):
        md.add_observation([p], None, (FREQ, z), group_id="g1")
    md.fit_all(batched=True)
    md.estimate_obs_drt_var()  # 4 obs share one protocol -> group path
    var_fast = md.obs_drt_var[:4].copy()
    assert np.all(np.isfinite(var_fast)) and np.any(var_fast > 0)
    for i in range(4):
        cov = md.get_fit(i).estimate_distribution_cov(
            tau=md.tau_supergrid, extend_var=True)
        slow = np.diag(cov)
        scale = np.max(slow)
        assert np.allclose(var_fast[i], slow, rtol=1e-6, atol=1e-10 * scale)
