"""Ragged-observation batching: heterogeneous grids/protocols/windows padded
and masked into one vmapped fit must match the serial per-observation fits
(reference fits these serially: hybdrt/mapping/drtmd.py:245-319)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hybdrt_tpu
from hybdrt_tpu.parallel.ragged import BatchedRaggedFitter
from hybdrt_tpu.parallel.sharding import make_mesh

TAU_SG = np.logspace(-8, 3, 111)  # 10 ppd supergrid


def _zarc(f, r, tau0, a):
    return r / (1 + (2j * np.pi * f * tau0) ** a)


def _rc_v(t, ts, amp, r, tau0):
    dt = t - ts
    return amp * r * np.where(dt > 0, 1 - np.exp(-np.maximum(dt, 0) / tau0), 0.0)


def _eis_obs(f, rng, tau1=1e-2, tau2=1e-1):
    z = 0.4 + _zarc(f, 1.0, tau1, 0.85) + _zarc(f, 1.5, tau2, 0.9)
    return z + 0.004 * rng.normal(size=len(f)) + 4e-3j * rng.normal(size=len(f))


def _hybrid_obs(times, st, amp, f, rng):
    r1, tau1, r2, tau2 = 1.0, 1e-2, 1.5, 1e-4
    i_sig = np.where(times >= st, amp, 0.0)
    v = (0.4 * i_sig + _rc_v(times, st, amp, r1, tau1)
         + _rc_v(times, st, amp, r2, tau2))
    v = v + 5e-4 * rng.normal(size=len(times))
    z = 0.4 + _zarc(f, r1, tau1, 0.99) + _zarc(f, r2, tau2, 0.99)
    z = z + 0.003 * rng.normal(size=len(f)) + 3e-3j * rng.normal(size=len(f))
    return (times, i_sig, v), (f, z)


def _serial_rel_err(res, k, drt):
    xs = drt.fit_parameters["x"]
    li, ri = res.tau_indices[k]
    assert ri - li == len(xs)
    return np.max(np.abs(res.x[k][:ri - li] - xs)) / max(1e-12, np.max(np.abs(xs)))


def test_penalty_matrices_translation_invariant():
    """The shared penalty stack is valid for every window: on the log-uniform
    supergrid, a narrower window's penalty matrix is a leading slice of the
    widest window's Toeplitz matrix."""
    from hybdrt_tpu.ops import mat1d
    eps = 1 / np.mean(np.diff(np.log(TAU_SG)))
    wide = np.log(TAU_SG[2:104])
    narrow = np.log(TAU_SG[22:74])
    for order in range(3):
        m_wide = np.asarray(mat1d.construct_integrated_derivative_matrix(
            wide, order=order, epsilon=eps))
        m_narrow = np.asarray(mat1d.construct_integrated_derivative_matrix(
            narrow, order=order, epsilon=eps))
        assert np.allclose(m_wide[:52, :52], m_narrow, rtol=1e-9, atol=1e-12)


def test_ragged_eis_matches_serial():
    """Three EIS observations with different frequency grids AND different
    basis-window widths, fitted as one masked batch, match serial fits."""
    rng = np.random.default_rng(0)
    grids = [np.logspace(5, -1, 57), np.logspace(3, 0, 31), np.logspace(6, -2, 81)]
    obs = [(None, (f, _eis_obs(f, rng))) for f in grids]

    fitter = BatchedRaggedFitter(TAU_SG)
    res = fitter.fit(obs)
    widths = [r - l for l, r in res.tau_indices]
    assert len(set(widths)) > 1  # genuinely ragged windows

    for k, (_, (f, z)) in enumerate(obs):
        drt = hybdrt_tpu.DRT(tau_supergrid=TAU_SG, warn=False)
        drt.fit_eis(f, z)
        rel = _serial_rel_err(res, k, drt)
        assert rel < 1e-6, (k, rel)
        assert abs(res.r_inf[k] - drt.fit_parameters["R_inf"]) < 1e-6
        assert res.n_iter[k] == drt.qphb_params["n_iter"]
        # padded tail of the coefficient block is exactly zero
        li, ri = res.tau_indices[k]
        assert np.all(res.x[k][ri - li:] == 0.0)


def test_ragged_hybrid_matches_serial():
    """Two hybrid observations with different time grids, step amplitudes, and
    frequency grids match serial fit_hybrid."""
    rng = np.random.default_rng(1)
    protos = [
        (np.concatenate([np.linspace(-0.05, -0.001, 10),
                         np.geomspace(1e-4, 1.0, 80)]), 0.0, 0.1,
         np.logspace(5, 1, 33)),
        (np.concatenate([np.linspace(-0.02, -0.001, 6),
                         np.geomspace(2e-4, 0.5, 60)]), 0.0, -0.08,
         np.logspace(4, 0, 41)),
    ]
    obs = [_hybrid_obs(t, st, amp, f, rng) for (t, st, amp, f) in protos]

    fitter = BatchedRaggedFitter(TAU_SG)
    res = fitter.fit(obs)
    for k, ((times, i_sig, v), (f, z)) in enumerate(obs):
        drt = hybdrt_tpu.DRT(tau_supergrid=TAU_SG, warn=False)
        drt.fit_hybrid(times, i_sig, v, f, z)
        rel = _serial_rel_err(res, k, drt)
        assert rel < 1e-6, (k, rel)
        assert res.n_iter[k] == drt.qphb_params["n_iter"]


def test_drtmd_mixed_types_and_grids_batched():
    """DRTMD.fit_all(batched=True) accepts a map with mixed observation types
    (EIS-only + hybrid) and per-observation grids, and matches serial fits."""
    from hybdrt_tpu.mapping import DRTMD
    rng = np.random.default_rng(2)

    eis_grids = [np.logspace(5, -1, 45), np.logspace(4, 0, 37)]
    eis_obs = [(None, (f, _eis_obs(f, rng))) for f in eis_grids]
    hyb = [_hybrid_obs(np.concatenate([np.linspace(-0.05, -0.001, 8),
                                       np.geomspace(1e-4, 0.8, 70)]),
                       0.0, 0.1, np.logspace(5, 1, 29), rng),
           _hybrid_obs(np.concatenate([np.linspace(-0.03, -0.001, 6),
                                       np.geomspace(2e-4, 0.4, 55)]),
                       0.0, -0.06, np.logspace(4, 0, 35), rng)]
    all_obs = eis_obs + hyb

    md = DRTMD(TAU_SG, psi_dim_names=["a"], print_progress=False)
    md_serial = DRTMD(TAU_SG, psi_dim_names=["a"], print_progress=False)
    for k, (c, e) in enumerate(all_obs):
        md.add_observation([float(k)], c, e)
        md_serial.add_observation([float(k)], c, e)

    md.fit_all(batched=True)
    md_serial.fit_all()

    assert md.obs_fit_status.all()
    # Tolerance note: padding changes XLA reduction orders at the last ulp,
    # and for spectra with a coefficient sitting on the QP active-set
    # classification knife-edge such a seed can flip one activation and shift
    # the outer-loop trajectory by up to the convergence-tolerance scale
    # (both trajectories are equally valid solver runs). Iterate parity is
    # therefore asserted at the xtol scale here plus a solution-QUALITY
    # equivalence (log-likelihoods agree); the strict <1e-6 machinery parity
    # is established on non-knife-edge spectra by the tests above.
    for k in range(len(all_obs)):
        assert md.obs_tau_indices[k] == md_serial.obs_tau_indices[k]
        denom = max(1e-12, np.max(np.abs(md_serial.obs_x[k])))
        rel = np.max(np.abs(md.obs_x[k] - md_serial.obs_x[k])) / denom
        assert rel < 2e-2, (k, rel)
        assert abs(md.obs_special["R_inf"][k]
                   - md_serial.obs_special["R_inf"][k]) < 1e-3
        assert abs(md.obs_llh[k] - md_serial.obs_llh[k]) \
            < 0.5 + 1e-3 * abs(md_serial.obs_llh[k]), k
    assert np.all(np.isfinite(md.obs_llh[:len(all_obs)]))
    assert np.all(md.obs_rss[:len(all_obs)] >= 0)

    # get_fit reconstructs a usable DRT for a ragged observation
    drt0 = md.get_fit(0)
    f0, z0 = all_obs[0][1]
    z_hat = drt0.predict_z(f0)
    assert np.median(np.abs(z_hat - z0) / np.abs(z0)) < 0.05
    cov = drt0.estimate_param_cov()
    assert cov is not None and np.all(np.isfinite(np.diag(cov)))


def test_ragged_multidevice_mesh():
    """Ragged batch sharded over the 8-device CPU mesh matches the unsharded
    result."""
    rng = np.random.default_rng(3)
    grids = [np.logspace(5, -1, 41), np.logspace(4, 0, 33),
             np.logspace(5, 0, 37), np.logspace(3, -1, 29),
             np.logspace(6, -1, 51)]
    obs = [(None, (f, _eis_obs(f, rng))) for f in grids]

    plain = BatchedRaggedFitter(TAU_SG, max_iter=12)
    res_plain = plain.fit(obs)

    mesh = make_mesh(jax.devices("cpu"))
    sharded = BatchedRaggedFitter(TAU_SG, max_iter=12, mesh=mesh)
    res_mesh = sharded.fit(obs)

    assert res_mesh.x.shape[0] == len(obs)
    for k in range(len(obs)):
        assert np.allclose(res_mesh.x[k], res_plain.x[k], rtol=1e-8, atol=1e-10)
        assert res_mesh.tau_indices[k] == res_plain.tau_indices[k]


def test_prep_assembly_cached_across_shared_grids(monkeypatch):
    """Observations sharing a measurement protocol assemble matrices once:
    the per-grid DRT instances' assembly caches make _prep_obs skip
    impedance/penalty/vmm construction after the first hit (the 10x host
    bottleneck of the ragged path)."""
    from hybdrt_tpu.ops import mat1d
    from hybdrt_tpu.parallel.ragged import BatchedRaggedFitter

    calls = {"zm": 0}
    orig = mat1d.construct_impedance_matrix

    def counting(*a, **k):
        calls["zm"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(mat1d, "construct_impedance_matrix", counting)

    rng = np.random.default_rng(0)
    grids = [np.logspace(5, -1, 31), np.logspace(4, -2, 25)]
    obs = []
    for k in range(6):
        f = grids[k % 2]
        z = 0.4 + 1.2 / (1 + (2j * np.pi * f * 10 ** (-2 + 0.2 * k)) ** 0.9)
        z = z + rng.normal(0, 1e-3, len(f)) + 1j * rng.normal(0, 1e-3, len(f))
        obs.append(((None, None, None), (f, z)))

    fitter = BatchedRaggedFitter(TAU_SG, max_iter=8)
    calls["zm"] = 0  # ignore template-construction calls
    fitter.prepare(obs)
    # 2 unique grids x (real + imag) = 4 assemblies for 6 observations
    assert calls["zm"] == 4

    # A second prepare on the same protocols assembles nothing
    calls["zm"] = 0
    fitter.prepare(obs)
    assert calls["zm"] == 0

    # And the jitted batch entry point is built once and reused
    res1 = fitter.fit(obs)
    f1 = fitter._fit_batch_jit
    res2 = fitter.fit(obs)
    assert fitter._fit_batch_jit is f1  # same config -> cached entry point
    assert np.allclose(res1.x, res2.x)


def test_ragged_hybrid_weight_factors_match_serial():
    """Explicit eis/chrono weight factors and method='rp' reach the ragged
    fitter (review regression: they were silently replaced by 1.0)."""
    from hybdrt_tpu import DRT
    from hybdrt_tpu.parallel.ragged import BatchedRaggedFitter

    rng = np.random.default_rng(3)
    times = np.concatenate([np.linspace(-0.005, -0.0005, 8),
                            np.logspace(-5, 0, 50)])
    i_sig = np.where(times >= 0, 0.1, 0.0)
    freq = np.logspace(5, -1, 25)
    w = 2j * np.pi * freq
    tau0, r0 = 3e-3, 1.5
    v = 0.3 * i_sig + 0.1 * r0 * (1 - np.exp(-np.maximum(times, 0) / tau0)) \
        * (times >= 0) + rng.normal(0, 2e-4, len(times))
    z = 0.3 + r0 / (1 + w * tau0) \
        + rng.normal(0, 1e-3, 25) + 1j * rng.normal(0, 1e-3, 25)
    obs = [((times, i_sig, v), (freq, z))]

    for kw in ({"eis_weight_factor": 2.0, "chrono_weight_factor": 0.5},
               {"hybrid_weight_factor_method": "rp"}):
        drt = DRT(warn=False, tau_supergrid=TAU_SG)
        drt.fit_hybrid(times, i_sig, v, freq, z, **kw)
        fitter = BatchedRaggedFitter(TAU_SG, fit_kw=dict(kw))
        res = fitter.fit(obs)
        x_serial = drt.fit_parameters["x"]
        assert np.allclose(res.x[0][:len(x_serial)], x_serial,
                           rtol=1e-5, atol=1e-8), f"mismatch for {kw}"


def test_pred_stop_rms_ignores_padded_rows():
    """pred_stop's settled check averages over REAL rows only: a short
    observation padded alongside a much longer one must stop at the same
    iteration (and the same iterate) as when it is fitted alone — zero
    padded rows in a plain mean would dilute the RMS and loosen the stop
    tolerance by sqrt(real/padded)."""
    rng = np.random.default_rng(5)
    f_short = np.logspace(4, 0, 17)
    f_long = np.logspace(6, -2, 81)
    obs_short = ((None, None, None), (f_short, _eis_obs(f_short, rng)))
    obs_long = ((None, None, None), (f_long, _eis_obs(f_long, rng)))

    kw = dict(dtype=jnp.float64, max_iter=30, pred_stop=True, pred_rtol=5e-2,
              batch_bucket=False)
    solo = BatchedRaggedFitter(TAU_SG, **kw).fit([obs_short])
    both = BatchedRaggedFitter(TAU_SG, **kw).fit([obs_short, obs_long])

    assert int(both.n_iter[0]) == int(solo.n_iter[0])
    li, ri = solo.tau_indices[0]
    n = ri - li
    assert np.allclose(both.x[0][:n], solo.x[0][:n], rtol=1e-8, atol=1e-10)


def _hybrid_obs_shared_protocol(times, st, amp, f, rng, r1):
    """Hybrid observations sharing ONE measurement protocol (identical
    times, input signal, and frequency grid): only the sample physics (r1)
    and the measured response/impedance noise vary per observation."""
    tau1, r2, tau2 = 1e-2, 1.5, 1e-4
    i_sig = np.where(times >= st, amp, 0.0)
    v = (0.4 * i_sig + _rc_v(times, st, amp, r1, tau1)
         + _rc_v(times, st, amp, r2, tau2))
    v = v + 5e-4 * rng.normal(size=len(times))
    z = 0.4 + _zarc(f, r1, tau1, 0.99) + _zarc(f, r2, tau2, 0.99)
    z = z + 0.003 * rng.normal(size=len(f)) + 3e-3j * rng.normal(size=len(f))
    return (times, i_sig, v), (f, z)


def test_hybrid_fast_path_matches_serial_prep():
    """Hybrid observations sharing a measurement protocol (times, input
    signal, frequency grid) skip the serial prep after the first: the
    cached-template rescale (_hybrid_rescale) must reproduce the serial
    prep's system exactly — including the antialiased downsample path and
    rp-method host weight factors."""
    rng = np.random.default_rng(7)
    times = np.concatenate([np.linspace(-0.05, -0.001, 10),
                            np.logspace(-5, 0.0, 120)])
    freq = np.logspace(5, -1, 31)
    obs = [_hybrid_obs_shared_protocol(times, 0.0, 1.0, freq, rng, r1)
           for r1 in (0.8, 1.3, 0.5)]

    for fit_kw in ({}, {"downsample": True,
                        "downsample_kw": {"prestep_samples": 5},
                        "hybrid_weight_factor_method": "rp"}):
        fitter = BatchedRaggedFitter(TAU_SG, fit_kw=fit_kw)
        # Obs 0 populates the protocol template; obs 1/2 take the fast path
        systems = [fitter._prep_obs(c, e) for (c, e) in obs]
        assert "fp_sample_index" in systems[0]  # template registered

        for k in (1, 2):
            slow = BatchedRaggedFitter(TAU_SG, fit_kw=fit_kw)._prep_obs(
                *obs[k])
            fast = systems[k]
            for key in ("coefficient_scale", "impedance_scale",
                        "response_signal_scale", "scaled_response_offset"):
                assert np.allclose(fast[key], slow[key], rtol=1e-12), key
            assert np.allclose(fast["rzv"], slow["rzv"], rtol=0, atol=1e-14)
            for key in ("host_eis_wf", "host_chrono_wf"):
                if slow[key] is None:
                    assert fast[key] is None
                else:
                    assert np.allclose(fast[key], slow[key], rtol=1e-12)
            # Shared structure is reused by reference, not rebuilt
            assert fast["rzm"] is systems[0]["rzm"]


@pytest.mark.parametrize("fit_kw", [
    {},
    {"downsample": True, "downsample_kw": {"prestep_samples": 5},
     "hybrid_weight_factor_method": "rp"},
])
def test_batched_prep_matches_per_obs(fit_kw):
    """prepare() groups observations whose protocol template is cached into
    ONE vectorized rescale per protocol (_hybrid_rescale_batch /
    _eis_rescale_batch, filter_chrono_signal_batch, estimate_rp_batch); the
    resulting device batch must equal the per-observation fast-path build
    row for row."""
    rng = np.random.default_rng(11)
    times = np.concatenate([np.linspace(-0.05, -0.001, 10),
                            np.logspace(-5, 0.0, 120)])
    times2 = np.concatenate([np.linspace(-0.02, -0.001, 8),
                             np.logspace(-4.5, -0.3, 90)])
    freq = np.logspace(5, -1, 31)
    freq2 = np.logspace(4, 0, 25)
    hyb_obs = [_hybrid_obs_shared_protocol((times, times2)[k % 2], 0.0, 1.0,
                                           freq, rng, r1)
               for k, r1 in enumerate((0.8, 1.3, 0.5, 1.1, 0.9, 1.2))]
    eis_obs = [(None, ((freq, freq2)[k % 2],
                       _eis_obs((freq, freq2)[k % 2], rng)))
               for k in range(6)]

    for kind_obs, kw in ((hyb_obs, fit_kw), (eis_obs, {})):
        fast = BatchedRaggedFitter(TAU_SG, fit_kw=kw)
        batch_fast = fast.prepare(kind_obs)
        # same grouping state
        assert len(fast._first_of_proto) == 2

        slow = BatchedRaggedFitter(TAU_SG, fit_kw=kw)
        slow._prep_systems = lambda observations: [
            slow._prep_obs(c, e) for (c, e) in observations]
        batch_slow = slow.prepare(kind_obs)

        for key in batch_fast:
            assert np.array_equal(batch_fast[key], batch_slow[key],
                                  equal_nan=True), key
        assert np.array_equal(fast._scales, slow._scales)
        assert fast._tau_indices == slow._tau_indices
        assert np.array_equal(fast._proto_index, slow._proto_index)
        for key in fast._uniq:
            assert np.array_equal(fast._uniq[key], slow._uniq[key]), key


def test_hybrid_fast_path_end_to_end_matches_serial():
    """Full ragged fit over shared-protocol hybrid observations (fast-path
    prep) matches serial fit_hybrid coefficients."""
    rng = np.random.default_rng(3)
    times = np.concatenate([np.linspace(-0.05, -0.001, 10),
                            np.logspace(-5, 0.0, 120)])
    freq = np.logspace(5, -1, 31)
    obs = [_hybrid_obs_shared_protocol(times, 0.0, 1.0, freq, rng, r1)
           for r1 in (0.8, 1.2)]
    fitter = BatchedRaggedFitter(TAU_SG)
    systems = [fitter._prep_obs(c, e) for (c, e) in obs]
    assert systems[1]["rzm"] is systems[0]["rzm"]  # obs 1 took the fast path
    fitter = BatchedRaggedFitter(TAU_SG)
    res = fitter.fit(obs)
    for k, (chrono, eis) in enumerate(obs):
        drt = hybdrt_tpu.DRT(tau_supergrid=TAU_SG, warn=False)
        drt.fit_hybrid(*chrono, *eis)
        assert _serial_rel_err(res, k, drt) < 1e-5


@pytest.mark.parametrize("pred_stop", [False, True])
def test_ragged_staged_matches_plain(pred_stop):
    """Single-dispatch staged compaction on the RAGGED fitter: gathering the
    per-lane systems (design/variance/penalty stacks, masks, bounds) along
    with the solver state and continuing at reduced static width must
    reproduce the uninterrupted trajectory lane-for-lane (capacity overflow
    exercised: caps (2, 1) on a 4-lane batch force the full-width safety net
    to finish real lanes). With pred_stop the settled check's prediction
    history is gathered/scattered alongside the solver state, so each lane
    stops on the SAME iteration as the uninterrupted run."""
    rng = np.random.default_rng(7)
    grids = [np.logspace(5, -1, 57), np.logspace(3, 0, 31),
             np.logspace(6, -2, 81), np.logspace(4, -1, 45)]
    obs = [(None, (f, _eis_obs(f, rng, tau1=10 ** rng.uniform(-3, -2))))
           for f in grids]

    fitter = BatchedRaggedFitter(TAU_SG, batch_bucket=False,
                                 pred_stop=pred_stop, pred_rtol=3e-2)
    r_plain = fitter.fit(obs)
    r_staged = fitter.fit(obs, adaptive="staged", phase_budgets=(6, 12),
                          staged_capacities=(2, 1))
    # Stage widths change XLA's reduction tiling -> ulp-level differences
    # only (same caveat as the shared-grid staged test); iteration counts
    # and convergence flags must match exactly.
    assert np.allclose(r_plain.x, r_staged.x, rtol=1e-9, atol=1e-11)
    assert np.array_equal(r_plain.n_iter, r_staged.n_iter)
    assert np.array_equal(r_plain.converged, r_staged.converged)
    assert np.allclose(r_plain.r_inf, r_staged.r_inf, rtol=1e-9, atol=1e-12)


def test_ragged_staged_buckets_match_plain():
    """Difficulty-ordered lane bucketing on the RAGGED staged scheduler
    (staged_buckets>1, the parallel/batch.py straggler fix applied to
    heterogeneous maps): splitting a stage's gathered lanes into
    easiest-first sub-dispatches only changes WHICH vmapped continuation a
    lane runs in — per-lane systems travel with the lane, so results must
    match the uninterrupted loop lane-for-lane. 16 lanes with cap 16
    exercises the multi-bucket branch (below 2*max(n_dev, 8) lanes the
    scheduler falls back to one bucket)."""
    rng = np.random.default_rng(5)
    grids = [np.logspace(5, -1, 57), np.logspace(3, 0, 31),
             np.logspace(6, -2, 81), np.logspace(4, -1, 45)]
    obs = [(None, (grids[i % 4],
                   _eis_obs(grids[i % 4], rng,
                            tau1=10 ** rng.uniform(-3, -2))))
           for i in range(16)]

    fitter = BatchedRaggedFitter(TAU_SG, batch_bucket=False,
                                 pred_stop=True, pred_rtol=3e-2)
    r_plain = fitter.fit(obs)
    r_b = fitter.fit(obs, adaptive="staged", phase_budgets=(6,),
                     staged_capacities=(16,), staged_buckets=2)
    assert np.allclose(r_plain.x, r_b.x, rtol=1e-9, atol=1e-11)
    assert np.array_equal(r_plain.n_iter, r_b.n_iter)
    assert np.array_equal(r_plain.converged, r_b.converged)


@pytest.mark.parametrize("pred_stop", [False, True])
def test_ragged_hybrid_staged_matches_plain(pred_stop):
    """Staged compaction on ragged HYBRID lanes: the continuation must
    reconstruct each lane's in-loop vz-offset column from the resumed
    iterate using the per-lane vz_sign (+1 chrono rows, -1 EIS rows), so
    the staged trajectory matches the uninterrupted loop exactly — with
    pred_stop, including the prediction history carried through the
    compaction gather."""
    rng = np.random.default_rng(3)
    protos = [
        (np.concatenate([np.linspace(-0.05, -0.001, 10),
                         np.geomspace(1e-4, 1.0, 80)]), 0.0, 0.1,
         np.logspace(5, 1, 33)),
        (np.concatenate([np.linspace(-0.02, -0.001, 6),
                         np.geomspace(2e-4, 0.5, 60)]), 0.0, -0.08,
         np.logspace(4, 0, 41)),
    ]
    obs = [_hybrid_obs(t, st, amp, f, rng) for (t, st, amp, f) in protos]

    fitter = BatchedRaggedFitter(TAU_SG, batch_bucket=False,
                                 pred_stop=pred_stop, pred_rtol=3e-2)
    r_plain = fitter.fit(obs)
    r_staged = fitter.fit(obs, adaptive=True, phase_budgets=(5,),
                          staged_capacities=(1,))
    assert np.allclose(r_plain.x, r_staged.x, rtol=1e-9, atol=1e-11)
    assert np.array_equal(r_plain.n_iter, r_staged.n_iter)
    assert np.array_equal(r_plain.converged, r_staged.converged)

def test_ragged_scheduling_kwargs_validated_before_prepare():
    """fit() must reject a bad adaptive mode / non-ascending phase_budgets
    BEFORE running prepare() + device transfer (advisor round 3): feed
    observations whose prepare would itself fail, so reaching prepare at all
    fails the test with the wrong exception type."""
    fitter = BatchedRaggedFitter(TAU_SG, batch_bucket=False)
    bad_obs = object()  # prepare() would raise TypeError on this
    with pytest.raises(ValueError, match="adaptive="):
        fitter.fit(bad_obs, adaptive="nope")
    with pytest.raises(ValueError, match="ascending"):
        fitter.fit(bad_obs, adaptive="staged", phase_budgets=(12, 6))
    with pytest.raises(ValueError, match="return_history"):
        fitter.fit(bad_obs, adaptive="staged", return_history=True)
