"""Grouped (P, q) rebuild parity: DRTMD.get_fits_batched must return the
same lightweight fits as per-observation get_fit for uniform-batched
observations, while falling back to get_fit for serial/ragged attrs.

The grouped path exists because the resolve path needs every observation's
rebuilt (P, q) up front, and rebuilding per observation costs one tunneled
device dispatch each (reference analog: the per-obs loop feeding
/root/reference/hybdrt/mapping/drtmd.py:486-560 resolve batches)."""
import numpy as np
import pytest

from hybdrt_tpu.mapping.drtmd import DRTMD

FREQ = np.logspace(5, -1, 41)
TAU_SUPER = np.logspace(-7, 2, 71)


def _zarc(f, r, tau0, a=0.9):
    return r / (1 + (2j * np.pi * f * tau0) ** a)


def _spectra(n, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n):
        z = 0.4 + _zarc(FREQ, 1.0 + 0.1 * k, 10 ** (-3 + 0.2 * k))
        z = z + (rng.normal(size=len(FREQ))
                 + 1j * rng.normal(size=len(FREQ))) * 0.002
        out.append(z)
    return out


@pytest.fixture(scope="module")
def batched_md():
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    for k, z in enumerate(_spectra(6)):
        md.add_observation([float(k)], None, (FREQ, z), group_id="g")
    md.fit_all(batched=True)
    return md


def test_grouped_pq_matches_per_obs(batched_md):
    md = batched_md
    idx = np.arange(md.num_obs)
    grouped = md.get_fits_batched(idx)
    assert set(grouped) == set(idx)
    for i in idx:
        one = md.get_fit(i)
        np.testing.assert_allclose(grouped[i].fit_parameters["p_matrix"],
                                   one.fit_parameters["p_matrix"],
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(grouped[i].fit_parameters["q_vector"],
                                   one.fit_parameters["q_vector"],
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(grouped[i].fit_parameters["x"],
                                   one.fit_parameters["x"],
                                   rtol=1e-9, atol=1e-11)


def test_grouped_falls_back_for_serial_fit():
    # Own instance: the serial refit replaces obs 2's whole per-obs state
    # (x, tau window, attr), which must not leak into the shared fixture
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    for k, z in enumerate(_spectra(3, seed=7)):
        md.add_observation([float(k)], None, (FREQ, z), group_id="g")
    md.fit_all(batched=True)
    # Refit one observation serially; the group rebuild must route it
    # through get_fit rather than the uniform vmapped path
    md.fit_observation(2)
    assert not (isinstance(md.obs_fit_attr[2], dict)
                and md.obs_fit_attr[2].get("batched"))
    grouped = md.get_fits_batched(np.arange(md.num_obs))
    one = md.get_fit(2)
    np.testing.assert_allclose(grouped[2].fit_parameters["x"],
                               one.fit_parameters["x"],
                               rtol=1e-9, atol=1e-11)

    # A failed obs (status cleared, stale batched attr left behind, as
    # _batched_obs_failure does) must raise like get_fit — not be silently
    # rebuilt from the pre-failure state
    md.obs_fit_status[1] = False
    with pytest.raises(ValueError):
        md.get_fits_batched([1])
    md.obs_drt_var[1][:] = 0.0
    with pytest.raises(ValueError):
        md.estimate_obs_drt_var(obs_index=[1], refresh=True)


def test_rebuild_survives_fitter_overwrite():
    """A second fit_all on a DIFFERENT frequency grid overwrites the
    registered per-key fitter; rebuilding an old observation's (P, q) must
    detect the grid mismatch and use that observation's own design matrices
    (previously it silently used whichever fitter was registered last)."""
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    for k, z in enumerate(_spectra(3, seed=5)):
        md.add_observation([float(k)], None, (FREQ, z), group_id="a")
    md.fit_all(batched=True)
    p_before = {i: md.get_fit(i).fit_parameters["p_matrix"].copy()
                for i in range(3)}

    # Same number of points, different frequency values: a silent mismatch
    # would produce wrong (P, q) rather than a shape error
    freq2 = np.logspace(4, -2, len(FREQ))
    rng = np.random.default_rng(11)
    for k in range(3):
        z = 0.4 + _zarc(freq2, 1.2, 10 ** (-2 + 0.1 * k))
        z = z + (rng.normal(size=len(freq2))
                 + 1j * rng.normal(size=len(freq2))) * 0.002
        md.add_observation([10.0 + k], None, (freq2, z), group_id="b")
    md.fit_all(batched=True)

    for i in range(3):
        np.testing.assert_allclose(md.get_fit(i).fit_parameters["p_matrix"],
                                   p_before[i], rtol=1e-9, atol=1e-11)
    grouped = md.get_fits_batched(np.arange(6))
    for i in range(6):
        one = md.get_fit(i)
        np.testing.assert_allclose(grouped[i].fit_parameters["p_matrix"],
                                   one.fit_parameters["p_matrix"],
                                   rtol=1e-9, atol=1e-11)


def test_resolve_uses_grouped_rebuild(batched_md):
    md = batched_md
    md.resolve_group("g", batch_size=4, overlap=1, batched=True)
    x_b = md.obs_x_resolved.copy()
    md.resolve_group("g", batch_size=4, overlap=1, batched=False)
    x_s = md.obs_x_resolved.copy()
    np.testing.assert_allclose(x_b, x_s, rtol=1e-6, atol=1e-8)


def _rc_v(t, ts, amp, r, tau0):
    dt = t - ts
    return amp * r * np.where(dt > 0, 1 - np.exp(-np.maximum(dt, 0) / tau0),
                              0.0)


def test_ragged_pq_batched_matches_unbatched():
    """Ragged-batched observations' (P, q) rebuild is grouped per protocol
    into one vmapped host-CPU calculate_pq (the per-observation path costs
    one tunneled device dispatch each — it dominated the coupled group
    resolve wall). Must match a direct unbatched calculate_pq on each
    observation's re-assembled system, for mixed-grid EIS AND hybrid
    (vz-offset column) observations."""
    import jax.numpy as jnp
    from hybdrt_tpu.solver import qphb as qphb_mod
    from hybdrt_tpu.models.drt import _hypers_to_pytree

    rng = np.random.default_rng(7)
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False,
               print_progress=False)
    freq2 = np.logspace(4, 0, 31)
    times_protos = [np.concatenate([np.linspace(-0.05, -0.001, 8),
                                    np.geomspace(1e-4, 1.0, 60)]),
                    np.concatenate([np.linspace(-0.02, -0.001, 6),
                                    np.geomspace(2e-4, 0.5, 50)])]
    n_hyb = 0
    for k in range(8):
        r1 = 0.9 + 0.05 * k
        if k % 3 == 2:  # hybrid obs alternating TWO chrono protocols
            times = times_protos[n_hyb % 2]
            n_hyb += 1
            i_sig = np.where(times >= 0.0, 0.1, 0.0)
            v = (0.4 * i_sig + _rc_v(times, 0.0, 0.1, r1, 1e-3)
                 + _rc_v(times, 0.0, 0.1, 1.2, 1e-1))
            v = v + 5e-4 * rng.normal(size=len(times))
            z = 0.4 + _zarc(FREQ, r1, 1e-3, 0.99) + _zarc(FREQ, 1.2, 1e-1,
                                                          0.99)
            z = z + 0.003 * (rng.normal(size=len(FREQ))
                             + 1j * rng.normal(size=len(FREQ)))
            md.add_observation([float(k)], (times, i_sig, v), (FREQ, z),
                               group_id="g")
        else:  # EIS obs alternating between two grids -> ragged batch
            f = (FREQ, freq2)[k % 2]
            z = 0.4 + _zarc(f, r1, 1e-3) + _zarc(f, 1.2, 1e-1)
            z = z + 0.003 * (rng.normal(size=len(f))
                             + 1j * rng.normal(size=len(f)))
            md.add_observation([float(k)], None, (f, z), group_id="g")
    md.fit_all(batched=True)
    assert md.obs_fit_status.all()
    assert all(md.obs_fit_attr[i].get("ragged") for i in range(8))

    grouped = md.get_fits_batched(np.arange(8))

    fitter = md._get_ragged_fitter()
    for i in range(8):
        attr = md.obs_fit_attr[i]
        sys_ = fitter._prep_obs(attr["chrono_data"], attr["eis_data"])
        rzm = np.asarray(sys_["rzm"]).copy()
        if sys_["vz_offset"]:
            nc = sys_["num_chrono"]
            sign = np.ones(rzm.shape[0])
            sign[nc:] = -1.0
            rzm[:, sys_["vz_index"]] = (
                (sys_["rzm_vz"] @ np.asarray(attr["x_raw"])) * sign
                * sys_["vz_strength_vec"])
        p_ref, q_ref = qphb_mod.calculate_pq(
            jnp.asarray(rzm), jnp.asarray(np.asarray(sys_["rzv"],
                                                     dtype=float)),
            jnp.asarray(np.asarray(sys_["m_stack"], dtype=float)),
            _hypers_to_pytree(sys_["hypers"]),
            jnp.asarray(np.asarray(sys_["l1_lambda_vector"], dtype=float)),
            jnp.asarray(np.asarray(attr["rho"], dtype=float)), jnp.ones(3),
            jnp.asarray(np.asarray(attr["s_vectors"], dtype=float)),
            jnp.asarray(np.asarray(attr["weights"], dtype=float)),
            sys_["cfg"])
        np.testing.assert_allclose(grouped[i].fit_parameters["p_matrix"],
                                   np.asarray(p_ref), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(grouped[i].fit_parameters["q_vector"],
                                   np.asarray(q_ref), rtol=1e-9, atol=1e-11)
        # get_fit (single-lane path) agrees too
        one = md.get_fit(i)
        np.testing.assert_allclose(grouped[i].fit_parameters["p_matrix"],
                                   one.fit_parameters["p_matrix"],
                                   rtol=1e-12, atol=1e-14)


def test_resolve_batched_falls_back_per_window(batched_md, monkeypatch):
    """If the all-windows vmapped dense resolve fails (the compile service
    OOM-kills that program on tunneled-chip setups), resolve_group must warn
    and fall back to per-window solves with identical results."""
    import hybdrt_tpu.mapping.resolve as resolve_mod
    md = batched_md
    md.resolve_group("g", batch_size=4, overlap=1, batched=True)
    x_ok = md.obs_x_resolved.copy()

    def boom(*a, **k):
        raise RuntimeError("compile helper SIGKILL")

    monkeypatch.setattr(resolve_mod, "solve_resolve_batch", boom)
    with pytest.warns(UserWarning, match="falling back to per-window"):
        md.resolve_group("g", batch_size=4, overlap=1, batched=True)
    np.testing.assert_allclose(md.obs_x_resolved, x_ok, rtol=1e-6, atol=1e-8)


def test_resolve_batched_caller_bugs_raise(batched_md, monkeypatch):
    """TypeError/ValueError from the vmapped resolve are caller bugs (bad
    dtype/mesh/shape) and must propagate, not silently degrade to the
    ~100x-slower per-window fallback."""
    import hybdrt_tpu.mapping.resolve as resolve_mod
    md = batched_md

    def bad_kwarg(*a, **k):
        raise TypeError("unsupported dtype object")

    monkeypatch.setattr(resolve_mod, "solve_resolve_batch", bad_kwarg)
    with pytest.raises(TypeError, match="unsupported dtype"):
        md.resolve_group("g", batch_size=4, overlap=1, batched=True)
