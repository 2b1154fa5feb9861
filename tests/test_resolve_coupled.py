"""Whole-group coupled resolve (resolve.solve_coupled_group).

The reference approximates group resolution with overlapping batch_size=7
windows whose solutions are overlap-averaged — a cvxopt size workaround
(reference hybdrt/mapping/drtmd.py:513-545, resolve.py:176-341). The coupled
path solves the full psi-sorted group as ONE box QP, matrix-free. These tests
pin (a) exactness against the materialized dense oracle, (b) that the global
objective is genuinely lower than the window+average scheme's, (c) accuracy
vs known analytic truth on a synthetic map, and (d) mesh parity.
"""
import copy
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter1d

from hybdrt_tpu.mapping import resolve as resolve_mod
from hybdrt_tpu.mapping.drtmd import DRTMD
from hybdrt_tpu.ops.qp import solve_qp_box


# ---------------------------------------------------------------------------
# Solver-level: exactness vs the dense whole-group oracle
# ---------------------------------------------------------------------------
def _synth_system(nr, nc, seed=0, lam=3.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(nr, nc, nc))
    p = np.einsum("bij,bkj->bik", a, a) + 0.5 * np.eye(nc)
    q = rng.normal(size=(nr, nc)) * 2
    lb = np.zeros(nc)
    ly = gaussian_filter1d(np.eye(nr), sigma=1.0, mode="reflect", order=2)
    my = ly.T @ ly
    cmat = np.diag(rng.uniform(0.5, 2.0, nc)) * lam
    return p, q, lb, my, cmat


def _dense_solve(p, q, lb, my, cmat):
    nr, nc = q.shape
    pd = np.kron(my, cmat)
    for i in range(nr):
        pd[i * nc:(i + 1) * nc, i * nc:(i + 1) * nc] += p[i]
    res = solve_qp_box(jnp.asarray(pd), jnp.asarray(q.reshape(-1)),
                       jnp.asarray(np.tile(lb, nr)))
    return np.asarray(res.x).reshape(nr, nc)


def test_coupled_matches_dense_oracle():
    p, q, lb, my, cmat = _synth_system(12, 17)
    x, n_iter, kkt = resolve_mod.solve_coupled_group(p, q, lb, my, cmat)
    xd = _dense_solve(p, q, lb, my, cmat)
    assert kkt < 1e-7
    assert np.max(np.abs(x - xd)) < 1e-8 * max(1.0, np.max(np.abs(xd)))


def test_coupled_matches_dense_oracle_negative_lb():
    # nonneg=False resolve path: lb = -10 with a nonneg special row
    p, q, lb, my, cmat = _synth_system(8, 11, seed=3)
    lb = np.full(11, -10.0)
    lb[0] = 0.0
    x, _, kkt = resolve_mod.solve_coupled_group(p, q, lb, my, cmat)
    xd = _dense_solve(p, q, lb, my, cmat)
    assert kkt < 1e-7
    assert np.max(np.abs(x - xd)) < 1e-8 * max(1.0, np.max(np.abs(xd)))
    assert np.all(x[:, 0] >= -1e-12)


def test_coupled_strong_coupling():
    # Strong psi-coupling stresses the block-Jacobi preconditioner (the
    # neglected off-diagonal stencil terms dominate)
    p, q, lb, my, cmat = _synth_system(16, 9, seed=5, lam=200.0)
    x, _, kkt = resolve_mod.solve_coupled_group(p, q, lb, my, cmat)
    xd = _dense_solve(p, q, lb, my, cmat)
    assert np.max(np.abs(x - xd)) < 1e-7 * max(1.0, np.max(np.abs(xd)))


def test_coupled_mesh_matches_single_device():
    from hybdrt_tpu.parallel.sharding import make_mesh
    p, q, lb, my, cmat = _synth_system(13, 12, seed=7)  # 13 % 8 != 0: pads
    x0, _, _ = resolve_mod.solve_coupled_group(p, q, lb, my, cmat)
    mesh = make_mesh(jax.devices("cpu"))
    xm, _, kkt = resolve_mod.solve_coupled_group(p, q, lb, my, cmat, mesh=mesh)
    assert xm.shape == x0.shape
    assert kkt < 1e-7
    assert np.allclose(xm, x0, atol=1e-8)


# ---------------------------------------------------------------------------
# DRTMD integration: synthetic map with analytic truth
# ---------------------------------------------------------------------------
FREQ = np.logspace(5, -1, 41)
TAU_SUPER = np.logspace(-7, 2, 91)
B = 14
PSIS = np.linspace(0, 1, B)
ALPHA = 0.85
NOISE = 0.004


def _zarc(f, r, tau0, a=ALPHA):
    return r / (1 + (2j * np.pi * f * tau0) ** a)


def _true_gamma(tau, r, tau0, a=ALPHA):
    """Analytic Cole-Cole DRT of a ZARC: integrates to r over ln tau."""
    u = a * np.log(tau / tau0)
    return (r / (2 * np.pi)) * np.sin(np.pi * a) / (np.cosh(u) + np.cos(np.pi * a))


def _map_params(p):
    return 1.0 + 0.5 * p, 10 ** (-3 + 2 * p)  # (R_ct, tau_peak)


@pytest.fixture(scope="module")
def fitted_map():
    rng = np.random.default_rng(8)
    md = DRTMD(TAU_SUPER, psi_dim_names=["T"], warn=False, print_progress=False)
    for p in PSIS:
        r, tau0 = _map_params(p)
        z = 0.4 + _zarc(FREQ, r, tau0)
        z = z + (rng.normal(size=len(FREQ))
                 + 1j * rng.normal(size=len(FREQ))) * NOISE
        md.add_observation([p], None, (FREQ, z), group_id="g")
    md.fit_all(batched=True)
    return md


def _gamma_rmse(md):
    g = md.predict_drt(resolved=True)
    g_true = np.stack([_true_gamma(TAU_SUPER, *_map_params(p)) for p in PSIS])
    return float(np.sqrt(np.mean((g - g_true) ** 2)))


def _global_objective(md, obs_index):
    """Evaluate the TRUE group objective at md's resolved solution."""
    obs_drts = md.get_fits_batched(obs_index)
    drt_list = [obs_drts[i] for i in obs_index]
    ti_list = [md.obs_tau_indices[i] for i in obs_index]
    p, q, lb, my, cmat, meta = resolve_mod.prepare_group_blocks(
        drt_list, ti_list, md.fit_kw.get("nonneg", True))
    special_dict, mti, nr, nc = meta
    # Re-scale the stored (physical-units) solution back to solver units
    coef_scale = np.array([d.coefficient_scale for d in drt_list])
    so = int(np.sum([v.get("size", 1) for v in special_dict.values()]))
    x = np.zeros((nr, nc))
    x[:, so:] = md.obs_x_resolved[obs_index][:, mti[0]:mti[1]] / coef_scale[:, None]
    for key, info in special_dict.items():
        val = md.obs_special_resolved[key][obs_index]
        if key == "x_dop":
            val = val / np.stack([d.dop_scale_vector for d in drt_list])
        start, size = info["index"], info.get("size", 1)
        x[:, start:start + size] = np.atleast_2d(
            val.reshape(nr, size)) / coef_scale[:, None]
    hx = np.einsum("bij,bj->bi", p, x) + (my @ x) @ cmat
    return float(0.5 * np.vdot(x, hx) + np.vdot(q, x))


def test_coupled_resolve_beats_window_average(fitted_map):
    md_win = copy.deepcopy(fitted_map)
    md_cpl = copy.deepcopy(fitted_map)
    obs_index = md_win.get_group_index("g")

    t0 = time.perf_counter()
    md_win.resolve_group("g", psi_sort_dims=["T"], batched=True)
    t_win = time.perf_counter() - t0
    t0 = time.perf_counter()
    md_cpl.resolve_group("g", psi_sort_dims=["T"], coupled=True)
    t_cpl = time.perf_counter() - t0

    assert md_cpl.obs_resolve_status.all()

    # (1) The coupled path reaches a strictly lower value of the group
    # objective the window scheme only approximates
    f_win = _global_objective(md_win, obs_index)
    f_cpl = _global_objective(md_cpl, obs_index)
    assert f_cpl < f_win

    # (2) Accuracy vs analytic truth: at least as good as window-averaging
    rmse_win = _gamma_rmse(md_win)
    rmse_cpl = _gamma_rmse(md_cpl)
    print(f"\ngamma RMSE: window={rmse_win:.5f} coupled={rmse_cpl:.5f}; "
          f"wall: window={t_win:.2f}s coupled={t_cpl:.2f}s")
    assert rmse_cpl <= rmse_win * 1.02

    # (3) Physical sanity: Rp trend still recovered
    rp = md_cpl.predict_r_p(resolved=True)
    assert np.max(np.abs(rp - (1.0 + 0.5 * PSIS))) < 0.05


def test_coupled_resolve_ill_conditioned_group():
    """Regression: a 9-obs group with a strong ohmic trend produces resolve
    blocks with cond(P) spanning ~1e5; the round-4 projected-Newton draft
    stalled on it at ~8% solution error (Rp err 0.16). The IP-PCG solver
    must recover the Rp trend as well as the windowed scheme does."""
    rng = np.random.default_rng(42)
    freq = np.logspace(5, -1, 61)
    tau_super = np.logspace(-7, 2, 91)
    md = DRTMD(tau_super, psi_dim_names=["T"], warn=False,
               print_progress=False)
    psis = np.linspace(0, 1, 9)
    for p in psis:
        zz = (0.3 + 0.2 * p
              + (1.0 + 0.5 * p) / (1 + (2j * np.pi * freq
                                        * 10 ** (-3 + 2 * p)) ** 0.9))
        zz = zz + (rng.normal(size=61) + 1j * rng.normal(size=61)) * 0.003
        md.add_observation([p], None, (freq, zz), group_id="g")
    md.fit_all(batched=True)
    md.resolve_group("g", psi_sort_dims=["T"], coupled=True)
    rp = md.predict_r_p(resolved=True)
    assert np.max(np.abs(rp - (1.0 + 0.5 * psis))) < 0.05
    # Solver diagnostics are surfaced and within the converged tolerance
    info = md.resolve_info
    assert info["coupled"] and info["n_iter"] > 0
    assert np.isfinite(info["kkt_residual"])
    assert info["kkt_residual"] <= info["kkt_tol"]


def test_coupled_resolve_warns_on_unconverged(monkeypatch):
    """resolve_group(coupled=True) must not silently mark success when the
    matrix-free IP solve stalls: a KKT residual above the calibrated
    tolerance raises a UserWarning pointing at the fallback options."""
    import warnings as _warnings
    rng = np.random.default_rng(1)
    freq = np.logspace(5, -1, 41)
    md = DRTMD(np.logspace(-7, 2, 61), psi_dim_names=["T"], warn=False,
               print_progress=False)
    for p in np.linspace(0, 1, 3):
        zz = 0.3 + 1.0 / (1 + (2j * np.pi * freq * 1e-3) ** 0.9)
        zz = zz + (rng.normal(size=41) + 1j * rng.normal(size=41)) * 0.003
        md.add_observation([p], None, (freq, zz), group_id="g")
    md.fit_all(batched=True)

    orig = resolve_mod.solve_coupled_group

    def stalled(*args, **kwargs):
        x, n_iter, _ = orig(*args, **kwargs)
        return x, n_iter, 1e3  # simulate max_iter exhaustion

    monkeypatch.setattr(resolve_mod, "solve_coupled_group", stalled)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        md.resolve_group("g", psi_sort_dims=["T"], coupled=True)
    assert any("did not fully converge" in str(w.message) for w in rec)
    assert md.resolve_info["kkt_residual"] == 1e3


def test_coupled_resolve_mesh_matches(fitted_map):
    from hybdrt_tpu.parallel.sharding import make_mesh
    md_a = copy.deepcopy(fitted_map)
    md_b = copy.deepcopy(fitted_map)
    md_a.resolve_group("g", psi_sort_dims=["T"], coupled=True)
    mesh = make_mesh(jax.devices("cpu"))
    md_b.resolve_group("g", psi_sort_dims=["T"], coupled=True, mesh=mesh)
    # Two independent solves to the same KKT tolerance, at different padded
    # widths (13 obs -> 16 lanes on the mesh): agreement is tolerance-level,
    # not bitwise
    scale = np.max(np.abs(md_a.obs_x_resolved))
    assert np.allclose(md_b.obs_x_resolved, md_a.obs_x_resolved,
                       atol=1e-5 * scale)
