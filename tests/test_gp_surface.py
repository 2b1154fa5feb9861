"""GP surface models (hybdrt_tpu/mapping/gp.py; JAX analog of the
reference's Stan gp_marginal_* models)."""
import numpy as np
import pytest

from hybdrt_tpu.mapping import gp


def _synthetic_surface(n_psi=10, n_tau=40, noise=1e-3, seed=0):
    """One ZARC whose lntau drifts linearly with psi, amplitude constant."""
    rng = np.random.default_rng(seed)
    psi = np.linspace(0.0, 1.0, n_psi)[:, None]
    tau = np.logspace(-4, 0, n_tau)
    lntau_true = -6.0 + 2.0 * psi[:, 0]          # drifts from -6 to -4
    beta_true = 0.85
    r_true = 2.0
    y = np.stack([
        r_true * np.asarray(gp.zarc_gamma(tau, np.exp(lt), beta_true))
        for lt in lntau_true])
    y = y + rng.normal(0, noise, y.shape)
    return psi, tau, y, lntau_true, r_true, beta_true


def test_zarc_gamma_area():
    """ZARC gamma integrates to ~1 over ln(tau) (unit amplitude)."""
    tau = np.logspace(-8, 4, 2000)
    g = np.asarray(gp.zarc_gamma(tau, 1e-2, 0.8))
    area = np.trapezoid(g, np.log(tau))
    assert abs(area - 1.0) < 1e-3


def test_hn_gamma_reduces_to_zarc():
    """HN with alpha=1 equals the ZARC distribution."""
    tau = np.logspace(-4, 0, 50)
    g_hn = np.asarray(gp.hn_gamma(tau, 1e-2, 1.0, 0.8))
    g_z = np.asarray(gp.zarc_gamma(tau, 1e-2, 0.8))
    assert np.allclose(g_hn, g_z, atol=1e-10)


def test_exp_quad_cov_ard():
    x = np.random.default_rng(0).normal(size=(6, 2))
    k_iso = np.asarray(gp.exp_quad_cov(x, x, 1.5, 0.7))
    assert np.allclose(np.diag(k_iso), 1.5 ** 2)
    assert np.allclose(k_iso, k_iso.T)
    # ARD with equal scales matches isotropic
    k_ard = np.asarray(gp.exp_quad_cov(x, x, 1.5, np.array([0.7, 0.7])))
    assert np.allclose(k_iso, k_ard)


def test_gp_surface_fit_recovers_drift():
    psi, tau, y, lntau_true, r_true, beta_true = _synthetic_surface()
    model = gp.GPSurfaceModel(tau, n_elements=1, element="zarc")
    model.fit(psi, y, n_steps=1500, learning_rate=2e-2,
              lntau_init=np.array([-5.0]))
    # Loss decreased substantially
    assert model.loss_history[-1] < model.loss_history[0] - 10

    fields = model.get_fields()
    # lntau field tracks the true drift
    err = np.abs(fields["lntau"][0] - lntau_true)
    assert np.median(err) < 0.3
    # amplitude ~ R and beta near truth
    assert abs(np.median(fields["amplitude"][0]) - r_true) < 0.4
    assert abs(np.median(fields["beta"][0]) - beta_true) < 0.1

    # Surface reconstruction matches the data
    y_hat = model.predict_surface()
    rel = np.linalg.norm(y_hat - y) / np.linalg.norm(y)
    assert rel < 0.1

    # GP interpolation to new psi points is smooth and in-range
    psi_new = np.array([[0.25], [0.55]])
    f_new = model.predict_fields(psi_new)
    assert f_new["lntau"].shape == (1, 2)
    lt_lo, lt_hi = np.min(fields["lntau"]), np.max(fields["lntau"])
    assert np.all(f_new["lntau"] >= lt_lo - 0.5)
    assert np.all(f_new["lntau"] <= lt_hi + 0.5)
    y_new = model.predict_surface(psi_new)
    assert y_new.shape == (2, len(tau))
    assert np.all(np.isfinite(y_new))


def test_gp_surface_log_r_mode():
    """lnR parameterization with fixed sign (reference *_lnR.stan)."""
    psi, tau, y, *_ = _synthetic_surface(n_psi=6)
    model = gp.GPSurfaceModel(tau, n_elements=1, log_r=True, r_sign=[1.0])
    model.fit(psi, y, n_steps=300, lntau_init=np.array([-5.0]))
    fields = model.get_fields()
    # log_r guarantees positive amplitude
    assert np.all(fields["amplitude"] > 0)


def test_gp_surface_invalid_element():
    with pytest.raises(ValueError):
        gp.GPSurfaceModel(np.logspace(-3, 0, 10), element="bogus")
