"""GP-marginal surface models for DRT mapping — JAX analog of the reference's
experimental Stan subsystem (reference hybdrt/mapping/stan_models/*.stan,
loader stan_utils.py:7-15; unused by any in-tree module).

Model (reference gp_marginal_ZARC.stan): the DRT surface y(psi, tau) observed
at N operating points is a sum of K discrete elements (ZARC or HN), whose
parameters — amplitude R_k(psi) (or lnR_k with a fixed sign, as in the
`_lnR` Stan variants), log time constant lntau_k(psi), and logit-shape
beta_trans_k(psi) — vary smoothly over psi under squared-exponential GP
priors (isotropic or ARD/anisotropic, as in the `_aniso` variants). The
likelihood ties the reconstructed surface and its polarization resistance to
the data with relative noise.

Where Stan runs NUTS, this module does MAP estimation with a non-centered
parameterization (GP field = L_K @ eta, eta ~ N(0, I)) optimized by Adam —
fully jitted, batched over elements, and differentiable in the GP
hyperparameters. Posterior interpolation to new psi uses the standard GP
conditional (Stan's gp_pred_rng, mean + covariance).
"""
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Element distribution kernels (Stan HN_gamma / ZARC_gamma, tda ref :1-23)
# ---------------------------------------------------------------------------
def zarc_gamma(tau, tau_0, beta):
    """ZARC (RQ) relaxation-time distribution, unit area."""
    lt = jnp.log(tau / tau_0)
    nume = jnp.sin((1 - beta) * jnp.pi)
    deno = 2 * jnp.pi * (jnp.cosh(beta * lt) - jnp.cos((1 - beta) * jnp.pi))
    return nume / deno


def hn_gamma(tau, tau_0, alpha, beta):
    """Havriliak-Negami relaxation-time distribution, unit area."""
    tt0 = tau / tau_0
    tb = tt0 ** beta
    theta = jnp.arctan2(jnp.sin(jnp.pi * beta), tb + jnp.cos(jnp.pi * beta))
    nume = (1 / jnp.pi) * tt0 ** (beta * alpha) * jnp.sin(alpha * theta)
    deno = (1 + 2 * jnp.cos(jnp.pi * beta) * tb + tb ** 2) ** (alpha / 2)
    return nume / deno


def exp_quad_cov(x1, x2, alpha, rho):
    """Squared-exponential kernel with per-dimension length scales (ARD).

    x1: (n1, d), x2: (n2, d), rho: scalar or (d,). Matches Stan's
    gp_exp_quad_cov for scalar rho.
    """
    rho = jnp.broadcast_to(jnp.asarray(rho), (x1.shape[1],))
    diff = (x1[:, None, :] - x2[None, :, :]) / rho[None, None, :]
    return alpha ** 2 * jnp.exp(-0.5 * jnp.sum(diff ** 2, axis=-1))


def _inv_gamma_lpdf(x, a, b):
    return a * jnp.log(b) - math.lgamma(a) - (a + 1) * jnp.log(x) - b / x


class GPSurfaceParams(NamedTuple):
    """Unconstrained optimization variables (log-space for positives)."""
    log_rho: jnp.ndarray         # (K, D) ARD length scales
    log_alpha: jnp.ndarray       # (K,) GP magnitudes
    log_sigma: jnp.ndarray       # (K,) GP field noise levels
    eta_r: jnp.ndarray           # (K, N) whitened amplitude fields
    eta_lntau: jnp.ndarray       # (K, N)
    eta_beta: jnp.ndarray        # (K, N)
    r_mu: jnp.ndarray            # (K,) field means
    lntau_mu: jnp.ndarray
    beta_mu: jnp.ndarray
    log_r_scale: jnp.ndarray     # (K,) field scales
    log_lntau_scale: jnp.ndarray
    log_beta_scale: jnp.ndarray
    log_sigma_rel_y: jnp.ndarray    # () relative surface noise
    log_sigma_rel_rp: jnp.ndarray   # () relative Rp noise


class GPSurfaceModel:
    """MAP GP surface model of a DRT map over operating coordinates psi.

    Parameters
    ----------
    tau : (M,) relaxation-time grid of the observed surfaces.
    n_elements : K, number of discrete elements.
    element : 'zarc' | 'hn'.
    log_r : model ln|R| with fixed signs r_sign instead of R directly
        (reference gp_marginal_ZARC_lnR*.stan).
    r_sign : (K,) signs used when log_r=True.
    hn_alpha : fixed HN alpha exponent (element='hn').
    sigma_gp_scale, sigma_rel_y_scale, sigma_rel_rp_scale : prior scale
        constants (Stan data block).
    """

    def __init__(self, tau, n_elements=1, element="zarc", log_r=False, r_sign=None,
                 hn_alpha=0.9, sigma_gp_scale=1.0, sigma_rel_y_scale=0.05,
                 sigma_rel_rp_scale=0.05, jitter=1e-8):
        self.tau = jnp.asarray(np.asarray(tau, dtype=float))
        self.k = int(n_elements)
        if element not in ("zarc", "hn"):
            raise ValueError(f"Invalid element {element!r}; options: 'zarc', 'hn'")
        self.element = element
        self.log_r = bool(log_r)
        self.r_sign = jnp.asarray(np.ones(self.k) if r_sign is None
                                  else np.asarray(r_sign, dtype=float))
        self.hn_alpha = float(hn_alpha)
        self.sigma_gp_scale = float(sigma_gp_scale)
        self.sigma_rel_y_scale = float(sigma_rel_y_scale)
        self.sigma_rel_rp_scale = float(sigma_rel_rp_scale)
        self.jitter = float(jitter)
        self.params: GPSurfaceParams | None = None
        self.x = None
        self.y = None

    # -- model assembly ----------------------------------------------------
    def _element_gamma(self, lntau_0, beta_trans):
        beta = jax.nn.sigmoid(beta_trans)
        if self.element == "zarc":
            return zarc_gamma(self.tau[None, :], jnp.exp(lntau_0)[:, None],
                              beta[:, None])
        return hn_gamma(self.tau[None, :], jnp.exp(lntau_0)[:, None],
                        self.hn_alpha, beta[:, None])

    def _fields(self, p: GPSurfaceParams, x):
        """Whitened etas -> per-element parameter fields at the N data points."""
        def chol_k(k):
            cov = exp_quad_cov(x, x, jnp.exp(p.log_alpha[k]), jnp.exp(p.log_rho[k]))
            sq_sigma = (self.sigma_gp_scale * jnp.exp(p.log_sigma[k])) ** 2
            cov = cov + (sq_sigma + self.jitter) * jnp.eye(x.shape[0])
            return jnp.linalg.cholesky(cov)
        l_k = jax.vmap(chol_k)(jnp.arange(self.k))        # (K, N, N)
        r_raw = jnp.einsum("kij,kj->ki", l_k, p.eta_r)
        lt_raw = jnp.einsum("kij,kj->ki", l_k, p.eta_lntau)
        bt_raw = jnp.einsum("kij,kj->ki", l_k, p.eta_beta)
        r = p.r_mu[:, None] + r_raw * jnp.exp(p.log_r_scale)[:, None]
        lntau = p.lntau_mu[:, None] + lt_raw * jnp.exp(p.log_lntau_scale)[:, None]
        beta_t = p.beta_mu[:, None] + bt_raw * jnp.exp(p.log_beta_scale)[:, None]
        if self.log_r:
            amp = self.r_sign[:, None] * jnp.exp(r)
        else:
            amp = r
        return amp, lntau, beta_t, (r_raw, lt_raw, bt_raw)

    def _surface(self, amp, lntau, beta_t):
        """(K, N) fields -> (N, M) reconstructed DRT surface."""
        def one_n(a_n, lt_n, bt_n):
            return jnp.sum(a_n[:, None] * self._element_gamma(lt_n, bt_n), axis=0)
        return jax.vmap(one_n, in_axes=(1, 1, 1))(amp, lntau, beta_t)

    def _neg_log_posterior(self, p: GPSurfaceParams, x, y, rp):
        amp, lntau, beta_t, _ = self._fields(p, x)
        y_hat = self._surface(amp, lntau, beta_t)
        rp_hat = jnp.sum(jnp.abs(y_hat), axis=1)

        sigma_y = jnp.exp(p.log_sigma_rel_y) * self.sigma_rel_y_scale * rp_hat
        sigma_rp = jnp.exp(p.log_sigma_rel_rp) * self.sigma_rel_rp_scale * rp_hat

        # Likelihood (relative noise, Stan model block)
        lp = -0.5 * jnp.sum(((y - y_hat) / sigma_y[:, None]) ** 2) \
            - y.shape[1] * jnp.sum(jnp.log(sigma_y))
        lp = lp - 0.5 * jnp.sum(((rp - rp_hat) / sigma_rp) ** 2) \
            - jnp.sum(jnp.log(sigma_rp))

        # Whitened GP fields: standard-normal prior on etas
        lp = lp - 0.5 * (jnp.sum(p.eta_r ** 2) + jnp.sum(p.eta_lntau ** 2)
                         + jnp.sum(p.eta_beta ** 2))

        # Hyperpriors (Stan: rho ~ inv_gamma(5,5); alpha, sigma ~ std_normal;
        # scales, sigma_rel ~ inv_gamma(1,1); mus ~ wide normal)
        rho = jnp.exp(p.log_rho)
        lp = lp + jnp.sum(_inv_gamma_lpdf(rho, 5.0, 5.0) + p.log_rho)
        for lv in (p.log_alpha, p.log_sigma):
            v = jnp.exp(lv)
            lp = lp - 0.5 * jnp.sum(v ** 2) + jnp.sum(lv)
        for ls in (p.log_r_scale, p.log_lntau_scale, p.log_beta_scale,
                   p.log_sigma_rel_y, p.log_sigma_rel_rp):
            s = jnp.exp(ls)
            lp = lp + jnp.sum(_inv_gamma_lpdf(s, 1.0, 1.0) + ls)
        lp = lp - 0.5 * jnp.sum((p.beta_mu / 10.0) ** 2) \
            - 0.5 * jnp.sum((p.r_mu / 100.0) ** 2) \
            - 0.5 * jnp.sum((p.lntau_mu / 100.0) ** 2)
        return -lp

    # -- fitting -----------------------------------------------------------
    def _init_params(self, x, y, lntau_init=None):
        n = x.shape[0]
        k = self.k
        rp = np.sum(np.abs(np.asarray(y)), axis=1)
        if lntau_init is None:
            # Seed element time constants by spreading over the tau range
            lt = np.log(np.asarray(self.tau))
            qs = np.linspace(0.2, 0.8, k)
            lntau_init = np.quantile(lt, qs)
        r0 = np.mean(rp) / k
        r_mu0 = np.log(max(r0, 1e-12)) if self.log_r else r0
        return GPSurfaceParams(
            log_rho=jnp.zeros((k, x.shape[1])),
            log_alpha=jnp.full((k,), math.log(0.5)),
            log_sigma=jnp.full((k,), math.log(0.1)),
            eta_r=jnp.zeros((k, n)), eta_lntau=jnp.zeros((k, n)),
            eta_beta=jnp.zeros((k, n)),
            r_mu=jnp.full((k,), float(r_mu0)),
            lntau_mu=jnp.asarray(lntau_init, dtype=float),
            beta_mu=jnp.full((k,), 1.5),   # sigmoid(1.5) ~ 0.82
            log_r_scale=jnp.full((k,), math.log(0.5)),
            log_lntau_scale=jnp.full((k,), math.log(0.5)),
            log_beta_scale=jnp.full((k,), math.log(0.5)),
            log_sigma_rel_y=jnp.asarray(0.0), log_sigma_rel_rp=jnp.asarray(0.0),
        )

    def fit(self, x, y, n_steps=2000, learning_rate=2e-2, lntau_init=None,
            params_init=None):
        """MAP-fit the surface model. x: (N, D) psi coords; y: (N, M) DRT maps."""
        import optax
        x_in = np.asarray(x, dtype=float)
        if x_in.ndim == 1:
            # 1-D input means N psi points in one dimension -> column vector
            x_in = x_in[:, None]
        x = jnp.asarray(x_in)
        y = jnp.asarray(np.asarray(y, dtype=float))
        rp = jnp.sum(jnp.abs(y), axis=1)
        p = params_init if params_init is not None \
            else self._init_params(x, y, lntau_init=lntau_init)

        opt = optax.adam(learning_rate)
        loss_fn = lambda q: self._neg_log_posterior(q, x, y, rp)

        @jax.jit
        def step(carry, _):
            q, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(q)
            updates, opt_state = opt.update(grads, opt_state)
            q = optax.apply_updates(q, updates)
            return (q, opt_state), loss

        (p, _), losses = jax.lax.scan(step, (p, opt.init(p)), None, length=n_steps)
        self.params = p
        self.x = x
        self.y = y
        self.loss_history = np.asarray(losses)
        return self

    # -- inspection / prediction -------------------------------------------
    def get_fields(self):
        """Fitted per-element parameter fields at the data points:
        dict with amplitude (K, N), lntau (K, N), beta (K, N)."""
        amp, lntau, beta_t, _ = self._fields(self.params, self.x)
        return {"amplitude": np.asarray(amp), "lntau": np.asarray(lntau),
                "beta": np.asarray(jax.nn.sigmoid(beta_t))}

    def predict_surface(self, x_new=None):
        """Reconstructed DRT surface (N*, M) at x_new (default: data points)."""
        if x_new is None:
            amp, lntau, beta_t, _ = self._fields(self.params, self.x)
        else:
            amp, lntau, beta_t = self._predict_fields_raw(x_new)
        return np.asarray(self._surface(amp, lntau, beta_t))

    def _gp_conditional(self, x_new, field_raw, k):
        """Posterior mean of one whitened field at new points (Stan
        gp_pred_rng, mean part)."""
        p = self.params
        alpha = jnp.exp(p.log_alpha[k])
        rho = jnp.exp(p.log_rho[k])
        sq_sigma = (self.sigma_gp_scale * jnp.exp(p.log_sigma[k])) ** 2
        k11 = exp_quad_cov(self.x, self.x, alpha, rho) \
            + (sq_sigma + self.jitter) * jnp.eye(self.x.shape[0])
        k12 = exp_quad_cov(self.x, x_new, alpha, rho)
        sol = jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(k11), True), field_raw)
        return k12.T @ sol

    def _predict_fields_raw(self, x_new):
        x_new = jnp.atleast_2d(jnp.asarray(np.asarray(x_new, dtype=float)))
        p = self.params
        _, _, _, (r_raw, lt_raw, bt_raw) = self._fields(p, self.x)
        amp, lntau, beta_t = [], [], []
        for k in range(self.k):
            r_new = self._gp_conditional(x_new, r_raw[k], k)
            lt_new = self._gp_conditional(x_new, lt_raw[k], k)
            bt_new = self._gp_conditional(x_new, bt_raw[k], k)
            r = p.r_mu[k] + r_new * jnp.exp(p.log_r_scale[k])
            amp.append(self.r_sign[k] * jnp.exp(r) if self.log_r else r)
            lntau.append(p.lntau_mu[k] + lt_new * jnp.exp(p.log_lntau_scale[k]))
            beta_t.append(p.beta_mu[k] + bt_new * jnp.exp(p.log_beta_scale[k]))
        return jnp.stack(amp), jnp.stack(lntau), jnp.stack(beta_t)

    def predict_fields(self, x_new):
        """Per-element parameter fields interpolated to new psi points."""
        amp, lntau, beta_t = self._predict_fields_raw(x_new)
        return {"amplitude": np.asarray(amp), "lntau": np.asarray(lntau),
                "beta": np.asarray(jax.nn.sigmoid(beta_t))}
