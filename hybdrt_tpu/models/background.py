"""Chrono voltage baseline/background estimation.

The polynomial baseline enters the QP design matrix directly
(reference hybdrt/models/background.py:23-40); the flexible GP background is a
JAX GP regression (kernel matrix + Cholesky solve) replacing the reference's
scikit-learn GaussianProcessRegressor (reference background.py:43-98).
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def get_baseline_matrix(times, deg, normalize=False, sqrt=False):
    """Polynomial (+ optional sqrt-t) design matrix for the voltage baseline."""
    times = np.asarray(times)
    vb_mat = np.zeros((len(times), deg + 1 + int(sqrt)))
    for n in range(deg + 1):
        vb_mat[:, n] = (times - times[0]) ** n
    if sqrt:
        vb_mat[:, -1] = (times - times[0]) ** 0.5
    if normalize:
        scales = np.max(vb_mat, axis=0)
        scales[scales == 0] = 1.0
        return vb_mat / scales[None, :], scales
    return vb_mat


def evaluate_baseline(x_vb, vb_mat):
    return vb_mat @ x_vb


# ------------------------------------------------------------------
# JAX GP regression for background drift estimation
# ------------------------------------------------------------------
def _rbf_kernel(x1, x2, length_scale, variance):
    d = (x1[:, None] - x2[None, :]) / length_scale
    return variance * jnp.exp(-0.5 * d ** 2)


def _periodic_kernel(x1, x2, length_scale, periodicity, variance):
    d = jnp.abs(x1[:, None] - x2[None, :])
    return variance * jnp.exp(-2 * (jnp.sin(jnp.pi * d / periodicity) / length_scale) ** 2)


class GPBackground:
    """Exact GP regression with RBF / periodic / locally-periodic kernels.

    Hyperparameters are optimized by grid search over log-spaced candidates on
    the marginal likelihood (a robust, jit-friendly stand-in for the
    reference's scipy L-BFGS restarts).
    """

    def __init__(self, kernel_type="gaussian", length_scale_bounds=(0.01, 10),
                 periodicity_bounds=(1e-3, 1e3), noise_level_bounds=(0.1, 10),
                 n_grid=8):
        self.kernel_type = kernel_type
        self.length_scale_bounds = length_scale_bounds
        self.periodicity_bounds = periodicity_bounds
        self.noise_level_bounds = noise_level_bounds
        self.n_grid = n_grid
        self.params_ = None
        self.x_train_ = None
        self.alpha_ = None
        self.chol_ = None
        self.y_std_ = 1.0
        self.y_mean_ = 0.0

    def _kernel(self, x1, x2, params):
        if self.kernel_type == "periodic":
            return _periodic_kernel(x1, x2, params["length_scale"], params["periodicity"], 1.0)
        if self.kernel_type == "locper":
            return _rbf_kernel(x1, x2, params["length_scale"] * 10, 1.0) * \
                _periodic_kernel(x1, x2, params["length_scale"], params["periodicity"], 1.0)
        return _rbf_kernel(x1, x2, params["length_scale"], 1.0)

    def _lml(self, x, y, params):
        n = x.shape[0]
        k = self._kernel(x, x, params) + params["noise"] * jnp.eye(n)
        chol = jnp.linalg.cholesky(k)
        alpha = jsl.cho_solve((chol, True), y)
        return -0.5 * y @ alpha - jnp.sum(jnp.log(jnp.diagonal(chol))) \
            - 0.5 * n * jnp.log(2 * jnp.pi)

    def fit(self, x, y):
        x = jnp.asarray(np.asarray(x).ravel(), dtype=jnp.float64)
        y = np.asarray(y, dtype=float)
        self.y_mean_ = float(np.mean(y))
        self.y_std_ = float(np.std(y)) or 1.0
        yn = jnp.asarray((y - self.y_mean_) / self.y_std_)

        ls_grid = np.logspace(np.log10(self.length_scale_bounds[0]),
                              np.log10(self.length_scale_bounds[1]), self.n_grid)
        noise_grid = np.logspace(np.log10(self.noise_level_bounds[0]),
                                 np.log10(self.noise_level_bounds[1]), self.n_grid)
        per_grid = np.logspace(np.log10(self.periodicity_bounds[0]),
                               np.log10(self.periodicity_bounds[1]), self.n_grid) \
            if self.kernel_type in ("periodic", "locper") else [1.0]

        best, best_lml = None, -np.inf
        for ls in ls_grid:
            for nl in noise_grid:
                for per in per_grid:
                    params = {"length_scale": ls, "noise": nl, "periodicity": per}
                    lml = float(self._lml(x, yn, params))
                    if np.isfinite(lml) and lml > best_lml:
                        best, best_lml = params, lml
        self.params_ = best
        self.x_train_ = x
        k = self._kernel(x, x, best) + best["noise"] * jnp.eye(x.shape[0])
        self.chol_ = jnp.linalg.cholesky(k)
        self.alpha_ = jsl.cho_solve((self.chol_, True), yn)
        return self

    def predict(self, x_new):
        x_new = jnp.asarray(np.asarray(x_new).ravel(), dtype=jnp.float64)
        k_star = self._kernel(x_new, self.x_train_, self.params_)
        mu = k_star @ self.alpha_
        return np.asarray(mu) * self.y_std_ + self.y_mean_

    def predict_matrix(self, x_new):
        """K* K^-1 as a linear smoothing operator (reference background.py:193)."""
        k_star = self._kernel(jnp.asarray(np.asarray(x_new).ravel()), self.x_train_,
                              self.params_)
        n = self.x_train_.shape[0]
        k_inv = jsl.cho_solve((self.chol_, True), jnp.eye(n))
        return np.asarray(k_star @ k_inv)


def estimate_background(x_meas, y_meas, y_pred, kernel_type="gaussian", **gp_kw):
    """Fit a GP to residuals (measured - predicted) to estimate drift."""
    gp = GPBackground(kernel_type=kernel_type, **gp_kw)
    resid = np.asarray(y_meas) - np.asarray(y_pred)
    gp.fit(x_meas, resid)
    return gp, gp.predict(x_meas)


def get_background_matrix(gps, times, y_drt=None, corr_power=None):
    """Background projection matrix K* K^-1, optionally penalized for
    correlation with the DRT response (reference background.py:193-223)."""
    rm = 0
    for gp in np.atleast_1d(gps):
        rm = rm + gp.predict_matrix(times)
    if corr_power is not None and y_drt is not None:
        y_drt = np.asarray(y_drt)
        bkg_est = rm @ y_drt
        denom = np.linalg.norm(bkg_est) * np.linalg.norm(y_drt)
        if denom > 0:
            corr = np.abs(np.dot(bkg_est, y_drt)) / denom
            rm = rm * (1 - corr) ** corr_power
    return rm


def estimate_chrono_background(drt, times, i_signal, v_signal, **kw):
    """Module-level convenience mirroring reference background.py:101:
    iteratively fit the DRT and a GP to the residual drift.

    Returns (drt_bkg, [gp], y_bkg); see DRT.estimate_chrono_background."""
    return drt.estimate_chrono_background(times, i_signal, v_signal,
                                          copy_self=True, **kw)
