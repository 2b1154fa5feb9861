"""Probability helpers (reference: hybdrt/utils/stats.py).

Written with jax.numpy so they can be used inside jitted solver code; they
also accept plain numpy arrays.
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln, erf
import numpy as np


def harmonic_mean(x, y):
    return 2 * x * y / (x + y)


def pdf_normal(x, loc, scale):
    return 1 / (scale * jnp.sqrt(2 * jnp.pi)) * jnp.exp(-0.5 * (x - loc) ** 2 / scale ** 2)


def log_pdf_normal(x, mu, sigma):
    return -0.5 * (jnp.log(2 * jnp.pi) + 2 * jnp.log(sigma) + ((x - mu) / sigma) ** 2)


def cdf_normal(x, loc, scale):
    return 0.5 * (1 + erf((x - loc) / (scale * jnp.sqrt(2.0))))


def outer_cdf_normal(x, loc, scale):
    """Integrated pdf for values more extreme than x (farther from the mean)."""
    return 2 * (1 - cdf_normal(jnp.abs(x), loc, scale))


def inner_cdf_normal(x, loc, scale):
    return 1 - outer_cdf_normal(x, loc, scale)


def pdf_gamma(x, shape, rate):
    return jnp.exp(log_pdf_gamma(x, shape, rate, True))


def log_pdf_gamma(x, alpha, beta, include_constants=True):
    lp = (alpha - 1) * jnp.log(x) - beta * x
    if include_constants:
        lp = lp + alpha * jnp.log(beta) - gammaln(alpha)
    return lp


def pdf_invgamma(x, alpha, beta):
    return jnp.exp(alpha * jnp.log(beta) - gammaln(alpha) - (alpha + 1) * jnp.log(x) - beta / x)


def pdf_exp(x, rate):
    return rate * jnp.exp(-rate * x)


def pdf_laplace(x, mu, rate):
    return 0.5 * rate * jnp.exp(-rate * jnp.abs(x - mu))


def robust_std(x, axis=None):
    """IQR-based robust standard deviation estimate."""
    x = np.asarray(x)
    iqr = np.nanpercentile(x, 75, axis=axis) - np.nanpercentile(x, 25, axis=axis)
    return iqr / 1.349


def bic(llh, num_params, num_data):
    """Bayesian information criterion (reference: utils/stats.py:137)."""
    return num_params * np.log(num_data) - 2 * llh


def bayes_factor(bic_1, bic_2):
    """Approximate Bayes factor of model 2 vs model 1 from BICs."""
    return np.exp((bic_1 - bic_2) / 2)


def pdf_lognormal(x, mu, sigma):
    x = np.asarray(x, dtype=float)
    return np.exp(-0.5 * ((np.log(x) - mu) / sigma) ** 2) \
        / (x * sigma * np.sqrt(2 * np.pi))


def std_normal_quantile(quantiles):
    """Standard-normal values at the given quantiles
    (reference utils/stats.py:108)."""
    from scipy.special import ndtri
    return ndtri(np.asarray(quantiles, dtype=float))


def iqr(x):
    return np.percentile(x, 75) - np.percentile(x, 25)


def norm_bayes_factors(crit_values, criterion="bic"):
    """Bayes factors of each model relative to the best
    (reference utils/stats.py:157)."""
    crit_values = np.asarray(crit_values, dtype=float)
    if criterion == "bic":
        return np.exp(-0.5 * (crit_values - np.min(crit_values)))
    if criterion in ("llh", "lml", "lml-bic"):
        return np.exp(crit_values - np.max(crit_values))
    raise ValueError(f"Invalid criterion {criterion}")


def outer_cdf_chi2(x, scale, k, loc=0.0):
    """P(chi2 more extreme than x) (reference utils/stats.py)."""
    from scipy.stats import chi2
    return 1 - chi2.cdf(x, k, loc=loc, scale=scale)


def pdf_beta(x, a, b):
    """Beta(a, b) density (reference utils/stats.py)."""
    from scipy.special import betaln
    x = np.asarray(x, dtype=float)
    return np.exp((a - 1) * np.log(x) + (b - 1) * np.log1p(-x) - betaln(a, b))


def log_pdf_beta(x, a, b):
    from scipy.special import betaln
    x = np.asarray(x, dtype=float)
    return (a - 1) * np.log(x) + (b - 1) * np.log1p(-x) - betaln(a, b)


def pdf_dirichlet(x, alpha):
    """Dirichlet(alpha) density (reference utils/stats.py)."""
    return np.exp(log_pdf_dirichlet(x, alpha))


def log_pdf_dirichlet(x, alpha):
    from scipy.special import gammaln
    x = np.asarray(x, dtype=float)
    alpha = np.asarray(alpha, dtype=float)
    return (np.sum((alpha - 1) * np.log(x), axis=-1)
            + gammaln(np.sum(alpha)) - np.sum(gammaln(alpha)))
