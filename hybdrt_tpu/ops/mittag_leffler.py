"""Mittag-Leffler functions E_{a,b}(-x) and E^g_{a,b}(-x) for x >= 0.

The reference depends on the external ``mitlef`` package (Pade approximation;
reference hybdrt/matrices/basis.py:5, mat1d.py:58) for the two-parameter
function used by Cole-Cole basis time responses, and leaves the HN step
response unimplemented (reference models/elements.py:2102-2107). Here both the
two-parameter and the three-parameter (Prabhakar) functions are evaluated with
a branchless series/asymptotic blend that is jit/vmap/grad-friendly, so they
can sit inside autodiff Levenberg-Marquardt fits where ``a`` (the dispersion
exponent) is itself a traced parameter:

  * power series  E^g_{a,b}(-x) = sum_k (g)_k (-x)^k / (k! Gamma(ak+b))
  * asymptotic    E^g_{a,b}(-x) ~ x^{-g}/Gamma(g) *
                    sum_k Gamma(g+k) (-1)^k x^{-k} / (k! Gamma(b-a(g+k)))

The series is alternating with terms that peak near exp(x^{1/a}); in float64
the cancellation noise is ~1e-16 * exp(x^{1/a}), so the blend switches to the
asymptotic branch at x = CROSS^a (x^{1/a} = CROSS = 20), where the noise is
still ~1e-16 * e^20 ~ 5e-8 absolute. The asymptotic series is divergent; terms
shrink until k* ~ x^{1/a}/a and grow after, so terms beyond k* are masked out
(near-optimal truncation, remainder ~exp(-x^{1/a})).
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

_CROSS = 20.0  # blend point in x^{1/a}
_SERIES_TERMS = 120
_ASYM_TERMS = 40


def _rgamma(z):
    """1 / Gamma(z), valid for any real z (zero at non-positive integers)."""
    # reflection: 1/Gamma(z) = sin(pi z) Gamma(1-z) / pi  for z <= 0
    z = jnp.asarray(z, dtype=jnp.result_type(float))
    pos = z > 0.5
    zp = jnp.where(pos, z, 1.0 - z)
    g = jnp.exp(gammaln(zp))
    return jnp.where(pos, 1.0 / g, jnp.sin(jnp.pi * z) * g / jnp.pi)


def prabhakar_ml_neg(x, a, b, g, series_terms=_SERIES_TERMS,
                     asym_terms=_ASYM_TERMS):
    """Three-parameter (Prabhakar) Mittag-Leffler function E^g_{a,b}(-x)
    for x >= 0 (elementwise), 0 < a <= 1, g > 0.

    Supplies the Havriliak-Negami current-step response
    V(t) = R (t/tau)^{ab} E^a_{b, ab+1}(-(t/tau)^b) through the Laplace pair
    L[t^{B-1} E^g_{a,B}(-l t^a)] = s^{ag-B} / (s^a + l)^g.
    """
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    a = jnp.asarray(a, dtype=x.dtype)
    crossover = _CROSS ** a

    k_s = jnp.arange(series_terms, dtype=x.dtype)
    x_small = jnp.minimum(x, crossover)  # clamp the unused branch
    logx_small = jnp.log(jnp.maximum(x_small, 1e-300))
    shape = (series_terms,) + (1,) * x.ndim
    k_s = k_s.reshape(shape)
    # log[(g)_k / k!] = gammaln(g+k) - gammaln(g) - gammaln(k+1)
    log_poch = gammaln(g + k_s) - gammaln(g) - gammaln(k_s + 1.0)
    terms_s = ((-1.0) ** k_s * jnp.exp(k_s * logx_small + log_poch)
               * _rgamma(a * k_s + b))
    series = jnp.sum(terms_s, axis=0)

    k_a = jnp.arange(asym_terms, dtype=x.dtype)
    x_big = jnp.maximum(x, crossover)
    logx_big = jnp.log(x_big)
    shape = (asym_terms,) + (1,) * x.ndim
    k_a = k_a.reshape(shape)
    log_coef = gammaln(g + k_a) - gammaln(g) - gammaln(k_a + 1.0)
    terms_a = ((-1.0) ** k_a * jnp.exp(-(g + k_a) * logx_big + log_coef)
               * _rgamma(b - a * (g + k_a)))
    # Divergent series: mask terms past the turning point k* ~ x^{1/a}/a - g
    k_opt = jnp.exp(logx_big / a) / a - g
    terms_a = jnp.where(k_a <= k_opt, terms_a, 0.0)
    asym = jnp.sum(terms_a, axis=0)

    return jnp.where(x < crossover, series, asym)


def mittag_leffler_neg(x, a, b, series_terms=_SERIES_TERMS,
                       asym_terms=_ASYM_TERMS, crossover=None):
    """Two-parameter Mittag-Leffler function E_{a,b}(-x) for x >= 0
    (elementwise) — the g=1 Prabhakar special case.

    ``crossover`` is accepted for backward compatibility and ignored; the
    blend point adapts to ``a`` (see module docstring).
    """
    return prabhakar_ml_neg(x, a, b, 1.0, series_terms=series_terms,
                            asym_terms=asym_terms)
