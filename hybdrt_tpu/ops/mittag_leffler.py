"""Mittag-Leffler function E_{a,b}(-x) for Cole-Cole basis time responses.

The reference depends on the external ``mitlef`` package (Pade approximation;
reference hybdrt/matrices/basis.py:5, mat1d.py:58). Here we evaluate
E_{a,b}(-x) for x >= 0, 0 < a < 1 with a branchless series/asymptotic blend
that is jit/vmap-friendly:

  * power series  E_{a,b}(-x) = sum_k (-x)^k / Gamma(ak + b)  for small x
  * asymptotic    E_{a,b}(-x) ~ sum_{k=1..K} -(-x)^{-k} / Gamma(b - ak) for large x
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln


def _rgamma(z):
    """1 / Gamma(z), valid for any real z (zero at non-positive integers)."""
    # reflection: 1/Gamma(z) = sin(pi z) Gamma(1-z) / pi  for z <= 0
    z = jnp.asarray(z, dtype=jnp.result_type(float))
    pos = z > 0.5
    zp = jnp.where(pos, z, 1.0 - z)
    g = jnp.exp(gammaln(zp))
    return jnp.where(pos, 1.0 / g, jnp.sin(jnp.pi * z) * g / jnp.pi)


def mittag_leffler_neg(x, a, b, series_terms=80, asym_terms=12, crossover=6.0):
    """E_{a,b}(-x) for x >= 0 (elementwise)."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    k_s = jnp.arange(series_terms, dtype=x.dtype)
    k_a = jnp.arange(1, asym_terms + 1, dtype=x.dtype)

    x_small = jnp.minimum(x, crossover)  # clamp to avoid overflow in unused branch
    logx_small = jnp.log(jnp.maximum(x_small, 1e-300))
    # series: sum (-1)^k exp(k log x) / Gamma(ak+b)
    shape = (series_terms,) + (1,) * x.ndim
    k_s = k_s.reshape(shape)
    terms_s = (-1.0) ** k_s * jnp.exp(k_s * logx_small) * _rgamma(a * k_s + b)
    series = jnp.sum(terms_s, axis=0)

    x_big = jnp.maximum(x, crossover)
    shape = (asym_terms,) + (1,) * x.ndim
    k_a = k_a.reshape(shape)
    terms_a = -((-1.0) ** k_a) * x_big ** (-k_a) * _rgamma(b - a * k_a)
    asym = jnp.sum(terms_a, axis=0)

    return jnp.where(x < crossover, series, asym)
