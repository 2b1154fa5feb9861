"""Levenberg-Marquardt nonlinear least squares in JAX.

Replaces the reference's scipy.optimize.least_squares driver for discrete
equivalent-circuit fitting (reference hybdrt/models/elements.py:2301-2336).
Jacobians come from forward-mode autodiff (the reference hand-codes analytic
Jacobians); the whole optimization is one jittable lax.while_loop, so a batch
of circuit fits vmaps across spectra/candidate models.
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def levenberg_marquardt(resid_fn: Callable, x0, max_iter=200, ftol=1e-12, xtol=1e-12,
                        gtol=1e-10, lambda0=1e-3, lambda_min=1e-12, lambda_max=1e10):
    """Minimize 0.5 * ||resid_fn(x)||^2 with adaptive LM damping.

    resid_fn must be a pure function of x (pytree-free 1-D array), traceable
    by jax. Returns an LMResult.
    """
    x0 = jnp.asarray(x0)
    jac_fn = jax.jacfwd(resid_fn)

    def cost_of(x):
        r = resid_fn(x)
        return 0.5 * jnp.dot(r, r)

    def body(carry):
        x, lam, cost, it, _ = carry
        r = resid_fn(x)
        j = jac_fn(x)
        jtj = j.T @ j
        g = j.T @ r
        n = x.shape[0]
        # Marquardt scaling: damp relative to the diagonal
        diag = jnp.clip(jnp.diagonal(jtj), 1e-14, None)
        h = jtj + lam * jnp.diag(diag)
        # Solve (robustly) for the step
        step = jnp.linalg.solve(h + 1e-14 * jnp.eye(n, dtype=x.dtype), -g)
        x_new = x + step
        cost_new = cost_of(x_new)

        improved = cost_new < cost
        # Standard damping schedule: decrease on success, increase on failure
        lam_new = jnp.where(improved, jnp.maximum(lam * 0.3, lambda_min),
                            jnp.minimum(lam * 4.0, lambda_max))
        x_out = jnp.where(improved, x_new, x)
        cost_out = jnp.where(improved, cost_new, cost)

        grad_norm = jnp.max(jnp.abs(g))
        small_step = jnp.max(jnp.abs(step) / (jnp.abs(x) + 1e-12)) < xtol
        small_df = jnp.abs(cost - cost_new) < ftol * (1 + cost)
        small_grad = grad_norm < gtol * (1 + cost)
        done = (improved & (small_step | small_df)) | small_grad
        return x_out, lam_new, cost_out, it + 1, done

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iter) & (~done)

    init = (x0, jnp.asarray(lambda0, dtype=x0.dtype), cost_of(x0),
            jnp.array(0, dtype=jnp.int32), jnp.array(False))
    x, lam, cost, it, done = jax.lax.while_loop(cond, body, init)
    r = resid_fn(x)
    j = jac_fn(x)
    g = j.T @ r
    return LMResult(x=x, cost=cost, grad_norm=jnp.max(jnp.abs(g)), iterations=it,
                    converged=done)
