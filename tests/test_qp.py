"""Unit tests for the JAX-native bound-constrained QP solver."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybdrt_tpu.ops.qp import solve_qp_box, solve_qp


def _random_qp(n, m_rows, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(m_rows, n))
    p = a.T @ a + 0.05 * np.eye(n)
    q = rng.normal(size=n) * scale
    return jnp.asarray(p), jnp.asarray(q)


def _check_kkt(p, q, lb, x, tol=1e-7):
    p, q, lb, x = map(np.asarray, (p, q, lb, x))
    g = p @ x + q
    scale = 1 + np.max(np.abs(q))
    free = x > lb + 1e-9 * (1 + np.abs(lb))
    assert np.all(x >= lb - 1e-9 * (1 + np.abs(lb))), "primal feasibility"
    assert np.max(np.abs(g[free]), initial=0.0) < tol * scale, "stationarity on free set"
    assert np.min(g[~free], initial=0.0) > -tol * scale, "dual feasibility on active set"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("scale", [1.0, 1e4])
def test_qp_box_kkt(seed, scale):
    p, q = _random_qp(60, 90, seed, scale)
    lb = jnp.zeros(60)
    res = solve_qp_box(p, q, lb)
    _check_kkt(p, q, lb, res.x)


def test_qp_box_mixed_bounds():
    p, q = _random_qp(40, 60, 7)
    lb = jnp.concatenate([jnp.full(5, -1000.0), jnp.zeros(35)])
    res = solve_qp_box(p, q, lb)
    _check_kkt(p, q, lb, res.x)


def test_qp_box_unconstrained_interior():
    """When the unconstrained optimum is interior, QP must return it."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(50, 30))
    p = a.T @ a + np.eye(30)
    x_star = np.abs(rng.normal(size=30)) + 1.0
    q = -(p @ x_star)
    res = solve_qp_box(jnp.asarray(p), jnp.asarray(q), jnp.zeros(30))
    assert np.allclose(np.asarray(res.x), x_star, rtol=1e-8, atol=1e-10)


def test_qp_box_vmap_batch():
    """A batch of QPs under vmap matches per-problem solves."""
    n = 24
    keys = [0, 1, 2, 3, 4]
    ps, qs = zip(*[_random_qp(n, 40, s) for s in keys])
    p_b = jnp.stack(ps)
    q_b = jnp.stack(qs)
    lb = jnp.zeros(n)
    batched = jax.vmap(lambda p, q: solve_qp_box(p, q, lb).x)(p_b, q_b)
    for i in range(len(keys)):
        single = solve_qp_box(ps[i], qs[i], lb).x
        assert np.allclose(np.asarray(batched[i]), np.asarray(single), rtol=1e-6, atol=1e-9)


def test_qp_general_matches_box():
    """solve_qp with G=-I, h=0 equals solve_qp_box with lb=0."""
    p, q = _random_qp(30, 50, 5)
    lb = jnp.zeros(30)
    res_box = solve_qp_box(p, q, lb)
    g_mat = -jnp.eye(30)
    h = jnp.zeros(30)
    res_gen = solve_qp(p, q, g_mat, h)
    assert np.allclose(np.asarray(res_box.x), np.asarray(res_gen.x), rtol=1e-5, atol=1e-7)


def test_qp_ill_conditioned_still_solves():
    """DRT-like ill-conditioned P (cond ~ 1e8) keeps feasible + stationary."""
    rng = np.random.default_rng(3)
    u, _ = np.linalg.qr(rng.normal(size=(50, 50)))
    eigs = np.logspace(0, -8, 50)
    p = u @ np.diag(eigs) @ u.T
    p = 0.5 * (p + p.T)
    q = rng.normal(size=50)
    lb = jnp.zeros(50)
    res = solve_qp_box(jnp.asarray(p), jnp.asarray(q), lb)
    _check_kkt(p, q, lb, res.x, tol=1e-5)
