"""Cross-validate the JAX interior-point QP against the native C++ active-set
solver — two independent algorithms must agree on the unique SPD optimum."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybdrt_tpu import native
from hybdrt_tpu.ops.qp import solve_qp_box as jax_solve

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_qp(n, m_rows, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(m_rows, n))
    p = a.T @ a + 0.05 * np.eye(n)
    q = rng.normal(size=n) * scale
    return p, q


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("scale", [1.0, 1e4])
def test_native_matches_jax(seed, scale):
    p, q = _random_qp(60, 90, seed, scale)
    lb = np.zeros(60)
    x_native, _ = native.solve_qp_box(p, q, lb)
    x_jax = np.asarray(jax_solve(jnp.asarray(p), jnp.asarray(q), jnp.asarray(lb)).x)
    assert np.allclose(x_native, x_jax, rtol=1e-6, atol=1e-8 * scale)


def test_native_mixed_bounds():
    p, q = _random_qp(40, 60, 7)
    lb = np.concatenate([np.full(5, -1000.0), np.zeros(35)])
    x_native, _ = native.solve_qp_box(p, q, lb)
    x_jax = np.asarray(jax_solve(jnp.asarray(p), jnp.asarray(q), jnp.asarray(lb)).x)
    assert np.allclose(x_native, x_jax, rtol=1e-6, atol=1e-8)


def test_native_kkt():
    p, q = _random_qp(50, 80, 3)
    lb = np.zeros(50)
    x, n_iter = native.solve_qp_box(p, q, lb)
    g = p @ x + q
    free = x > 1e-10
    assert np.all(x >= -1e-12)
    assert np.max(np.abs(g[free])) < 1e-6 * (1 + np.max(np.abs(q)))
    assert np.min(g[~free]) > -1e-6 * (1 + np.max(np.abs(q)))
    assert n_iter > 0


def test_native_on_drt_problem():
    """Agreement on a realistic ill-conditioned DRT posterior system."""
    from hybdrt_tpu.models.drt import DRT
    rng = np.random.default_rng(0)
    freq = np.logspace(4, 0, 31)
    z = 0.5 + 1.0 / (1 + (2j * np.pi * freq * 1e-2) ** 0.9)
    z = z + (rng.normal(size=31) + 1j * rng.normal(size=31)) * 0.002
    drt = DRT(warn=False).fit_eis(freq, z)
    p = drt.qphb_params["p_matrix"]
    q = drt.qphb_params["q_vector"]
    lb = drt.qphb_params["lb"]
    x_native, _ = native.solve_qp_box(p, q, lb)
    x_jax = np.asarray(jax_solve(jnp.asarray(p), jnp.asarray(q), jnp.asarray(lb)).x)
    scale = np.max(np.abs(x_jax))
    assert np.max(np.abs(x_native - x_jax)) < 1e-6 * scale


def test_native_batched_solver_matches_jax():
    """OpenMP-batched native solves agree with the vmapped JAX solver."""
    from hybdrt_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    B, n = 16, 25
    a_ = rng.normal(size=(B, n, n))
    p = a_ @ np.transpose(a_, (0, 2, 1)) + n * np.eye(n)
    q = rng.normal(size=(B, n))
    lb = np.zeros(n)
    x_nat, worst = native.solve_qp_box_batch(p, q, lb)
    assert worst >= 0
    from hybdrt_tpu.ops.qp import solve_qp_box
    x_jax = jax.vmap(lambda pi, qi: solve_qp_box(pi, qi, jnp.asarray(lb)).x)(
        jnp.asarray(p), jnp.asarray(q))
    assert np.max(np.abs(x_nat - np.asarray(x_jax))) < 1e-6
    # KKT: gradient nonneg where clamped, ~0 where free
    for b in range(B):
        g = p[b] @ x_nat[b] + q[b]
        free = x_nat[b] > 1e-12
        assert np.max(np.abs(g[free])) < 1e-6
        assert np.min(g[~free]) > -1e-8
