"""Interpret-mode correctness pins for the batch-as-lane Cholesky kernels.

The lane kernels (ops/pallas_chol_lane.py) only dispatch on real TPU
(ops/qp.py _use_lane_kernel), so the CPU suite exercises them ONLY through
pallas interpret mode — these tests are the correctness gate for kernel
changes (e.g. the round-5 triangular banded trailing update, which halves
the bounding VMEM traffic by never updating the never-read upper triangle).

Shapes straddle the chunk=16 band boundary (n < chunk, n == chunk,
n % chunk != 0) and include a lane-padding remainder (B % 128 != 0).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hybdrt_tpu.ops.pallas_chol_lane import (
    chol_factor_lane, chol_factor_solve_lane, chol_solve_factored_lane,
    chol_solve_lane)


def _spd_batch(b, n, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(b, n, n)).astype(np.float32)
    a = g @ np.swapaxes(g, 1, 2) + n * np.eye(n, dtype=np.float32)
    rhs = rng.normal(size=(b, n)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(rhs)


@pytest.mark.parametrize("n", [5, 16, 17, 37])
@pytest.mark.parametrize("b", [4, 130])
def test_chol_solve_lane_matches_dense(n, b):
    a, rhs = _spd_batch(b, n, seed=n + b)
    x = chol_solve_lane(a, rhs, interpret=True)
    x_ref = np.stack([np.linalg.solve(np.asarray(ai), np.asarray(ri))
                      for ai, ri in zip(a, rhs)])
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n", [5, 16, 17, 37])
def test_factor_lower_triangle_matches_lapack(n):
    a, _ = _spd_batch(6, n, seed=n)
    l = chol_factor_lane(a, interpret=True)
    l_ref = np.linalg.cholesky(np.asarray(a).astype(np.float64))
    # contract: only the LOWER triangle of the lane factor is meaningful
    tril = np.tril(np.asarray(l))
    np.testing.assert_allclose(tril, np.tril(l_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n", [5, 17, 37])
def test_factor_solve_and_reuse(n):
    a, rhs = _spd_batch(5, n, seed=3 * n)
    x, l = chol_factor_solve_lane(a, rhs, interpret=True)
    x_ref = np.stack([np.linalg.solve(np.asarray(ai), np.asarray(ri))
                      for ai, ri in zip(a, rhs)])
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=2e-4)
    # the corrector path re-solves against the returned factor
    rhs2 = rhs * 0.5 - 1.0
    x2 = chol_solve_factored_lane(l, rhs2, interpret=True)
    x2_ref = np.stack([np.linalg.solve(np.asarray(ai), np.asarray(ri))
                       for ai, ri in zip(a, rhs2)])
    np.testing.assert_allclose(np.asarray(x2), x2_ref, rtol=2e-4, atol=2e-4)
