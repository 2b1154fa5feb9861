"""Panel-blocked variant of the batch-as-lane Cholesky factor+solve kernel.

Hypothesis: the per-column trailing rank-1 updates re-traverse the VMEM
block ~n times; applying a kb-column panel's updates in one pass should cut
traffic by ~kb.

Measured on v5e (B=1024, n=93, in-scan ms/call):
  unblocked 0.696 | kb=4 0.767 | kb=8 0.873 | kb=16 0.861

The blocked form is SLOWER: mosaic materializes each term of the
sum-of-rank-1 accumulation as a full (m, m, lanes) VMEM temporary, so the
panel update costs ~1.5x the traffic of the fused per-column updates
instead of 1/kb. The production kernel (ops/pallas_chol_lane.py) stays
per-column; at 0.7 ms it runs at ~1.6 TB/s effective VMEM bandwidth —
near the hardware limit, and 18x faster than XLA's batched Cholesky
(12.5 ms) at this shape. NOT wired in.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hybdrt_tpu.ops.pallas_chol_lane import _refined_rsqrt

def _make_factor_solve_kernel_blocked(n, kb):
    """Panel-blocked variant of _make_factor_solve_kernel: the trailing
    update applies all kb rank-1 terms of a panel in ONE fused traversal of
    the trailing block, cutting the O(n^3 * lanes) VMEM traffic of the
    per-column updates by ~kb (the elementwise product chain fuses into a
    single read+write of the block)."""
    def kernel(a_ref, b_ref, x_ref, l_ref, y_s):
        l_ref[...] = a_ref[...]
        for j0 in range(0, n, kb):
            j1 = min(j0 + kb, n)
            # Factor the panel; rank-1 updates touch only within-panel cols
            for j in range(j0, j1):
                ajj = l_ref[j, j:j + 1, :]
                inv = _refined_rsqrt(ajj)
                col = l_ref[j:, j, :] * inv
                l_ref[j:, j, :] = col
                if j + 1 < j1:
                    u = col[1:]                     # rows j+1..n
                    v = col[1:j1 - j]               # rows j+1..j1
                    blk = l_ref[j + 1:, j + 1:j1, :]
                    l_ref[j + 1:, j + 1:j1, :] = \
                        blk - u[:, None, :] * v[None, :, :]
            # One fused multi-rank trailing update for columns >= j1
            if j1 < n:
                cols = [l_ref[j1:, j, :] for j in range(j0, j1)]
                upd = cols[0][:, None, :] * cols[0][None, :, :]
                for c in cols[1:]:
                    upd = upd + c[:, None, :] * c[None, :, :]
                l_ref[j1:, j1:, :] = l_ref[j1:, j1:, :] - upd

        # Substitutions identical to the unblocked kernel
        x_ref[...] = b_ref[...]
        for j in range(n):
            yj = x_ref[j:j + 1, :] / l_ref[j, j:j + 1, :]
            y_s[j:j + 1, :] = yj
            if j + 1 < n:
                x_ref[j + 1:, :] = x_ref[j + 1:, :] - yj * l_ref[j + 1:, j, :]
        for j in range(n - 1, -1, -1):
            if j + 1 < n:
                sj = jnp.sum(l_ref[j + 1:, j, :] * x_ref[j + 1:, :], axis=0,
                             keepdims=True)
            else:
                sj = jnp.zeros((1, b_ref.shape[1]), b_ref.dtype)
            x_ref[j:j + 1, :] = (y_s[j:j + 1, :] - sj) / l_ref[j, j:j + 1, :]
    return kernel


@partial(jax.jit, static_argnames=("lanes", "kb", "interpret"))
def chol_factor_solve_lane_blocked(a, b, lanes=128, kb=8, interpret=False):
    """Panel-blocked chol_factor_solve_lane (same contract): (x, l)."""
    bsz, n, _ = a.shape
    dtype = a.dtype
    pad = (-bsz) % lanes
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        a = jnp.concatenate([a, eye_pad])
        b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)])
    a_t = jnp.transpose(a, (1, 2, 0))
    b_t = jnp.transpose(b, (1, 0))
    bsz_p = a_t.shape[-1]
    with jax.enable_x64(False):
        x_t, l_t = pl.pallas_call(
            _make_factor_solve_kernel_blocked(n, kb),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=[jax.ShapeDtypeStruct((n, bsz_p), dtype),
                       jax.ShapeDtypeStruct((n, n, bsz_p), dtype)],
            grid=(bsz_p // lanes,),
            in_specs=[pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i)),
                      pl.BlockSpec((n, lanes), lambda i: (0, i))],
            out_specs=[pl.BlockSpec((n, lanes), lambda i: (0, i)),
                       pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i))],
            scratch_shapes=[pltpu.VMEM((n, lanes), dtype)],
            input_output_aliases={0: 1},
            interpret=interpret,
        )(a_t, b_t)
    return jnp.transpose(x_t, (1, 0))[:bsz], jnp.transpose(l_t, (2, 0, 1))[:bsz]
