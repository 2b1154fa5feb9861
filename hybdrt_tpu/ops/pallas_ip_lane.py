"""Pallas TPU kernel: fused Mehrotra interior-point steps, batch-as-lane.

Promoted from experiments/pallas_ip_loop.py (measurements there). One
128-lane block's QP matrices P stay resident in VMEM while ALL n_steps
Mehrotra predictor-corrector steps run inside the kernel: H = P + diag(z/s)
assembly, in-place Cholesky (Newton-refined rsqrt pivots, as
pallas_chol_lane.py), predictor + corrector substitutions, step lengths, and
per-lane NaN freeze guards — no HBM round trips between steps. Replaces the
per-step chain of XLA ops + factor/solve kernel launches in the warm-started
QP path (ops/qp.py solve_qp_box(fused_steps=...), reference hot loop
hybdrt/models/qphb.py:426-519).

Layout follows ops/pallas_chol_lane.py: batch rides the 128-wide lane
dimension, all row/column indices static, the step loop is a lax.fori_loop
so the unrolled-column Cholesky compiles once.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _refined_rsqrt(x):
    r = jax.lax.rsqrt(jnp.maximum(x, 1e-30))
    r = r * (1.5 - 0.5 * jnp.maximum(x, 1e-30) * r * r)
    return jnp.where(x > 0, r, jnp.nan)


def _make_ip_kernel(n, n_steps, row_chunk=16):
    """Kernel refs:
    p_ref (n,n,L) | q_ref, lb_ref (n,L) | x0,s0,z0 (n,L)
    outputs: x_ref, s_ref, z_ref (n,L)
    scratch: h_s (n,n,L); vec scratches (n,L): y_s, dxa_s, dsa_s, dza_s,
             rd_s, rp_s, d_s, dx_s; done_s (1,L)
    """

    def matvec(p_ref, v, out_s):
        # out = P @ v per lane, chunked over rows to bound the temporary
        for i0 in range(0, n, row_chunk):
            i1 = min(i0 + row_chunk, n)
            out_s[i0:i1, :] = jnp.sum(p_ref[i0:i1, :, :] * v[None, :, :],
                                      axis=1)

    def factor_inplace(h_s):
        for j in range(n):
            ajj = h_s[j, j:j + 1, :]
            inv = _refined_rsqrt(ajj)
            col = h_s[j:, j, :] * inv
            h_s[j:, j, :] = col
            if j + 1 < n:
                # triangular banded trailing update (pallas_chol_lane.py):
                # only the lower triangle is ever read — the next step's
                # H assembly overwrites h_s from p_ref wholesale — so the
                # band's column span stops at its last row, halving traffic
                for i0 in range(j + 1, n, row_chunk):
                    i1 = min(i0 + row_chunk, n)
                    u_rows = h_s[i0:i1, j, :]
                    u_cols = h_s[j + 1:i1, j, :]
                    h_s[i0:i1, j + 1:i1, :] = (h_s[i0:i1, j + 1:i1, :]
                                               - u_rows[:, None, :]
                                               * u_cols[None, :, :])

    def solve_factored(h_s, rhs, y_s, out_s):
        # L y = rhs (forward), L^T x = y (backward); out_s may alias rhs mem
        out_s[...] = rhs
        for j in range(n):
            yj = out_s[j:j + 1, :] / h_s[j, j:j + 1, :]
            y_s[j:j + 1, :] = yj
            if j + 1 < n:
                out_s[j + 1:, :] = out_s[j + 1:, :] - yj * h_s[j + 1:, j, :]
        for j in range(n - 1, -1, -1):
            if j + 1 < n:
                sj = jnp.sum(h_s[j + 1:, j, :] * out_s[j + 1:, :], axis=0,
                             keepdims=True)
            else:
                sj = jnp.zeros_like(out_s[j:j + 1, :])
            out_s[j:j + 1, :] = (y_s[j:j + 1, :] - sj) / h_s[j, j:j + 1, :]

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.min(ratio, axis=0, keepdims=True)  # (1, L)

    def kernel(p_ref, q_ref, lb_ref, x0_ref, s0_ref, z0_ref,
               x_ref, s_ref, z_ref,
               h_s, y_s, dxa_s, dsa_s, dza_s, rd_s, rp_s, d_s, dx_s, done_s):
        lanes = q_ref.shape[1]
        dtype = q_ref.dtype
        x_ref[...] = x0_ref[...]
        s_ref[...] = s0_ref[...]
        z_ref[...] = z0_ref[...]
        done_s[...] = jnp.zeros((1, lanes), dtype)
        tiny = jnp.asarray(1e-25, dtype)

        def step(_, carry):
            x = x_ref[...]
            s = s_ref[...]
            z = z_ref[...]
            d_s[...] = z / s
            # r_d = P x + q - z
            matvec(p_ref, x, rd_s)
            rd_s[...] = rd_s[...] + q_ref[...] - z
            rp_s[...] = s - (x - lb_ref[...])
            mu = jnp.sum(s * z, axis=0, keepdims=True) / n

            # H = P + diag(d), factored in place
            h_s[...] = p_ref[...]
            for j in range(n):
                h_s[j, j, :] = h_s[j, j, :] + d_s[j, :]
            factor_inplace(h_s)

            # predictor
            dxa_s[...] = -rd_s[...] - z + d_s[...] * rp_s[...]
            solve_factored(h_s, dxa_s[...], y_s, dxa_s)
            dsa_s[...] = dxa_s[...] - rp_s[...]
            dza_s[...] = -z - d_s[...] * dsa_s[...]
            a_p = jnp.minimum(1.0, max_step(s, dsa_s[...]))
            a_d = jnp.minimum(1.0, max_step(z, dza_s[...]))
            mu_aff = jnp.sum((s + a_p * dsa_s[...]) * (z + a_d * dza_s[...]),
                             axis=0, keepdims=True) / n
            sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
            sigma = jnp.clip(sigma, 0.0, 1.0)

            # corrector (reuses the factor)
            r_c = s * z + dsa_s[...] * dza_s[...] - sigma * mu
            dx_s[...] = -rd_s[...] - r_c / s + d_s[...] * rp_s[...]
            solve_factored(h_s, dx_s[...], y_s, dx_s)
            ds = dx_s[...] - rp_s[...]
            dz = -r_c / s - d_s[...] * ds

            a_p = jnp.minimum(1.0, 0.99 * max_step(s, ds))
            a_d = jnp.minimum(1.0, 0.99 * max_step(z, dz))
            x_new = x + a_p * dx_s[...]
            s_new = jnp.maximum(s + a_p * ds, tiny)
            z_new = jnp.maximum(z + a_d * dz, tiny)

            finite = (jnp.sum(jnp.isfinite(x_new).astype(dtype), axis=0,
                              keepdims=True)
                      + jnp.sum(jnp.isfinite(z_new).astype(dtype), axis=0,
                                keepdims=True)) >= 2 * n
            frozen = (done_s[...] > 0) | (~finite)
            x_ref[...] = jnp.where(frozen, x, x_new)
            s_ref[...] = jnp.where(frozen, s, s_new)
            z_ref[...] = jnp.where(frozen, z, z_new)
            done_s[...] = jnp.where(frozen, jnp.ones_like(done_s[...]),
                                    done_s[...])
            return carry

        jax.lax.fori_loop(0, n_steps, step, 0)

    return kernel


@partial(jax.jit, static_argnames=("n_steps", "lanes", "interpret"))
def ip_steps_lane(p, q, lb, x0, s0, z0, n_steps=8, lanes=128,
                  interpret=False):
    """Run n_steps fused Mehrotra steps for a batch of box QPs.

    p: (B, n, n) equilibrated SPD; q, lb, x0, s0, z0: (B, n).
    Returns (x, s, z) after the fixed step count (lanes with a non-finite
    step freeze at their last good iterate, like the production solver)."""
    bsz, n, _ = p.shape
    dtype = p.dtype
    pad = (-bsz) % lanes
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        p = jnp.concatenate([p, eye_pad])
        pad_vec = jnp.ones((pad, n), dtype=dtype)
        q = jnp.concatenate([q, pad_vec])
        lb = jnp.concatenate([lb, jnp.zeros((pad, n), dtype=dtype)])
        x0 = jnp.concatenate([x0, pad_vec])
        s0 = jnp.concatenate([s0, pad_vec])
        z0 = jnp.concatenate([z0, pad_vec])
    bsz_p = p.shape[0]
    p_t = jnp.transpose(p, (1, 2, 0))
    vec_t = lambda v: jnp.transpose(v, (1, 0))
    vspec = pl.BlockSpec((n, lanes), lambda i: (0, i))

    with jax.enable_x64(False):
        x_t, s_t, z_t = pl.pallas_call(
            _make_ip_kernel(n, n_steps),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=[jax.ShapeDtypeStruct((n, bsz_p), dtype)] * 3,
            grid=(bsz_p // lanes,),
            in_specs=[pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i)),
                      vspec, vspec, vspec, vspec, vspec],
            out_specs=[vspec, vspec, vspec],
            scratch_shapes=[pltpu.VMEM((n, n, lanes), dtype)]
            + [pltpu.VMEM((n, lanes), dtype)] * 8
            + [pltpu.VMEM((1, lanes), dtype)],
            interpret=interpret,
        )(p_t, vec_t(q), vec_t(lb), vec_t(x0), vec_t(s0), vec_t(z0))
    un = lambda v: jnp.transpose(v, (1, 0))[:bsz]
    return un(x_t), un(s_t), un(z_t)


