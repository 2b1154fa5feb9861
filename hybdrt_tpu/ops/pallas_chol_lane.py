"""Pallas TPU kernel: batched Cholesky with BATCH AS THE LANE DIMENSION.

Third iteration of the batched small-matrix Cholesky kernel (see
pallas_chol.py and pallas_chol_blocked.py for the failed batch-leading
layouts and the mosaic pitfalls they documented). Key idea: lay the tile out
as (n, n, 128) with 128 spectra in the lane dimension. Then:

- every column index is STATIC (a python loop unrolled over n columns), so
  there are no mask matrices and no dynamic slices at all;
- each rank-1 trailing update is a dense (n-j-1, n-j-1, 128) elementwise
  VPU op with all 128 lanes doing useful work — zero padding waste for any n;
- the factorization is in-place in a single VMEM scratch (the factored
  column overwrites the working matrix), so HBM traffic is one read + the
  solve output;
- the fused forward/backward substitutions operate on (n, 128) values with
  static row indexing.

FLOPs are the textbook n^3/3 per matrix (no 3x mask overhead), all on the
VPU at full lane occupancy.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _refined_rsqrt(x):
    """NaN-guarded rsqrt with one Newton refinement step.

    The TPU VPU rsqrt is a low-precision hardware approximation; the Newton
    step x -> r(1.5 - 0.5 x r^2) restores ~full float32 accuracy, which the
    Cholesky pivots of ill-conditioned QP systems require. Non-positive
    pivots return NaN (LAPACK-potrf-failure semantics) so the interior
    point's bad-step guard can catch them."""
    r = jax.lax.rsqrt(jnp.maximum(x, 1e-30))
    r = r * (1.5 - 0.5 * jnp.maximum(x, 1e-30) * r * r)
    return jnp.where(x > 0, r, jnp.nan)


def _make_kernel(n):
    def kernel(a_ref, b_ref, x_ref, a_s, r_s, y_s):
        # a_ref/a_s: (n, n, lanes); b_ref/x_ref/r_s/y_s: (n, lanes).
        # All row updates are static-slice stores into scratch refs
        # (dynamic_update_slice on values is not lowered by mosaic).
        a_s[...] = a_ref[...]

        # ---- in-place Cholesky, static column loop -------------------------
        # The rank-1 trailing update is banded into fixed-height row chunks
        # whose column span stops at the band's last row: everything the
        # factorization (and the solves below) ever reads is the LOWER
        # triangle, so updating only ceil-to-band of it halves the VMEM
        # traffic of the full-block update — which is what bounds this
        # kernel (experiments/vmem_sol.py). Elements above the diagonal
        # inside a band receive partial updates and are never read.
        chunk = 16
        for j in range(n):
            ajj = a_s[j, j:j + 1, :]                    # (1, lanes)
            inv = _refined_rsqrt(ajj)
            col = a_s[j:, j, :] * inv                   # (n-j, lanes) = L[j:, j]
            a_s[j:, j, :] = col
            for i0 in range(j + 1, n, chunk):
                i1 = min(i0 + chunk, n)
                u_rows = a_s[i0:i1, j, :]               # (i1-i0, lanes)
                u_cols = a_s[j + 1:i1, j, :]            # (i1-j-1, lanes)
                blk = a_s[i0:i1, j + 1:i1, :]
                a_s[i0:i1, j + 1:i1, :] = (
                    blk - u_rows[:, None, :] * u_cols[None, :, :])

        # ---- forward substitution: L y = b (column-oriented) ---------------
        r_s[...] = b_ref[...]
        for j in range(n):
            yj = r_s[j:j + 1, :] / a_s[j, j:j + 1, :]   # (1, lanes)
            y_s[j:j + 1, :] = yj
            if j + 1 < n:
                r_s[j + 1:, :] = r_s[j + 1:, :] - yj * a_s[j + 1:, j, :]

        # ---- backward substitution: L^T x = y (column-oriented) ------------
        # reuse r_s as the solution buffer for x
        for j in range(n - 1, -1, -1):
            if j + 1 < n:
                s = jnp.sum(a_s[j + 1:, j, :] * r_s[j + 1:, :], axis=0,
                            keepdims=True)
            else:
                s = jnp.zeros((1, b_ref.shape[1]), b_ref.dtype)
            r_s[j:j + 1, :] = (y_s[j:j + 1, :] - s) / a_s[j, j:j + 1, :]

        x_ref[...] = r_s[...]

    return kernel


@partial(jax.jit, static_argnames=("lanes", "interpret"))
def chol_solve_lane(a, b, lanes=128, interpret=False):
    """x = a^-1 b for a batch of symmetric PD matrices; batch-as-lane pallas
    kernel. a: (B, n, n); b: (B, n). B is padded to a multiple of `lanes`."""
    bsz, n, _ = a.shape
    dtype = a.dtype
    pad = (-bsz) % lanes
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        a = jnp.concatenate([a, eye_pad])
        b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)])
    bsz_p = a.shape[0]
    # (B, n, n) -> (n, n, B) so the batch rides the lane dimension
    a_t = jnp.transpose(a, (1, 2, 0))
    b_t = jnp.transpose(b, (1, 0))
    grid = (bsz_p // lanes,)

    with jax.enable_x64(False):
        x_t = pl.pallas_call(
            _make_kernel(n),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((n, bsz_p), dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i)),
                      pl.BlockSpec((n, lanes), lambda i: (0, i))],
            out_specs=pl.BlockSpec((n, lanes), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((n, n, lanes), dtype),
                            pltpu.VMEM((n, lanes), dtype),
                            pltpu.VMEM((n, lanes), dtype)],
            interpret=interpret,
        )(a_t, b_t)
    return jnp.transpose(x_t, (1, 0))[:bsz]


def _make_factor_kernel(n):
    def kernel(a_ref, l_ref):
        # Factor in place in the OUTPUT ref — no scratch, which keeps the
        # kernel inside the scoped-VMEM budget (in-block is double-buffered
        # by the pipeline, so every extra (n, n, lanes) buffer counts)
        l_ref[...] = a_ref[...]
        # Chunk the trailing rank-1 update into fixed-height row bands (the
        # unrolled column loop otherwise keeps several O(n^2 * lanes)
        # temporaries live at once and blows the scoped-VMEM budget), and
        # stop each band's column span at its last row: only the lower
        # triangle is ever read, so the triangular band update halves the
        # VMEM traffic that bounds this kernel (experiments/vmem_sol.py)
        chunk = 16
        for j in range(n):
            ajj = l_ref[j, j:j + 1, :]
            inv = _refined_rsqrt(ajj)
            col = l_ref[j:, j, :] * inv
            l_ref[j:, j, :] = col
            # the stale upper triangle is never read by the solve kernel
            for i0 in range(j + 1, n, chunk):
                i1 = min(i0 + chunk, n)
                u_rows = l_ref[i0:i1, j, :]             # (i1-i0, lanes)
                u_cols = l_ref[j + 1:i1, j, :]          # (i1-j-1, lanes)
                blk = l_ref[i0:i1, j + 1:i1, :]
                l_ref[i0:i1, j + 1:i1, :] = (
                    blk - u_rows[:, None, :] * u_cols[None, :, :])
    return kernel


def _make_solve_kernel(n):
    def kernel(l_ref, b_ref, x_ref, y_s):
        # use the output ref as the residual/solution buffer
        x_ref[...] = b_ref[...]
        for j in range(n):
            yj = x_ref[j:j + 1, :] / l_ref[j, j:j + 1, :]
            y_s[j:j + 1, :] = yj
            if j + 1 < n:
                x_ref[j + 1:, :] = x_ref[j + 1:, :] - yj * l_ref[j + 1:, j, :]
        for j in range(n - 1, -1, -1):
            if j + 1 < n:
                s = jnp.sum(l_ref[j + 1:, j, :] * x_ref[j + 1:, :], axis=0,
                            keepdims=True)
            else:
                s = jnp.zeros((1, b_ref.shape[1]), b_ref.dtype)
            x_ref[j:j + 1, :] = (y_s[j:j + 1, :] - s) / l_ref[j, j:j + 1, :]
    return kernel


@partial(jax.jit, static_argnames=("lanes", "interpret"))
def chol_factor_lane(a, lanes=128, interpret=False):
    """Batched Cholesky factor (lower triangle valid; upper = leftover input).
    a: (B, n, n) -> (B, n, n)."""
    bsz, n, _ = a.shape
    dtype = a.dtype
    pad = (-bsz) % lanes
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        a = jnp.concatenate([a, eye_pad])
    a_t = jnp.transpose(a, (1, 2, 0))
    bsz_p = a_t.shape[-1]
    with jax.enable_x64(False):
        l_t = pl.pallas_call(
            _make_factor_kernel(n),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((n, n, bsz_p), dtype),
            grid=(bsz_p // lanes,),
            in_specs=[pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i))],
            out_specs=pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i)),
            # a_t is a fresh transpose, safe to donate; aliasing halves the
            # kernel's VMEM footprint (in+out double buffers otherwise exceed
            # the 16M scoped budget at n ~ 93, lanes=128)
            input_output_aliases={0: 0},
            interpret=interpret,
        )(a_t)
    return jnp.transpose(l_t, (2, 0, 1))[:bsz]


@partial(jax.jit, static_argnames=("lanes", "interpret"))
def chol_solve_factored_lane(l, b, lanes=128, interpret=False):
    """Solve (L L^T) x = b from a chol_factor_lane factor. l: (B, n, n),
    b: (B, n)."""
    bsz, n, _ = l.shape
    dtype = l.dtype
    pad = (-bsz) % lanes
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        l = jnp.concatenate([l, eye_pad])
        b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)])
    l_t = jnp.transpose(l, (1, 2, 0))
    b_t = jnp.transpose(b, (1, 0))
    bsz_p = l_t.shape[-1]
    with jax.enable_x64(False):
        x_t = pl.pallas_call(
            _make_solve_kernel(n),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((n, bsz_p), dtype),
            grid=(bsz_p // lanes,),
            in_specs=[pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i)),
                      pl.BlockSpec((n, lanes), lambda i: (0, i))],
            out_specs=pl.BlockSpec((n, lanes), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((n, lanes), dtype)],
            interpret=interpret,
        )(l_t, b_t)
    return jnp.transpose(x_t, (1, 0))[:bsz]


def _make_factor_solve_kernel(n):
    def kernel(a_ref, b_ref, x_ref, l_ref, y_s):
        """Factor a into l_ref (aliased with the input block) and solve one
        rhs. Returning L lets the caller run further solves without
        re-factoring (the Mehrotra corrector reuses the predictor's factor).
        """
        l_ref[...] = a_ref[...]
        # triangular banded trailing update (see _make_factor_kernel): only
        # the lower triangle is ever read, halving the bounding VMEM traffic
        chunk = 16
        for j in range(n):
            ajj = l_ref[j, j:j + 1, :]
            inv = _refined_rsqrt(ajj)
            col = l_ref[j:, j, :] * inv
            l_ref[j:, j, :] = col
            for i0 in range(j + 1, n, chunk):
                i1 = min(i0 + chunk, n)
                u_rows = l_ref[i0:i1, j, :]
                u_cols = l_ref[j + 1:i1, j, :]
                blk = l_ref[i0:i1, j + 1:i1, :]
                l_ref[i0:i1, j + 1:i1, :] = (
                    blk - u_rows[:, None, :] * u_cols[None, :, :])
        # forward then backward substitution (x_ref doubles as the residual)
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


@partial(jax.jit, static_argnames=("lanes", "interpret"))
def chol_factor_solve_lane(a, b, lanes=128, interpret=False):
    """(x, l) = (a^-1 b, chol(a)) in one kernel; the input is donated to the
    factor output so the kernel stays inside the scoped-VMEM budget.
    a: (B, n, n); b: (B, n). l's upper triangle holds leftover input."""
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
            _make_factor_solve_kernel(n),
            # the 16M default scoped-VMEM limit is conservative; in+out
            # double buffers for two (n, n, lanes) blocks need ~18M at n~93
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

