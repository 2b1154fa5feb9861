"""Pallas TPU kernel (EXPERIMENTAL): batched small-matrix Cholesky
factor + solve, fused so L never leaves VMEM.

Status: numerically correct on TPU (rel err ~2e-7 vs float64 LAPACK at
B=1024, n=93) but currently ~3x SLOWER than XLA's batched Cholesky
(43 ms vs 16 ms per factor+solve on a v5e): the unblocked masked column loop
re-reads the whole (bt, n, n) VMEM tile every column, so it trades the HBM
bottleneck for a VMEM-bandwidth one. It is therefore NOT wired into the QP
solver. Kept as working pallas infrastructure: the path to a win is a blocked
(panel) factorization whose trailing update is an MXU matmul per 8-32 column
panel, cutting VMEM traffic by the block size.

Hard-won mosaic lowering constraints encoded here (each found by crash):
- bool->float converts recurse infinitely in mosaic lowering; use precomputed
  float mask matrices and fetch rows by dynamic slice instead.
- rank-3 values cannot be fori_loop carries (they would need vector
  registers); keep the working matrix in VMEM scratch refs and mutate.
- loop indices/carries must be i32 — with jax_enable_x64 active, python ints
  trace as i64, which mosaic cannot legalize ("func.return" errors); the
  pallas_call is traced under jax.enable_x64(False).

The QPHB interior point factors one (n, n) normal matrix per spectrum per
Mehrotra step, with n ~ 100 and batch ~ 1000. XLA's batched Cholesky at this
shape is HBM-bound: its column/block loop streams the full (B, n, n) tensor
from HBM every step (~16 ms per factor+solve at B=1024, n=93 on a v5e — 30x
slower than an equivalently-shaped matmul). This kernel instead keeps a tile
of matrices resident in VMEM for the entire factorization: HBM traffic drops
from ~2*n*B*n^2 to ~2*B*n^2 (read once, write once) and the masked rank-1
column updates run on the VPU with the batch axis filling the lanes.

The factor and both triangular solves are fused into ONE kernel so L never
round-trips to HBM between substitutions. Column selection uses rows of
precomputed float mask matrices (identity / >= / >) fetched by dynamic slice:
mosaic's lowering of bool->float converts recurses infinitely, so no boolean
mask may be materialized inside the kernel.


SUPERSEDED by ops/pallas_chol_lane.py (batch-as-lane layout), which beats
XLA 6x and is the kernel wired into the QP solver. This file is kept as a
record of the failed layouts and their measured costs.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _chol_solve_kernel(a_ref, b_ref, eye_ref, ge_ref, gt_ref, x_ref,
                       a_s, l_s):
    """Factor a (bt, n, n) tile and solve (L L^T) x = b in VMEM.

    The working matrix and its factor live in VMEM *scratch refs* mutated in
    place — rank-3 values cannot be fori_loop carries (they would have to
    live in vector registers, which mosaic rejects)."""
    bt, n, _ = a_ref.shape
    i32 = jnp.int32

    a_s[...] = a_ref[...]
    l_s[...] = jnp.zeros_like(a_ref[...])
    b = b_ref[...]

    def row(ref, j):
        return ref[pl.ds(j, 1), :]          # (1, n) float mask row

    # ---- Cholesky: masked right-looking column loop -----------------------
    def col_step(j, carry):
        a_cur = a_s[...]
        e_j = row(eye_ref, j)                                  # (1, n)
        col_j = jnp.sum(a_cur * e_j[:, None, :], axis=2)       # (bt, n) = a[:, :, j]
        ajj = jnp.sum(col_j * e_j, axis=1, keepdims=True)      # (bt, 1)
        inv = jnp.where(ajj > 0, jax.lax.rsqrt(jnp.maximum(ajj, 1e-30)), 0.0)
        l_col = col_j * inv * row(ge_ref, j)                   # (bt, n)
        u = l_col * row(gt_ref, j)
        a_s[...] = a_cur - u[:, :, None] * u[:, None, :]
        l_s[...] = l_s[...] + l_col[:, :, None] * e_j[:, None, :]
        return carry

    jax.lax.fori_loop(i32(0), i32(n), col_step, i32(0))

    # ---- Forward substitution: L y = b ------------------------------------
    def fwd_step(j, y):
        e_j = row(eye_ref, j)
        row_j = jnp.sum(l_s[...] * e_j[:, :, None], axis=1)    # (bt, n) = L[:, j, :]
        ljj = jnp.sum(row_j * e_j, axis=1, keepdims=True)      # (bt, 1)
        s = jnp.sum(row_j * y, axis=1, keepdims=True)
        bj = jnp.sum(b * e_j, axis=1, keepdims=True)
        yj = (bj - s) / jnp.where(ljj != 0, ljj, 1.0)
        return y + yj * e_j

    y = jax.lax.fori_loop(i32(0), i32(n), fwd_step, jnp.zeros_like(b))

    # ---- Backward substitution: L^T x = y ----------------------------------
    def bwd_step(k, x):
        j = jnp.asarray(n - 1, jnp.int32) - k
        e_j = row(eye_ref, j)
        colr_j = jnp.sum(l_s[...] * e_j[:, None, :], axis=2)   # (bt, n) = L[:, :, j]
        ljj = jnp.sum(colr_j * e_j, axis=1, keepdims=True)
        s = jnp.sum(colr_j * x, axis=1, keepdims=True)         # (L^T x)_j
        yj = jnp.sum(y * e_j, axis=1, keepdims=True)
        xj = (yj - s) / jnp.where(ljj != 0, ljj, 1.0)
        return x + xj * e_j

    x = jax.lax.fori_loop(i32(0), i32(n), bwd_step, jnp.zeros_like(b))
    x_ref[...] = x


@partial(jax.jit, static_argnames=("block_batch", "interpret"))
def chol_solve_batched(a, b, block_batch=8, interpret=False):
    """x = a^-1 b for a batch of symmetric PD matrices via one fused
    factor+solve pallas kernel. a: (B, n, n); b: (B, n).

    n is padded to a multiple of 128 (TPU lane width) with an identity
    diagonal block — the padded subsystem is decoupled, so the solution of
    the original system is exactly the leading slice.
    """
    bsz, n, _ = a.shape
    dtype = a.dtype
    bt = min(block_batch, bsz)
    # Pad batch to a multiple of the tile
    pad = (-bsz) % bt
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        a = jnp.concatenate([a, eye_pad])
        b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)])
    # Pad the matrix dimension to the hardware lane width
    np_ = 128 * ((n + 127) // 128)
    if np_ != n:
        dn = np_ - n
        a = jnp.pad(a, ((0, 0), (0, dn), (0, dn)))
        diag_idx = jnp.arange(n, np_)
        a = a.at[:, diag_idx, diag_idx].set(1.0)
        b = jnp.pad(b, ((0, 0), (0, dn)))
    grid = (a.shape[0] // bt,)

    idx = np.arange(np_)
    eye = jnp.asarray(np.eye(np_), dtype=dtype)
    ge = jnp.asarray((idx[None, :] >= idx[:, None]).astype(np.float64), dtype=dtype)
    gt = jnp.asarray((idx[None, :] > idx[:, None]).astype(np.float64), dtype=dtype)

    from jax.experimental.pallas import tpu as pltpu
    mask_spec = pl.BlockSpec((np_, np_), lambda i: (0, 0))
    # TPU has no 64-bit integers; with jax_enable_x64 active (this package
    # enables it globally for CPU parity) index arithmetic inside the kernel
    # traces as i64 and mosaic fails to legalize it — trace the kernel with
    # x64 off (all operands are already f32, so nothing changes numerically)
    with jax.enable_x64(False):
        x = pl.pallas_call(
            _chol_solve_kernel,
            out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((bt, np_, np_), lambda i: (i, 0, 0)),
                      pl.BlockSpec((bt, np_), lambda i: (i, 0)),
                      mask_spec, mask_spec, mask_spec],
            out_specs=pl.BlockSpec((bt, np_), lambda i: (i, 0)),
            scratch_shapes=[pltpu.VMEM((bt, np_, np_), dtype),
                            pltpu.VMEM((bt, np_, np_), dtype)],
            interpret=interpret,
        )(a, b, eye, ge, gt)
    return x[:bsz, :n]
