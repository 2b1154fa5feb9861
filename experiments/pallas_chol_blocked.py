"""Pallas TPU kernel: BLOCKED batched Cholesky factor + fused solves.

Successor to the unblocked kernel in pallas_chol.py (kept for reference):
that version re-reads the whole (bt, n, n) VMEM tile for every one of n
columns (~4n full-tile passes) and loses to XLA's Cholesky (43 ms vs 12 ms
at B=1024, n=93). This kernel factors nb-column PANELS:

- per-column work inside a panel touches only the (bt, n, nb) panel;
- the trailing update per panel is one batched matmul a -= u @ u^T on the
  MXU;
- the two triangular substitutions are COLUMN-oriented, so they consume one
  L-panel at a time (no full-tile row extractions).

Full-tile passes drop from ~4n to ~5(n/nb) and the O(n^3) FLOPs move onto
the systolic array. Same mosaic constraints as pallas_chol.py: float mask
matrices sliced by row instead of bool masks, VMEM scratch instead of rank-3
loop carries, i32 indices (traced under jax.enable_x64(False)).

Status (measured on v5e, B=1024, n=93): still SLOWER than XLA's batched
Cholesky (57-67 ms vs 12 ms) — with the batch as the leading dim, each
batched dot_general decomposes into per-element (128, 128) x (128, nb)
matmuls that underutilize the MXU, and the mask-matmul panel extraction
costs a full-tile pass per panel. Also note: on real TPU hardware the MXU
runs f32 dot_generals at bf16 precision unless precision=HIGHEST, giving
~2.5e-3 relative error (interpret mode shows 1e-7). NOT wired into the QP
solver. The promising future layout is batch-as-lane ((n, n, B) with static
column indices), which removes both the masks and the small-matmul problem.


SUPERSEDED by ops/pallas_chol_lane.py (batch-as-lane layout), which beats
XLA 6x and is the kernel wired into the QP solver. This file is kept as a
record of the failed layouts and their measured costs.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _make_kernel(nb):
    def kernel(a_ref, b_ref, eye_ref, ge_ref, gt_ref, eyenb_ref, gtnb_ref,
               x_ref, a_s, l_s):
        bt, n, _ = a_ref.shape
        i32 = jnp.int32
        n_panels = n // nb

        a_s[...] = a_ref[...]
        l_s[...] = jnp.zeros_like(a_ref[...])
        b = b_ref[...]

        def rows(ref, j, m):
            return ref[pl.ds(j, m), :]                  # (m, n) float mask rows

        # ---- blocked factorization ----------------------------------------
        def panel_step(k, carry):
            j0 = k * nb
            sel = rows(eye_ref, j0, nb)                 # (nb, n): cols j0..j0+nb-1
            a_cur = a_s[...]
            # panel = a[:, :, j0:j0+nb]
            panel = _dotg(a_cur, sel, (((2,), (1,))))   # (bt, n, nb)

            def col_step(c, panel):
                j = j0 + c
                e_c = rows(eyenb_ref, c, 1)             # (1, nb)
                e_j = rows(eye_ref, j, 1)               # (1, n)
                col = jnp.sum(panel * e_c[:, None, :], axis=2)        # (bt, n)
                ajj = jnp.sum(col * e_j, axis=1, keepdims=True)       # (bt, 1)
                inv = jnp.where(ajj > 0, jax.lax.rsqrt(jnp.maximum(ajj, 1e-30)), 0.0)
                l_col = col * inv * rows(ge_ref, j, 1)                # (bt, n)
                u = l_col * rows(gt_ref, j, 1)                        # below pivot
                # u restricted to the panel's own rows -> (bt, nb)
                lrow = _dotg(u, sel, (((1,), (1,))))
                # update panel columns to the right of c
                gtc = rows(gtnb_ref, c, 1)                            # (1, nb)
                panel = panel - u[:, :, None] * (lrow * gtc)[:, None, :]
                # store the factored column c
                panel = panel * (1.0 - e_c)[:, None, :] \
                    + l_col[:, :, None] * e_c[:, None, :]
                return panel

            panel = jax.lax.fori_loop(i32(0), i32(nb), col_step, panel)

            # scatter factored panel into L: l[:, :, j0:j0+nb] = panel
            l_s[...] = l_s[...] + _dotg(panel, sel, (((2,), (0,))))

            # trailing update: a[j1:, j1:] -= u @ u^T, u = panel rows > j0+nb-1
            gt_end = rows(gt_ref, j0 + nb - 1, 1)       # (1, n)
            u_all = panel * gt_end[0][None, :, None]
            upd = jax.lax.dot_general(u_all, u_all, (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            a_s[...] = a_cur - upd
            return carry

        jax.lax.fori_loop(i32(0), i32(n_panels), panel_step, i32(0))
        l = l_s[...]

        # ---- forward substitution, column-oriented: L y = b ----------------
        # r holds the running residual; y_j = r_j / L[j,j]; r -= y_j L[:, j]
        def fwd_panel(k, carry):
            y, r = carry
            j0 = k * nb
            sel = rows(eye_ref, j0, nb)
            lp = _dotg(l, sel, (((2,), (1,))))          # (bt, n, nb)

            def fwd_col(c, carry):
                y, r = carry
                j = j0 + c
                e_c = rows(eyenb_ref, c, 1)
                e_j = rows(eye_ref, j, 1)
                colL = jnp.sum(lp * e_c[:, None, :], axis=2)   # (bt, n) = L[:, :, j]
                ljj = jnp.sum(colL * e_j, axis=1, keepdims=True)
                rj = jnp.sum(r * e_j, axis=1, keepdims=True)
                yj = rj / jnp.where(ljj != 0, ljj, 1.0)
                r = r - yj * colL * rows(gt_ref, j, 1)
                return y + yj * e_j, r

            return jax.lax.fori_loop(i32(0), i32(nb), fwd_col, (y, r))

        y, _ = jax.lax.fori_loop(i32(0), i32(n_panels), fwd_panel,
                                 (jnp.zeros_like(b), b))

        # ---- backward substitution, column-oriented: L^T x = y -------------
        # x_j = (y_j - colL . x) / L[j,j]  (colL zero above j; x_j still 0)
        def bwd_panel(kk, x):
            k = n_panels - 1 - kk
            j0 = k * nb
            sel = rows(eye_ref, j0, nb)
            lp = _dotg(l, sel, (((2,), (1,))))          # (bt, n, nb)

            def bwd_col(cc, x):
                c = nb - 1 - cc
                j = j0 + c
                e_c = rows(eyenb_ref, c, 1)
                e_j = rows(eye_ref, j, 1)
                colL = jnp.sum(lp * e_c[:, None, :], axis=2)
                ljj = jnp.sum(colL * e_j, axis=1, keepdims=True)
                s = jnp.sum(colL * x, axis=1, keepdims=True)
                yj = jnp.sum(y * e_j, axis=1, keepdims=True)
                xj = (yj - s) / jnp.where(ljj != 0, ljj, 1.0)
                return x + xj * e_j

            return jax.lax.fori_loop(i32(0), i32(nb), bwd_col, x)

        x = jax.lax.fori_loop(i32(0), i32(n_panels), bwd_panel, jnp.zeros_like(b))
        x_ref[...] = x

    return kernel


@partial(jax.jit, static_argnames=("block_batch", "nb", "interpret"))
def chol_solve_blocked(a, b, block_batch=8, nb=16, interpret=False):
    """x = a^-1 b for a batch of symmetric PD matrices via one fused blocked
    factor+solve pallas kernel. a: (B, n, n); b: (B, n). n is padded to a
    multiple of 128 with a decoupled identity block."""
    from jax.experimental.pallas import tpu as pltpu
    bsz, n, _ = a.shape
    dtype = a.dtype
    bt = min(block_batch, bsz)
    pad = (-bsz) % bt
    if pad:
        eye_pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        a = jnp.concatenate([a, eye_pad])
        b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)])
    np_ = 128 * ((n + 127) // 128)
    if np_ != n:
        dn = np_ - n
        a = jnp.pad(a, ((0, 0), (0, dn), (0, dn)))
        diag_idx = jnp.arange(n, np_)
        a = a.at[:, diag_idx, diag_idx].set(1.0)
        b = jnp.pad(b, ((0, 0), (0, dn)))
    if np_ % nb:
        raise ValueError(f"nb={nb} must divide the padded size {np_}")
    grid = (a.shape[0] // bt,)

    idx = np.arange(np_)
    eye = jnp.asarray(np.eye(np_), dtype=dtype)
    ge = jnp.asarray((idx[None, :] >= idx[:, None]).astype(float), dtype=dtype)
    gt = jnp.asarray((idx[None, :] > idx[:, None]).astype(float), dtype=dtype)
    idnb = np.arange(nb)
    eyenb = jnp.asarray(np.eye(nb), dtype=dtype)
    gtnb = jnp.asarray((idnb[None, :] > idnb[:, None]).astype(float), dtype=dtype)

    nn_spec = pl.BlockSpec((np_, np_), lambda i: (0, 0))
    nb_spec = pl.BlockSpec((nb, nb), lambda i: (0, 0))
    with jax.enable_x64(False):
        x = pl.pallas_call(
            _make_kernel(nb),
            out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((bt, np_, np_), lambda i: (i, 0, 0)),
                      pl.BlockSpec((bt, np_), lambda i: (i, 0)),
                      nn_spec, nn_spec, nn_spec, nb_spec, nb_spec],
            out_specs=pl.BlockSpec((bt, np_), lambda i: (i, 0)),
            scratch_shapes=[pltpu.VMEM((bt, np_, np_), dtype),
                            pltpu.VMEM((bt, np_, np_), dtype)],
            interpret=interpret,
        )(a, b, eye, ge, gt, eyenb, gtnb)
    return x[:bsz, :n]
