"""End-to-end QPHB fit loop as a single jittable XLA computation.

The reference drives the fit with a python while loop around cvxopt calls
(reference hybdrt/models/drt1d.py:877-988). Here the entire self-tuning outer
loop — iteration-0 ridge normalization, hybrid weight factoring, vz-offset
column rewrites, and convergence — is a lax.while_loop over pure-jnp state, so
one fit is one XLA program and a batch of fits is a vmap of it.
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import qphb
from .qphb import QPHBConfig, QPHBState


class FitConfig(NamedTuple):
    """Static fit-loop configuration."""
    cfg: QPHBConfig
    data_type: str = "eis"          # 'eis' | 'chrono' | 'hybrid'
    num_chrono: int = 0
    vz_offset: bool = False
    vz_index: int = -1
    # Scaled-background mode (reference drt1d.py:383-384,964-970): a
    # 'background_scale' special column is rewritten each outer iteration
    # with the GP-filtered chrono residual
    bkg_scaled: bool = False
    bkg_index: int = -1
    max_iter: int = 50
    x_rtol: float = 1e-2
    max_hp_iter: int = 1
    qp_max_iter: int = 60
    # Cap Mehrotra steps for warm-started (it>0) QP solves; bounds the
    # batch-straggler cost under vmap. None = same as qp_max_iter.
    qp_max_iter_warm: Optional[int] = None
    # Warm-continuation mode (reference drt1d.py:1270 _continue_from_init):
    # keep xmx_norms fixed, apply weight_factor from iteration 0, and require
    # min_iter iterations before convergence can stop the loop
    continue_mode: bool = False
    min_iter: int = 2
    # Opt-in data-space stopping criterion (default OFF for parity with the
    # reference's x-space check, hybdrt/models/qphb.py:597-604): also accept
    # "prediction settled" — the weight-scaled RMS change between this
    # iteration's prediction and the one two iterations back falls below
    # pred_rtol. Catches the benign period-2 hyperparameter limit cycles
    # whose predictions stopped moving long before the iteration budget
    # (proven benign in tests/test_parallel.py) without burning the budget.
    pred_stop: bool = False
    pred_rtol: float = 1e-2
    # Fused warm QP path: peel iteration 0 out of the while_loop (cold solve)
    # and run every later iteration's warm QP as qp_max_iter_warm FIXED
    # Mehrotra steps in one pallas kernel per 128-lane block
    # (ops/pallas_ip_lane.py). Opt-in; default OFF keeps the adaptive
    # while_loop solver bit-for-bit.
    qp_fused: bool = False


class FitCarry(NamedTuple):
    state: QPHBState
    rzm: jnp.ndarray
    # Prediction history for pred_stop (None when disabled): y_prev is the
    # previous iteration's prediction, y_prev2 the one before it
    y_prev: Optional[jnp.ndarray] = None
    y_prev2: Optional[jnp.ndarray] = None


def _loop_body(carry: FitCarry, rzv, vmm, m_stack, dop_gmat, l1v, lb, est_weights,
               rzm_vz, vz_strength_vec, chrono_weight_factor, eis_weight_factor,
               weight_factor, hyp, fcfg: FitConfig, nl_cross=None, rm_bkg=None,
               col_mask=None, var_floor=None, row_factors=None, vz_sign=None,
               row_mask=None, warm_mode="auto"):
    st, rzm = carry.state, carry.rzm
    y_prev, y_prev2 = carry.y_prev, carry.y_prev2
    nc = fcfg.num_chrono

    weights = st.weights
    if row_factors is not None:
        # Ragged batches: per-row chrono/EIS weight factors precomputed per
        # observation (row counts are data, not static)
        weights = weights * row_factors
    elif fcfg.data_type == "hybrid":
        factors = jnp.concatenate([
            jnp.full((nc,), 1.0) * chrono_weight_factor,
            jnp.full((rzv.shape[0] - nc,), 1.0) * eis_weight_factor,
        ])
        weights = weights * factors
    # Global weight factor applies from the second iteration in a fresh fit
    # (reference drt1d.py:891-892) but from iteration 0 in continuation mode
    if fcfg.continue_mode:
        weights = weights * weight_factor
    else:
        weights = jnp.where(st.it > 0, weights * weight_factor, weights)
    st_in = st._replace(weights=weights)

    st_new, _ = qphb.iterate_qphb(st_in, rzv, rzm, vmm, m_stack, m_stack[1], dop_gmat,
                                  l1v, lb, est_weights, hyp, fcfg.cfg,
                                  x_rtol=fcfg.x_rtol, max_hp_iter=fcfg.max_hp_iter,
                                  qp_max_iter=fcfg.qp_max_iter,
                                  qp_max_iter_warm=fcfg.qp_max_iter_warm,
                                  nl_cross=nl_cross, col_mask=col_mask,
                                  var_floor=var_floor, warm_mode=warm_mode,
                                  qp_fused_steps=(fcfg.qp_max_iter_warm
                                                  if fcfg.qp_fused
                                                  and warm_mode == "warm"
                                                  else None))

    # Normalize rho update scale to the iteration-0 ridge solution
    # (reference drt1d.py:946-962)
    ns = fcfg.cfg.num_special

    def set_norms(s):
        x_drt = s.x[ns:]
        xmx = jnp.stack([x_drt @ m_stack[k][ns:, ns:] @ x_drt
                         for k in range(fcfg.cfg.k_range)])
        if fcfg.cfg.fit_dop:
            ds_, de_ = fcfg.cfg.dop_start, fcfg.cfg.dop_start + fcfg.cfg.dop_size
            x_dop = s.x[ds_:de_]
            dop_xmx = jnp.stack([x_dop @ m_stack[k][ds_:de_, ds_:de_] @ x_dop
                                 for k in range(fcfg.cfg.k_range)])
        else:
            dop_xmx = s.dop_xmx_norms
        return s._replace(xmx_norms=xmx, dop_xmx_norms=dop_xmx)

    if fcfg.continue_mode:
        # Norms stay fixed at the values from the original fit; convergence
        # cannot terminate the loop before min_iter iterations
        st_new = st_new._replace(
            converged=st_new.converged & (st_new.it >= fcfg.min_iter))
    else:
        st_new = jax.lax.cond(st.it == 0, set_norms, lambda s: s, st_new)

    # Scaled-background column rewrite: re-estimate the background from the
    # current chrono residuals, filtered through the GP projection matrix
    # (reference drt1d.py:964-970)
    if fcfg.bkg_scaled:
        y_hat = rzm @ st_new.x
        y_bkg = rm_bkg @ (rzv - y_hat)[:nc]
        rzm = rzm.at[:nc, fcfg.bkg_index].set(y_bkg)

    # Opt-in data-space early stop: accept "prediction settled" in addition
    # to the x-space check — the weight-scaled RMS change between this
    # iteration's prediction and the one two iterations back (period-2 limit
    # cycles shuffle mass between adjacent basis columns while the
    # prediction stands still). Default OFF for parity with the reference
    # convergence formula (hybdrt/models/qphb.py:597-604).
    if fcfg.pred_stop:
        y_new = rzm @ st_new.x
        delta = (y_new - y_prev2) * st_new.weights
        if row_mask is None:
            ms = jnp.mean(delta ** 2)
        else:
            # Ragged batches: padded rows are zero by construction but would
            # still count in a plain mean, diluting the RMS by
            # sqrt(real_rows / padded_rows) and loosening the stop tolerance
            # for short observations — average over real rows only
            ms = (jnp.sum((delta * row_mask) ** 2)
                  / jnp.maximum(jnp.sum(row_mask), 1.0))
        settled = (st_new.it >= jnp.maximum(fcfg.min_iter, 3)) & \
            (jnp.sqrt(ms) < fcfg.pred_rtol)
        st_new = st_new._replace(converged=st_new.converged | settled)
        y_prev2 = y_prev
        y_prev = y_new

    # vz_offset column rewrite with the updated prediction
    # (reference drt1d.py:972-979)
    if fcfg.data_type == "hybrid" and fcfg.vz_offset:
        y_hat = rzm_vz @ st_new.x
        if vz_sign is not None:
            # Ragged batches: +1 on chrono rows, -1 on EIS rows, per obs
            vz_sep = y_hat * vz_sign
        else:
            vz_sep = y_hat.at[nc:].multiply(-1.0)
        rzm = rzm.at[:, fcfg.vz_index].set(vz_sep * vz_strength_vec)

    return FitCarry(state=st_new, rzm=rzm, y_prev=y_prev, y_prev2=y_prev2)


def _check_penalty_type(cfg):
    if cfg.penalty_type != "integral":
        raise NotImplementedError(
            f"penalty_type={cfg.penalty_type!r} is not implemented; the fit "
            f"loop always applies the integral-penalty updates (the "
            f"reference's 'discrete' branch is dead in its live paths)")


@partial(jax.jit, static_argnames=("fcfg", "return_pred_history"))
def qphb_fit_loop(rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb, hyp,
                  x0, s0, rho0, dop_rho0, init_weights, est_weights, outlier_t0,
                  rzm_vz, vz_strength_vec, chrono_weight_factor, eis_weight_factor,
                  weight_factor, fcfg: FitConfig, nl_cross=None, rm_bkg=None,
                  col_mask=None, var_floor=None, row_factors=None, vz_sign=None,
                  row_mask=None, return_pred_history=False):
    """Run the full QPHB outer loop; returns (final_state, final_rzm).

    return_pred_history=True (requires fcfg.pred_stop) appends the final
    prediction history (y_prev, y_prev2) so a caller can resume the loop
    bitwise via qphb_fit_loop_from_state(y_prev0=..., y_prev2_0=...)."""
    k = fcfg.cfg.k_range
    state0 = QPHBState(
        x=x0, s_vectors=s0, rho_vector=rho0, dop_rho_vector=dop_rho0,
        weights=init_weights, outlier_t=outlier_t0,
        xmx_norms=jnp.ones(k, dtype=rzv.dtype), dop_xmx_norms=jnp.ones(k, dtype=rzv.dtype),
        it=jnp.array(0, dtype=jnp.int32), converged=jnp.array(False),
        qp_dual=jnp.zeros_like(x0))
    return qphb_fit_loop_from_state(
        state0, rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb, hyp,
        est_weights, rzm_vz, vz_strength_vec, chrono_weight_factor,
        eis_weight_factor, weight_factor, fcfg, nl_cross=nl_cross,
        rm_bkg=rm_bkg, col_mask=col_mask, var_floor=var_floor,
        row_factors=row_factors, vz_sign=vz_sign, row_mask=row_mask,
        peel_cold_start=fcfg.qp_fused,
        return_pred_history=return_pred_history)


@partial(jax.jit, static_argnames=("fcfg", "peel_cold_start",
                                   "seed_pred_history",
                                   "return_pred_history"))
def qphb_fit_loop_from_state(state0, rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb,
                             hyp, est_weights, rzm_vz, vz_strength_vec,
                             chrono_weight_factor, eis_weight_factor,
                             weight_factor, fcfg: FitConfig, nl_cross=None,
                             rm_bkg=None, col_mask=None, var_floor=None,
                             row_factors=None, vz_sign=None,
                             row_mask=None, peel_cold_start=False,
                             seed_pred_history=False,
                             y_prev0=None, y_prev2_0=None,
                             return_pred_history=False):
    """Run (or resume) the QPHB outer loop from an explicit state.

    The loop body is Markovian in (state, rzm): resuming a fit whose
    while_loop was cut at max_iter=k with a larger max_iter continues the
    EXACT single-run trajectory (the basis of the compacted-continuation
    batch scheduler in parallel/batch.py, which stops whole-batch dispatches
    early and re-runs only the unconverged tail).

    With pred_stop the prediction history (y_prev, y_prev2) is part of the
    resumable state: pass the values a previous call returned (via
    return_pred_history=True) as y_prev0/y_prev2_0 and the resumed
    trajectory — including the iteration each lane settles on — is
    identical to an uninterrupted run. Fallback when no saved history is
    available (e.g. resuming from a bare checkpointed state):
    seed_pred_history=True seeds both slots with the resumed iterate's
    prediction, making the settled check compare against the t-1 prediction
    for the first resumed iteration (exact from the second on); a lane can
    then settle one iteration earlier or later, with outputs agreeing
    within pred_rtol.

    With fcfg.qp_fused, iteration 0 is peeled out of the while_loop
    (peel_cold_start=True for fresh fits) so the in-loop iterations are
    STATICALLY warm-started and their capped QP solves run through the
    fused pallas Mehrotra-loop kernel."""
    _check_penalty_type(fcfg.cfg)
    loop_mode = "warm" if fcfg.qp_fused else "auto"

    def cond(carry):
        return (carry.state.it < fcfg.max_iter) & (~carry.state.converged)

    def make_body(warm_mode):
        def body(carry):
            return _loop_body(carry, rzv, vmm, m_stack, dop_gmat, l1v, lb, est_weights,
                              rzm_vz, vz_strength_vec, chrono_weight_factor, eis_weight_factor,
                              weight_factor, hyp, fcfg, nl_cross=nl_cross, rm_bkg=rm_bkg,
                              col_mask=col_mask, var_floor=var_floor,
                              row_factors=row_factors, vz_sign=vz_sign,
                              row_mask=row_mask, warm_mode=warm_mode)
        return body

    if not fcfg.pred_stop:
        y0 = y02 = None
    elif y_prev0 is not None:
        y0 = y_prev0
        y02 = y_prev2_0 if y_prev2_0 is not None else y_prev0
    elif seed_pred_history:
        y0 = y02 = rzm @ state0.x
    else:
        y0 = y02 = jnp.zeros_like(rzv)
    carry = FitCarry(state=state0, rzm=rzm, y_prev=y0, y_prev2=y02)
    if peel_cold_start:
        carry = make_body("cold")(carry)
    final = jax.lax.while_loop(cond, make_body(loop_mode), carry)
    if return_pred_history:
        if not fcfg.pred_stop:
            raise ValueError("return_pred_history requires fcfg.pred_stop")
        return final.state, final.rzm, final.y_prev, final.y_prev2
    return final.state, final.rzm


@partial(jax.jit, static_argnames=("fcfg",))
def qphb_fit_scan(rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb, hyp,
                  x0, s0, rho0, dop_rho0, init_weights, est_weights, outlier_t0,
                  rzm_vz, vz_strength_vec, chrono_weight_factor, eis_weight_factor,
                  weight_factor, fcfg: FitConfig, nl_cross=None, rm_bkg=None,
                  col_mask=None, var_floor=None, row_factors=None, vz_sign=None,
                  row_mask=None):
    """Fixed-length lax.scan variant of the fit loop that records the
    per-iteration solver state — the batched analog of the reference's
    qphb_history (hybdrt/models/qphb.py:950-966), vmappable so a whole
    batch's diagnostics come out of one XLA computation.

    Returns (final_state, final_rzm, history) with history a dict of arrays
    whose leading axis is the iteration (length fcfg.max_iter; iterations
    after convergence repeat the converged state — mask with
    history['it'])."""
    _check_penalty_type(fcfg.cfg)
    k = fcfg.cfg.k_range
    state0 = QPHBState(
        x=x0, s_vectors=s0, rho_vector=rho0, dop_rho_vector=dop_rho0,
        weights=init_weights, outlier_t=outlier_t0,
        xmx_norms=jnp.ones(k, dtype=rzv.dtype),
        dop_xmx_norms=jnp.ones(k, dtype=rzv.dtype),
        it=jnp.array(0, dtype=jnp.int32), converged=jnp.array(False),
        qp_dual=jnp.zeros_like(x0))
    y0 = jnp.zeros_like(rzv) if fcfg.pred_stop else None
    carry0 = FitCarry(state=state0, rzm=rzm, y_prev=y0, y_prev2=y0)

    def step(carry, _):
        live = (carry.state.it < fcfg.max_iter) & (~carry.state.converged)
        new = jax.lax.cond(
            live,
            lambda c: _loop_body(c, rzv, vmm, m_stack, dop_gmat, l1v, lb,
                                 est_weights, rzm_vz, vz_strength_vec,
                                 chrono_weight_factor, eis_weight_factor,
                                 weight_factor, hyp, fcfg, nl_cross=nl_cross,
                                 rm_bkg=rm_bkg, col_mask=col_mask,
                                 var_floor=var_floor, row_factors=row_factors,
                                 vz_sign=vz_sign, row_mask=row_mask),
            lambda c: c, carry)
        st = new.state
        rec = {"x": st.x, "s_vectors": st.s_vectors,
               "rho_vector": st.rho_vector,
               "dop_rho_vector": st.dop_rho_vector, "weights": st.weights,
               "outlier_t": st.outlier_t, "it": st.it,
               "converged": st.converged}
        return new, rec

    final, history = jax.lax.scan(step, carry0, None, length=fcfg.max_iter)
    return final.state, final.rzm, history


def qphb_fit_eager(rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb, hyp,
                   x0, s0, rho0, dop_rho0, init_weights, est_weights, outlier_t0,
                   rzm_vz, vz_strength_vec, chrono_weight_factor, eis_weight_factor,
                   weight_factor, fcfg: FitConfig, nl_cross=None, rm_bkg=None,
                   col_mask=None, var_floor=None, row_factors=None, vz_sign=None):
    """Python-driven variant collecting per-iteration history (diagnostics)."""
    k = fcfg.cfg.k_range
    state = QPHBState(
        x=jnp.asarray(x0), s_vectors=jnp.asarray(s0), rho_vector=jnp.asarray(rho0),
        dop_rho_vector=jnp.asarray(dop_rho0), weights=jnp.asarray(init_weights),
        outlier_t=jnp.asarray(outlier_t0),
        xmx_norms=jnp.ones(k, dtype=rzv.dtype), dop_xmx_norms=jnp.ones(k, dtype=rzv.dtype),
        it=jnp.array(0, dtype=jnp.int32), converged=jnp.array(False),
        qp_dual=jnp.zeros_like(jnp.asarray(x0)))
    y0 = jnp.zeros_like(jnp.asarray(rzv)) if fcfg.pred_stop else None
    carry = FitCarry(state=state, rzm=jnp.asarray(rzm), y_prev=y0, y_prev2=y0)
    history = []
    while int(carry.state.it) < fcfg.max_iter and not bool(carry.state.converged):
        carry = _loop_body(carry, rzv, vmm, m_stack, dop_gmat, l1v, lb, est_weights,
                           rzm_vz, vz_strength_vec, chrono_weight_factor, eis_weight_factor,
                           weight_factor, hyp, fcfg, nl_cross=nl_cross, rm_bkg=rm_bkg,
                           col_mask=col_mask, var_floor=var_floor,
                           row_factors=row_factors, vz_sign=vz_sign)
        st = carry.state
        history.append({
            "x": st.x, "s_vectors": st.s_vectors, "rho_vector": st.rho_vector,
            "dop_rho_vector": st.dop_rho_vector, "weights": st.weights,
            "outlier_t": st.outlier_t, "converged": bool(st.converged),
        })
    return carry.state, carry.rzm, history
