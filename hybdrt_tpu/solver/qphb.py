"""QPHB: quadratic-programming hierarchical Bayesian solver core.

Functional re-design of reference hybdrt/models/qphb.py. Every update is a
pure jnp function over arrays, so a full QPHB iteration — constrained QP for
the coefficients, closed-form gamma-prior updates of the local penalty scales
s and global derivative strengths rho, and residual-based data-weight
re-estimation — jits into one XLA computation and vmaps over a batch of
spectra.

Index layout of the parameter vector x (reference drtbase.py:538-547):
  x = [special params (incl. optional x_dop block) | DRT coefficients]
with num_special = total size of special params; DOP occupies
[dop_start, dop_start + dop_size) inside the special range.
"""
from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..ops.qp import solve_qp_box


class QPHBConfig(NamedTuple):
    """Static (python-level) configuration of the QPHB problem structure."""
    num_special: int
    dop_start: int = 0
    dop_size: int = 0
    k_range: int = 3
    eff_hp: bool = True
    has_outlier: bool = False
    penalty_type: str = "integral"  # only 'integral' is implemented; validated in qphb_fit paths
    # Nonlinear (bias-dependent) fits stack two coefficient sets
    # (reference nonlin.py:665-745, qphb.py:84-117)
    nonlin: bool = False
    half_size: int = 0

    @property
    def fit_dop(self):
        return self.dop_size > 0


class QPHBState(NamedTuple):
    """Dynamic per-iteration state (a pytree; batchable under vmap)."""
    x: jnp.ndarray            # (N,) coefficient vector
    s_vectors: jnp.ndarray    # (K, N) local penalty scales
    rho_vector: jnp.ndarray   # (K,) global derivative strengths
    dop_rho_vector: jnp.ndarray  # (K,)
    weights: jnp.ndarray      # (M,) data weights
    outlier_t: jnp.ndarray    # (M,) 1 - outlier probability
    xmx_norms: jnp.ndarray    # (K,)
    dop_xmx_norms: jnp.ndarray  # (K,)
    it: jnp.ndarray           # iteration counter
    converged: jnp.ndarray    # bool
    qp_dual: Optional[jnp.ndarray] = None  # (N,) warm-start duals for the QP


# ------------------------------------------------------------------
# L2 (SMS) matrix assembly — reference qphb.py:53-130
# ------------------------------------------------------------------
def calculate_qp_l2_matrix(hyp, rho_vector, dop_rho_vector, m_stack, s_vectors, cfg: QPHBConfig,
                           nl_cross=None, col_mask=None):
    """l2 = sum_k S_k^1/2 M_k' S_k^1/2 with block scaling of M_k by
    l2_lambda_0 * w_k * rho_k (DRT block) / dop equivalents (DOP block).

    Cross-blocks of M_k are structurally zero, so block scaling reduces to an
    outer-product row/col scaling that fuses with the s-vector scaling.

    col_mask (ragged batching): 1 for active parameter columns, 0 for padded
    ones. Masked columns are decoupled from the penalty and pinned by a unit
    diagonal, so with zeroed design columns and l1 entries the QP solution is
    exactly 0 there and the active block matches the unpadded problem.
    """
    n = m_stack.shape[-1]
    dw = hyp["derivative_weights"]
    l2l0 = hyp["l2_lambda_0"]
    ns = cfg.num_special

    base = jnp.ones(n, dtype=m_stack.dtype)
    drt_mask = base.at[:ns].set(0.0)
    if cfg.nonlin and cfg.half_size > 0:
        drt_mask = drt_mask.at[cfg.half_size:cfg.half_size + ns].set(0.0)
    if cfg.fit_dop:
        dop_mask = jnp.zeros(n, dtype=m_stack.dtype).at[cfg.dop_start:cfg.dop_start + cfg.dop_size].set(1.0)
        if cfg.nonlin and cfg.half_size > 0:
            dop_mask = dop_mask.at[cfg.half_size + cfg.dop_start:
                                   cfg.half_size + cfg.dop_start + cfg.dop_size].set(1.0)
    else:
        dop_mask = jnp.zeros(n, dtype=m_stack.dtype)
    special_mask = 1.0 - drt_mask - dop_mask

    l2_mat = jnp.zeros((n, n), dtype=m_stack.dtype)
    for k in range(cfg.k_range):
        d_factor = l2l0 * dw[k] * rho_vector[k]
        if cfg.fit_dop:
            dop_factor = hyp["dop_l2_lambda_0"] * hyp["dop_derivative_weights"][k] * dop_rho_vector[k]
        else:
            dop_factor = 0.0
        scale_vec = special_mask + drt_mask * d_factor + dop_mask * dop_factor
        if col_mask is not None:
            scale_vec = scale_vec * col_mask
        d_k = jnp.sqrt(s_vectors[k] * scale_vec)
        active = jnp.where(dw[k] > 0, 1.0, 0.0)
        l2_mat = l2_mat + active * (m_stack[k] * d_k[:, None] * d_k[None, :])
    if nl_cross is not None:
        l2_mat = l2_mat + nl_cross
    if col_mask is not None:
        l2_mat = l2_mat + jnp.diag(1.0 - col_mask)
    return l2_mat


# ------------------------------------------------------------------
# Closed-form hyperparameter updates — reference qphb.py:320-405
# ------------------------------------------------------------------
def solve_s_integral(pm, x, sv, rho_eff, alpha, beta, g_mat, sigma_ds):
    """Gamma-prior mode update of the local penalty scale vector s
    (reference qphb.py:320-356, integral penalty branch)."""
    n = x.shape[0]
    gamma = rho_eff * (x[:, None] * pm * x[None, :]) \
        + g_mat / (2 * sigma_ds ** 2) + beta * jnp.eye(n, dtype=x.dtype)
    u = jnp.sqrt(sv)
    gu = gamma * u[None, :]
    gu = gu * (1.0 - jnp.eye(n, dtype=x.dtype))
    gdiag = jnp.diagonal(gamma)
    b = jnp.sum(gu, axis=1)
    u_hat = (-b + jnp.sign(b) * jnp.sqrt(b ** 2 + 4 * gdiag * (alpha - 1))) / (2 * gdiag)
    quad = u_hat ** 2
    diag_sol = (alpha - 1) / gdiag
    s_hat = jnp.where(jnp.max(jnp.abs(gu)) > 1e-10, quad, diag_sol)
    return jnp.where(jnp.isnan(s_hat), 1.0, s_hat)


def solve_s_discrete(lm, x, sv, rho_eff, alpha, beta, g_mat, sigma_ds):
    """Discrete penalty branch (reference qphb.py:339-352)."""
    lx2 = rho_eff * (lm @ x) ** 2
    g_diag = jnp.diagonal(g_mat) if g_mat.ndim == 2 else jnp.zeros_like(x)
    has_g = (g_mat.ndim == 2) and True
    if has_g:
        n = x.shape[0]
        g_zd = g_mat * (1.0 - jnp.eye(n, dtype=x.dtype))
        a = beta + 0.5 * lx2 + g_diag / (2 * sigma_ds ** 2)
        b = (g_zd @ jnp.sqrt(sv)) / (2 * sigma_ds ** 2)
        u_hat = (-b + jnp.sign(b) * jnp.sqrt(b ** 2 + 4 * a * (alpha - 0.5))) / (2 * a)
        quad = u_hat ** 2
        plain = (alpha - 0.5) / (0.5 * lx2 + beta)
        s_hat = jnp.where(jnp.max(jnp.abs(g_mat)) > 1e-10, quad, plain)
    else:
        s_hat = (alpha - 0.5) / (0.5 * lx2 + beta)
    return jnp.where(jnp.isnan(s_hat), 1.0, s_hat)


def solve_rho(pm, x, sv, alpha, beta, xmx_norm):
    """Gamma-prior mode update of the global derivative strength rho
    (reference qphb.py:385-405, integral penalty)."""
    u = x * jnp.sqrt(sv)
    xsmsx = u @ pm @ u
    return alpha / (xsmsx / xmx_norm + beta)


# ------------------------------------------------------------------
# Outlier model — reference qphb.py:1482-1538
# ------------------------------------------------------------------
def solve_outlier_t(vmm, resid, outlier_p):
    """Bernoulli outlier posterior: t = 1 - P(outlier)."""
    # dtype-aware floor: a fixed 1e-150 underflows to 0 in float32, making
    # the guard a no-op for f32 fits with zero-residual (padded) rows
    tiny = jnp.asarray(jnp.finfo(resid.dtype).tiny ** 0.25, dtype=resid.dtype)
    s_bar = jnp.maximum(vmm @ resid ** 2, tiny ** 2)
    sqrt2pi = jnp.sqrt(2 * jnp.pi)
    sd_in = jnp.sqrt(s_bar)
    pdf_in = jnp.exp(-0.5 * resid ** 2 / s_bar) / (sd_in * sqrt2pi)
    abs_r = jnp.maximum(jnp.abs(resid), tiny)
    pdf_out = jnp.exp(-0.5) / (abs_r * sqrt2pi)
    t_out = 1 - outlier_p * pdf_out / ((1 - outlier_p) * pdf_in + outlier_p * pdf_out)
    return jnp.where(sd_in > abs_r, 1.0, t_out)


def outlier_tvt(vmm, outlier_t):
    sqrt_t = jnp.sqrt(outlier_t)
    tvt = vmm * sqrt_t[:, None] * sqrt_t[None, :]
    return tvt + jnp.diag(1 - outlier_t)


# ------------------------------------------------------------------
# Weight estimation — reference qphb.py:1545-1681
# ------------------------------------------------------------------
def solve_init_weight_scale(w_scale_est, alpha, beta):
    if alpha is None:
        return w_scale_est
    b = 0.5 - alpha + 1
    s_hat = (-b + jnp.sqrt(b ** 2 + 2 * beta * w_scale_est ** -2)) / (2 * beta)
    return s_hat ** -0.5


def estimate_weights(x, y, vmm, rm, est_weights=None, outlier_p=None, var_floor=None):
    """Residual-filtered variance estimate -> weights, with convergence
    damping toward the overfit-ridge estimate (reference qphb.py:1545-1594).

    Returns (weights, outlier_t, tvt_or_None).
    """
    resid = rm @ x - y
    if outlier_p is not None:
        outlier_t = solve_outlier_t(vmm, resid, outlier_p)
        tvt = outlier_tvt(vmm, outlier_t)
        vmm_eff = tvt
    else:
        outlier_t = jnp.ones(y.shape, dtype=y.dtype)
        tvt = None
        vmm_eff = vmm

    if var_floor is None:
        var_floor = jnp.var(y) * 1e-7
    s_hat = vmm_eff @ resid ** 2
    s_hat = jnp.maximum(s_hat, var_floor)
    w_hat = s_hat ** -0.5

    if est_weights is not None:
        frac_current = w_hat / (w_hat + est_weights)
        w_hat = frac_current * w_hat + (1 - frac_current) * est_weights

    w_hat = jnp.maximum(w_hat, 1e-10)
    return w_hat, outlier_t, tvt


def initialize_weights(iw_hyp, m_stack, rho_vector, dop_rho_vector, s_vectors, rv, rm, vmm,
                       lb, cfg: QPHBConfig, outlier_p=None, nl_cross=None,
                       col_mask=None, var_floor=None):
    """Overfit-ridge solve -> residual variance -> initial weights
    (reference qphb.py:1609-1681). iw_hyp carries the overfit lambda values.

    col_mask / var_floor support padded (ragged-batch) systems: see
    calculate_qp_l2_matrix; var_floor should be the unpadded data variance
    * 1e-7 so padded zero rows do not dilute the default jnp.var(rv).

    Returns (est_weights, init_weights, x_overfit, outlier_t).
    """
    l2_matrix = calculate_qp_l2_matrix(iw_hyp, rho_vector, dop_rho_vector, m_stack, s_vectors, cfg,
                                       nl_cross=nl_cross, col_mask=col_mask)
    l1_0 = iw_hyp["l1_lambda_0"]
    if col_mask is not None:
        # Padded columns: positive linear cost with lb=0 makes the pinned
        # solution strictly complementary (x=0, z=1) instead of degenerate
        l1_0 = l1_0 * col_mask + (1.0 - col_mask)

    if outlier_p is not None:
        est_weights = jnp.ones(vmm.shape[0], dtype=rv.dtype)
        outlier_t = jnp.ones(vmm.shape[0], dtype=rv.dtype)
        tvt = outlier_tvt(vmm, outlier_t)
        vmm_eff = vmm
        x_overfit = jnp.zeros(rm.shape[1], dtype=rv.dtype)
        for i in range(2):
            wrm = rm * est_weights[:, None]
            wrv = rv * est_weights
            p_matrix = wrm.T @ wrm + l2_matrix
            q_vector = -wrm.T @ wrv + l1_0
            x_overfit = solve_qp_box(p_matrix, q_vector, lb).x
            if i == 0:
                # Exclude self from the variance estimate for the initial
                # outlier pass (reference qphb.py:1644-1649)
                diag = jnp.diagonal(vmm)
                vmm_base = (vmm - jnp.diag(diag)) / (1 - diag)[:, None]
                vmm_eff = vmm_base
            for _ in range(2):
                est_weights, outlier_t, tvt = estimate_weights(
                    x_overfit, rv, vmm_eff, rm, est_weights=None, outlier_p=outlier_p,
                    var_floor=var_floor)
    else:
        p_matrix = rm.T @ rm + l2_matrix
        q_vector = -rm.T @ rv + l1_0
        x_overfit = solve_qp_box(p_matrix, q_vector, lb).x
        est_weights, outlier_t, _ = estimate_weights(x_overfit, rv, vmm, rm,
                                                     est_weights=None, outlier_p=None,
                                                     var_floor=var_floor)

    iw_alpha = iw_hyp.get("iw_alpha")
    iw_beta = iw_hyp.get("iw_beta")
    if iw_alpha is not None:
        init_weights = solve_init_weight_scale(est_weights, iw_alpha, iw_beta)
    else:
        init_weights = est_weights
    return est_weights, init_weights, x_overfit, outlier_t


def estimate_x_rp(hyp, m_stack, rho_vector, dop_rho_vector, s_vectors, rv, rm, lb,
                  cfg: QPHBConfig, l2_lambda_0=1e-4, l1_lambda_0=1e-3):
    """Quick elastic-net solve for Rp estimation (reference qphb.py:1684-1717)."""
    rp_hyp = dict(hyp)
    rp_hyp["l2_lambda_0"] = l2_lambda_0
    if "dop_l2_lambda_0" in hyp:
        rp_hyp["dop_l2_lambda_0"] = hyp["dop_l2_lambda_0"] / hyp["l2_lambda_0"] * l2_lambda_0
    l2_matrix = calculate_qp_l2_matrix(rp_hyp, rho_vector, dop_rho_vector, m_stack, s_vectors, cfg)
    p_matrix = rm.T @ rm + l2_matrix
    q_vector = -rm.T @ rv + l1_lambda_0
    return solve_qp_box(p_matrix, q_vector, lb).x


# ------------------------------------------------------------------
# Posterior quantities — reference qphb.py:1154-1377
# ------------------------------------------------------------------
def calculate_pq(rm, rv, m_stack, hyp, l1_lambda_vector, rho_vector, dop_rho_vector,
                 s_vectors, weights, cfg: QPHBConfig, nl_cross=None, col_mask=None):
    l2_matrix = calculate_qp_l2_matrix(hyp, rho_vector, dop_rho_vector, m_stack, s_vectors, cfg,
                                       nl_cross=nl_cross, col_mask=col_mask)
    wrm = rm * weights[:, None]
    wrv = rv * weights
    p_matrix = l2_matrix + wrm.T @ wrm
    q_vector = -wrm.T @ wrv + l1_lambda_vector
    return p_matrix, q_vector


def evaluate_rss(x_hat, rm, rv, weights):
    wr = weights * (rm @ x_hat - rv)
    return wr @ wr


def evaluate_llh(x_hat, rm, rv, weights, marginalize_weights=True, alpha_0=2.0, beta_0=1.0,
                 include_constants=False, row_mask=None):
    """Gaussian log-likelihood, optionally with sigma^2 marginalized under an
    inverse-gamma prior (reference qphb.py:1355-1377). row_mask excludes
    padded (ragged-batch) rows from the data count and weight terms."""
    rss = evaluate_rss(x_hat, rm, rv, weights)
    n_data = rv.shape[0] if row_mask is None else jnp.sum(row_mask)
    if marginalize_weights:
        alpha_n = alpha_0 - 1 + n_data / 2
        beta_n = beta_0 + 0.5 * rss
        llh = alpha_0 * jnp.log(beta_0) - alpha_n * jnp.log(beta_n) \
            + gammaln(alpha_n) - gammaln(alpha_0)
    else:
        llh = -0.5 * rss
    logw = jnp.log(weights)
    if row_mask is not None:
        logw = logw * row_mask
    llh = llh + jnp.sum(logw)
    if include_constants:
        llh = llh - 0.5 * n_data * jnp.log(2 * jnp.pi)
    return llh


def evaluate_lml(x_hat, rm, rv, m_stack, hyp, l1_lambda_vector, rho_vector, dop_rho_vector,
                 s_vectors, weights, cfg: QPHBConfig, alpha_0=1.0, beta_0=1.0):
    """Log-marginal likelihood with fixed hyperparameters
    (reference qphb.py:1279-1344)."""
    p_matrix, _ = calculate_pq(rm, rv, m_stack, hyp, l1_lambda_vector, rho_vector,
                               dop_rho_vector, s_vectors, weights, cfg)
    sign_p, log_det_p = jnp.linalg.slogdet(p_matrix)
    omega = calculate_qp_l2_matrix(hyp, rho_vector, dop_rho_vector, m_stack, s_vectors, cfg)
    sign_o, log_det_omega = jnp.linalg.slogdet(omega)
    wrm = rm * weights[:, None]
    wrv = rv * weights
    alpha = rv.shape[0] / 2 + alpha_0
    wrmx = wrm @ x_hat
    beta = 0.5 * (wrv @ wrv - wrmx @ wrmx - x_hat @ (omega @ x_hat)) + beta_0
    lml = 0.5 * (log_det_omega - log_det_p) + jnp.sum(jnp.log(weights)) \
        + gammaln(alpha) - gammaln(alpha_0) + alpha_0 * jnp.log(beta_0) - alpha * jnp.log(beta)
    return lml


def get_raw_hyperparams(hyp, rho_vector, xmx_norms):
    """Effective -> raw hyperparameters (reference qphb.py:1212-1230)."""
    l2l0 = hyp["l2_lambda_0"]
    dw = hyp["derivative_weights"]
    rho_alpha = hyp["rho_alpha"]
    rho_0 = hyp["rho_0"]
    s_alpha = hyp["s_alpha"]
    s_0 = hyp["s_0"]
    rho_alpha_raw = xmx_norms * l2l0 * dw * rho_alpha
    rho_beta_raw = xmx_norms * l2l0 * dw * (rho_alpha / rho_0)
    s_alpha_raw = l2l0 * dw * rho_vector * (s_alpha - 1) + 1
    s_beta_raw = l2l0 * dw * rho_vector * ((s_alpha - 1) / s_0)
    return rho_alpha_raw, rho_beta_raw, s_alpha_raw, s_beta_raw


def evaluate_posterior_lp(x, rm, rv, m_stack, hyp, l1_lambda_vector, rho_vector,
                          dop_rho_vector, s_vectors, weights, xmx_norms, cfg: QPHBConfig):
    """Joint log posterior of (x, rho, s) (reference qphb.py:1246-1276)."""
    from ..utils.stats import log_pdf_gamma
    p_matrix, q_vector = calculate_pq(rm, rv, m_stack, hyp, l1_lambda_vector, rho_vector,
                                      dop_rho_vector, s_vectors, weights, cfg)
    wrv = rv * weights
    lp_x = -0.5 * (x @ p_matrix @ x) - q_vector @ x - 0.5 * wrv @ wrv
    rho_alpha_raw, rho_beta_raw, s_alpha_raw, s_beta_raw = get_raw_hyperparams(hyp, rho_vector, xmx_norms)
    dw = hyp["derivative_weights"]
    active = dw > 0
    lp_rho = jnp.sum(jnp.where(active, log_pdf_gamma(rho_vector, rho_alpha_raw, rho_beta_raw, True), 0.0))
    lp_s = 0.0
    for k in range(len(rho_vector)):
        lp_s_vec = log_pdf_gamma(s_vectors[k], s_alpha_raw[k], s_beta_raw[k], True)
        lp_s = lp_s + jnp.where(active[k], jnp.sum(lp_s_vec), 0.0)
    return lp_x + lp_rho + lp_s


# ------------------------------------------------------------------
# Convergence — reference qphb.py:597-604
# ------------------------------------------------------------------
def is_converged(x_in, x_out, x_atol, x_rtol):
    x_delta = x_out - x_in
    denom = x_in + 1e-15
    rel_ok = jnp.max(jnp.abs(x_delta / denom)) <= x_rtol
    abs_ok = jnp.max(jnp.abs(x_delta)) <= x_atol
    return rel_ok | abs_ok


# ------------------------------------------------------------------
# Single QPHB iteration — reference qphb.py:606-972
# ------------------------------------------------------------------
def iterate_qphb(state: QPHBState, rv, rm, vmm, m_stack, m1_gmat_source, dop_gmat,
                 l1_lambda_vector, lb, est_weights, hyp, cfg: QPHBConfig,
                 x_rtol=1e-2, max_hp_iter=1, qp_max_iter=60, nl_cross=None,
                 qp_max_iter_warm=None, col_mask=None, var_floor=None,
                 warm_mode="auto", qp_fused_steps=None):
    """One outer QPHB iteration: weighted QP for x, closed-form s/rho updates
    on the DRT (and DOP) blocks, then data-weight re-estimation.

    m1_gmat_source: the order-1 penalty matrix used to build the smoothing
    g-matrix for the order-0 s update (reference qphb.py:769-774).

    col_mask / var_floor support padded (ragged-batch) systems; padded data
    rows have zero design rows so they drop out of the QP, and padded
    parameter columns are pinned to exactly 0 by the masked l2 matrix.
    """
    ns = cfg.num_special
    dw = hyp["derivative_weights"]

    # Weighted LS + penalty -> QP
    wrm = rm * state.weights[:, None]
    wrv = rv * state.weights
    l2_matrix = calculate_qp_l2_matrix(hyp, state.rho_vector, state.dop_rho_vector,
                                       m_stack, state.s_vectors, cfg, nl_cross=nl_cross,
                                       col_mask=col_mask)
    p_matrix = wrm.T @ wrm + l2_matrix
    q_vector = -wrm.T @ wrv + l1_lambda_vector
    # Warm-start the interior point from the previous iteration's primal/dual
    # point. warm_mode='auto' decides per-element at runtime (branchless:
    # lax.cond under vmap would execute BOTH branches); 'warm'/'cold' are
    # STATIC (the fitcore loop peels iteration 0 when the fused kernel is
    # on, so in-loop iterations are statically warm).
    if warm_mode == "cold" or state.qp_dual is None:
        qp_res = solve_qp_box(p_matrix, q_vector, lb, max_iter=qp_max_iter)
    elif warm_mode == "warm":
        x_ws = state.x
        z_ws = jnp.maximum(state.qp_dual, 1e-6)
        if qp_fused_steps is not None:
            # Fixed-count fused Mehrotra steps (pallas loop kernel when
            # batched f32 on TPU); polish restores exactness
            qp_res = solve_qp_box(p_matrix, q_vector, lb,
                                  x_init=x_ws, z_init=z_ws,
                                  fused_steps=int(qp_fused_steps))
        else:
            cap = qp_max_iter if qp_max_iter_warm is None else qp_max_iter_warm
            qp_res = solve_qp_box(p_matrix, q_vector, lb, max_iter=cap,
                                  x_init=x_ws, z_init=z_ws)
    else:
        warm = state.it > 0
        x_ws = jnp.where(warm, state.x, lb + 1.0)
        z_ws = jnp.where(warm, jnp.maximum(state.qp_dual, 1e-6),
                         jnp.maximum(jnp.abs(q_vector), 1.0))
        # Warm-started solves need few Mehrotra steps; capping them bounds the
        # batch-straggler cost under vmap (the while_loop runs to the max over
        # the batch), and the active-set polish restores exactness
        qp_iter_cap = qp_max_iter if qp_max_iter_warm is None \
            else jnp.where(warm, qp_max_iter_warm, qp_max_iter)
        qp_res = solve_qp_box(p_matrix, q_vector, lb, max_iter=qp_iter_cap,
                              x_init=x_ws, z_init=z_ws)
    x = qp_res.x
    if col_mask is not None:
        # Pin padded columns to exact zero so downstream updates and the
        # relative convergence check see them as absent
        x = x * col_mask

    s_vectors = state.s_vectors
    rho_vector = state.rho_vector
    dop_rho_vector = state.dop_rho_vector

    # DRT block hyperparameter updates
    x_drt = x[ns:]
    for _ in range(max_hp_iter):
        new_s = []
        new_rho = []
        for k in range(cfg.k_range):
            pm_drt = m_stack[k][ns:, ns:]
            sv_drt = s_vectors[k][ns:]
            s_k_alpha = hyp["s_alpha"][k]
            s_k_0 = hyp["s_0"][k]
            s_k_beta = (s_k_alpha - 1) / s_k_0
            rho_k_eff = 1.0 if cfg.eff_hp else rho_vector[k]

            if k == 0:
                sx = jnp.sign(x_drt) * jnp.sqrt(jnp.abs(x_drt))
                g_mat_drt = m1_gmat_source[ns:, ns:] * sx[:, None] * sx[None, :]
            else:
                g_mat_drt = jnp.zeros_like(pm_drt)

            sv_out = solve_s_integral(pm_drt, x_drt, sv_drt, rho_k_eff, s_k_alpha, s_k_beta,
                                      g_mat_drt, hyp["sigma_ds"][k])
            sv_out = jnp.where(sv_out <= 0, 1e-15, sv_out)

            rho_k_alpha = hyp["rho_alpha"][k]
            rho_k_beta = rho_k_alpha / hyp["rho_0"][k]
            rho_k = solve_rho(pm_drt, x_drt, sv_out, rho_k_alpha, rho_k_beta, state.xmx_norms[k])

            # Skip updates for zero-weighted derivative orders
            active = dw[k] > 0
            new_s.append(jnp.where(active, sv_out, sv_drt))
            new_rho.append(jnp.where(active, rho_k, rho_vector[k]))
        s_vectors = s_vectors.at[:, ns:].set(jnp.stack(new_s))
        if cfg.nonlin and cfg.half_size > 0:
            # Keep the second half's special-parameter scales at the prior mode
            # (reference qphb.py:783-785)
            for k in range(cfg.k_range):
                s_vectors = s_vectors.at[k, cfg.half_size:cfg.half_size + ns].set(
                    hyp["s_0"][k])
        rho_vector = jnp.stack(new_rho)

    # DOP block hyperparameter updates (reference qphb.py:822-933)
    if cfg.fit_dop:
        ds, de = cfg.dop_start, cfg.dop_start + cfg.dop_size
        x_dop = x[ds:de]
        ddw = hyp["dop_derivative_weights"]
        for _ in range(max_hp_iter):
            new_s = []
            new_rho = []
            for k in range(cfg.k_range):
                pm_dop = m_stack[k][ds:de, ds:de]
                sv_dop = s_vectors[k][ds:de]
                s_k_alpha = hyp["dop_s_alpha"][k]
                s_k_beta = (s_k_alpha - 1) / hyp["dop_s_0"][k]
                rho_k_eff = 1.0 if cfg.eff_hp else dop_rho_vector[k]
                g_mat_dop = dop_gmat[k] if dop_gmat is not None else jnp.zeros_like(pm_dop)
                sv_out = solve_s_integral(pm_dop, x_dop, sv_dop, rho_k_eff, s_k_alpha, s_k_beta,
                                          g_mat_dop, hyp["dop_sigma_ds"][k])
                sv_out = jnp.where(sv_out <= 0, 1e-15, sv_out)
                rho_k_alpha = hyp["dop_rho_alpha"][k]
                rho_k_beta = rho_k_alpha / hyp["dop_rho_0"][k]
                rho_k = solve_rho(pm_dop, x_dop, sv_out, rho_k_alpha, rho_k_beta,
                                  state.dop_xmx_norms[k])
                active = ddw[k] > 0
                new_s.append(jnp.where(active, sv_out, sv_dop))
                new_rho.append(jnp.where(active, rho_k, dop_rho_vector[k]))
            s_vectors = s_vectors.at[:, ds:de].set(jnp.stack(new_s))
            dop_rho_vector = jnp.stack(new_rho)

    # Weight re-estimation
    outlier_p = hyp.get("outlier_p") if cfg.has_outlier else None
    weights, outlier_t, _ = estimate_weights(x, rv, vmm, rm, est_weights=est_weights,
                                             outlier_p=outlier_p, var_floor=var_floor)

    # Convergence vs. input x (padded columns are identically zero in both
    # iterates, so only the atol normalization needs the mask)
    if col_mask is None:
        x_atol = jnp.mean(state.x) * 1e-3
    else:
        x_atol = jnp.sum(state.x * col_mask) / jnp.sum(col_mask) * 1e-3
    converged = is_converged(state.x, x, x_atol, x_rtol)

    return QPHBState(x=x, s_vectors=s_vectors, rho_vector=rho_vector,
                     dop_rho_vector=dop_rho_vector, weights=weights, outlier_t=outlier_t,
                     xmx_norms=state.xmx_norms, dop_xmx_norms=state.dop_xmx_norms,
                     it=state.it + 1, converged=converged,
                     qp_dual=qp_res.z if state.qp_dual is not None else None), qp_res
