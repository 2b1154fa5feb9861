"""1-D matrix assembly for DRT fits, fully vectorized for XLA.

Re-design of reference hybdrt/matrices/mat1d.py. The reference assembles
matrices with python list comprehensions over scipy quadrature or np.interp
(mat1d.py:96-122, 341-374); here every matrix is a single vectorized jnp
expression over a (data x basis) mesh, so assembly fuses into the surrounding
XLA computation and can be vmapped over a batch of spectra.

The default integration scheme is the reference's 'interp' scheme (1-D integral
lookup tables from ops.lookup + linear interpolation), which is both the
fastest and the parity-exact choice. A direct trapezoid scheme is provided as
a cross-check.
"""
import jax.numpy as jnp
import numpy as np

from . import basis as basis_mod
from . import lookup as lookup_mod


def _interp(x, xp, fp):
    return jnp.interp(x, jnp.asarray(xp), jnp.asarray(fp))


# ------------------------------------------------------------------
# Impedance matrix
# ------------------------------------------------------------------
def construct_impedance_matrix(frequencies, part, tau, basis_type="gaussian", epsilon=1.0,
                               integrate_method="interp", integrate_points=1000,
                               zga_params=None, interpolate_grids=None):
    """A matrix mapping DRT coefficients to Re/Im impedance at ``frequencies``.

    Reference: mat1d.py:212-374. The reference special-cases Toeplitz structure
    for log-uniform grids; since every element here is one interp/quadrature
    evaluation of the same 1-D kernel at log(w_n * tau_m), the full-mesh
    evaluation is already O(N_f * N_tau) cheap and identical in value.
    """
    omega = jnp.asarray(frequencies) * 2 * jnp.pi
    tau = jnp.asarray(tau)
    log_wt = jnp.log(omega[:, None] * tau[None, :])

    if basis_type in ("Cole-Cole", "zga", "delta"):
        func = basis_mod.get_impedance_func(part, basis_type, zga_params)
        return func(omega[:, None], tau[None, :], epsilon)

    if integrate_method == "interp":
        if interpolate_grids is None:
            re_lu, im_lu = lookup_mod.generate_impedance_lookup(basis_type, float(epsilon))
            interpolate_grids = re_lu if part == "real" else im_lu
        log_wt_grid, z_grid = interpolate_grids
        return _interp(log_wt, log_wt_grid, z_grid)
    elif integrate_method == "trapz":
        y = jnp.linspace(-lookup_mod.Y_LIMIT, lookup_mod.Y_LIMIT, integrate_points)
        func = basis_mod.get_impedance_func(part, basis_type, zga_params)
        # integrand shape: (N_f, N_tau, quad)
        vals = func(y[None, None, :], omega[:, None, None], tau[None, :, None], epsilon)
        return jnp.trapezoid(vals, x=y, axis=-1)
    else:
        raise ValueError(f"Invalid integrate_method {integrate_method!r}; options: interp, trapz")


# ------------------------------------------------------------------
# Chrono response matrix
# ------------------------------------------------------------------
def construct_response_matrix(basis_tau, times, step_model, step_times, step_sizes,
                              basis_type="gaussian", epsilon=0.975, tau_rise=None,
                              op_mode="galv", integrate_method="interp", integrate_points=1000,
                              zga_params=None, interpolate_grids=None):
    """Response matrix A with A @ x = modeled response to the input steps.

    Reference: mat1d.py:16-122 (triple python loop over steps/times/taus);
    here one broadcasted (step, time, tau) tensor summed over steps.
    Returns (A, A_layered) with A_layered of shape (n_steps, n_times, n_tau).
    """
    basis_tau = jnp.asarray(basis_tau)
    times = jnp.asarray(times)
    step_times = jnp.asarray(step_times)
    step_sizes = jnp.asarray(step_sizes)
    if tau_rise is None:
        tau_rise = jnp.zeros(step_times.shape)
    else:
        tau_rise = jnp.asarray(tau_rise)

    # (n_steps, n_times): time since each step
    td = times[None, :] - step_times[:, None]
    active = td > 0

    if op_mode == "pot":
        # Delta basis closed form (reference mat1d.py:114-118)
        expo = jnp.exp(-td[:, :, None] / basis_tau[None, None, :])
        a_layered = jnp.where((times[None, :, None] - step_times[:, None, None]) >= 0,
                              expo, 0.0) * step_sizes[:, None, None]
        a_layered = jnp.nan_to_num(a_layered, nan=0.0)
        return jnp.sum(a_layered, axis=0), a_layered

    if basis_type == "delta":
        func = basis_mod.get_response_func("delta", op_mode, step_model)
        if step_model == "ideal":
            vals = func(basis_tau[None, None, :], td[:, :, None])
        else:
            vals = func(basis_tau[None, None, :], td[:, :, None], tau_rise[:, None, None])
        a_layered = jnp.where(active[:, :, None], vals, 0.0) * step_sizes[:, None, None]
        return jnp.sum(a_layered, axis=0), a_layered

    if basis_type in ("Cole-Cole", "zga"):
        from . import mittag_leffler as ml
        if basis_type == "Cole-Cole":
            eps_ml = epsilon
        else:
            eps_ml = zga_params[2]
        td_safe = jnp.where(active[:, :, None], td[:, :, None], 1.0)
        ratio = (td_safe / basis_tau[None, None, :]) ** eps_ml
        vals = ratio * ml.mittag_leffler_neg(ratio, eps_ml, eps_ml + 1)
        if basis_type == "zga":
            y_basis, coef, eps_zga = zga_params
            parts = []
            for x_i, y_i in zip(coef[1:], y_basis):
                tau_i = basis_tau * jnp.exp(y_i)
                ratio = (td_safe / tau_i[None, None, :]) ** eps_zga
                parts.append(x_i * ratio * ml.mittag_leffler_neg(ratio, eps_zga, eps_zga + 1))
            vals = sum(parts)
        a_layered = jnp.where(active[:, :, None], vals, 0.0) * step_sizes[:, None, None]
        return jnp.sum(a_layered, axis=0), a_layered

    # Quadrature bases (gaussian etc.)
    if integrate_method == "interp":
        if interpolate_grids is None:
            tr = None if step_model == "ideal" else float(tau_rise[0])
            interpolate_grids = lookup_mod.generate_response_lookup(
                basis_type, op_mode, step_model, float(epsilon), tau_rise=tr)
        log_td_grid, response_grid = interpolate_grids
        td_safe = jnp.where(active, td, 1.0)
        log_ratio = jnp.log(td_safe[:, :, None] / basis_tau[None, None, :])
        vals = _interp(log_ratio, log_td_grid, response_grid)
    elif integrate_method == "trapz":
        y = jnp.linspace(-lookup_mod.Y_LIMIT, lookup_mod.Y_LIMIT, integrate_points)
        func = basis_mod.get_response_func(basis_type, op_mode, step_model, zga_params)
        td_safe = jnp.where(active, td, 1.0)
        # (steps, times, taus, quad)
        vals = func(y[None, None, None, :], basis_tau[None, None, :, None],
                    td_safe[:, :, None, None], epsilon, tau_rise[:, None, None, None])
        vals = jnp.trapezoid(vals, x=y, axis=-1)
    else:
        raise ValueError(f"Invalid integrate_method {integrate_method!r}")

    a_layered = jnp.where(active[:, :, None], vals, 0.0) * step_sizes[:, None, None]
    return jnp.sum(a_layered, axis=0), a_layered


# ------------------------------------------------------------------
# Integrated-derivative (ridge penalty) matrices
# ------------------------------------------------------------------
def construct_integrated_derivative_matrix(basis_grid, basis_type="gaussian", order=1,
                                           epsilon=1.0, zga_params=None, integration_limits=None):
    """M such that x^T M x = int (d^k gamma / d ln tau^k)^2 d ln tau.

    Reference: mat1d.py:125-209. Gaussian basis uses closed forms; delta basis
    uses discrete difference operators; other bases use eval-matrix squaring.
    """
    basis_grid = jnp.asarray(basis_grid)
    n = basis_grid.shape[0]

    if integration_limits is not None:
        func = basis_mod.integrated_derivative_kernel_indefinite(order)
        a, b = integration_limits
        xx_i = basis_grid[None, :]
        xx_j = basis_grid[:, None]
        return func(b, xx_i, xx_j, epsilon) - func(a, xx_i, xx_j, epsilon)

    if basis_type == "gaussian":
        if isinstance(order, (list, tuple)):
            f0, f1, f2 = order
            k0 = basis_mod.integrated_derivative_kernel(0)
            k1 = basis_mod.integrated_derivative_kernel(1)
            k2 = basis_mod.integrated_derivative_kernel(2)

            def func(x_n, x_m, eps):
                return f0 * k0(x_n, x_m, eps) + f1 * k1(x_n, x_m, eps) + f2 * k2(x_n, x_m, eps)
        else:
            func = basis_mod.integrated_derivative_kernel(order)
        return func(basis_grid[None, :], basis_grid[:, None], epsilon)

    if basis_type == "delta":
        grid = np.asarray(basis_grid)
        if order == 0:
            return jnp.eye(n)
        if order == 1:
            L = np.eye(n)
            np.fill_diagonal(L[1:, :-1], -1)
            L[0, 0] = 0
            L[1:, 1:] /= np.diff(grid)[:, None]
            return jnp.asarray(L.T @ L)
        if order == 2:
            L = np.eye(n) * 2
            L[0, 0] = 1
            L[-1, -1] = 1
            np.fill_diagonal(L[1:, :-1], -1)
            np.fill_diagonal(L[:-1, 1:], -1)
            L[1:, 1:] /= np.diff(grid)[:, None]
            L[:-1, :-1] /= np.diff(grid)[:, None]
            return jnp.asarray(L.T @ L)
        raise ValueError(f"Invalid order {order} for delta basis")

    # Generic: squared discrete evaluation matrix * grid spacing
    em = basis_mod.construct_func_eval_matrix(basis_grid, None, basis_type, epsilon, order, zga_params)
    m = em @ em
    grid_space = jnp.mean(jnp.abs(jnp.diff(basis_grid)))
    return m * grid_space


# ------------------------------------------------------------------
# Special-element response/impedance vectors
# ------------------------------------------------------------------
def construct_inductance_response_vector(times, step_model, step_times, step_sizes, tau_rise,
                                         op_mode="galv"):
    """Reference: mat1d.py:378-396. Zero for ideal steps."""
    times = jnp.asarray(times)
    if step_model != "expdecay":
        return jnp.zeros(times.shape)
    step_times = jnp.asarray(step_times)
    step_sizes = jnp.asarray(step_sizes)
    tau_rise = jnp.asarray(tau_rise)
    td = times[None, :] - step_times[:, None]
    vals = (step_sizes / tau_rise)[:, None] * jnp.exp(-td / tau_rise[:, None])
    return jnp.sum(jnp.where(td >= 0, vals, 0.0), axis=0)


def construct_ohmic_response_vector(times, step_model, step_times, step_sizes, tau_rise,
                                    input_signal, smooth, op_mode="galv"):
    """Reference: mat1d.py:399-421."""
    times = np.asarray(times)
    input_signal = np.asarray(input_signal)
    if smooth:
        from .. import preprocessing as pp
        input_signal = pp.generate_model_signal(times, np.asarray(step_times),
                                                np.asarray(step_sizes), tau_rise, step_model)
    else:
        prestep = input_signal[times < np.asarray(step_times)[0]]
        # Prediction grids may start after the first step (e.g. sequential
        # fitting); an empty pre-step window means no baseline offset
        offset = np.mean(prestep) if len(prestep) else 0.0
        input_signal = input_signal - offset
    if op_mode != "galv":
        raise ValueError("Ohmic response vector not implemented for potentiostatic mode")
    return jnp.asarray(input_signal)


def construct_capacitance_response_vector(times, step_model, step_times, step_sizes, tau_rise,
                                          op_mode="galv"):
    """Reference: mat1d.py:424-443 (ideal steps only)."""
    if step_model != "ideal":
        raise ValueError("Capacitance response not implemented for non-ideal steps")
    times = jnp.asarray(times)
    step_times = jnp.asarray(step_times)
    step_sizes = jnp.asarray(step_sizes)
    td = times[None, :] - step_times[:, None]
    return jnp.sum(jnp.where(td >= 0, step_sizes[:, None] * td, 0.0), axis=0)


def construct_inductance_impedance_vector(frequencies):
    return 1j * 2 * jnp.pi * jnp.asarray(frequencies)


def construct_capacitance_impedance_vector(frequencies):
    return 1 / (1j * 2 * jnp.pi * jnp.asarray(frequencies))


# ------------------------------------------------------------------
# Variance-estimation (local residual averaging) matrices
# ------------------------------------------------------------------
def construct_chrono_var_matrix(times, step_times, vmm_epsilon, error_structure=None):
    """Gaussian local-averaging matrix on the transformed (piecewise-log) time
    axis, block-diagonal per step segment (reference mat1d.py:457-490)."""
    times = np.asarray(times)
    n = len(times)
    if error_structure == "uniform":
        vmm = jnp.ones((n, n))
    else:
        from ..utils.chrono import get_time_transforms
        _, fwd = get_time_transforms(times, step_times)
        tt = jnp.asarray(fwd(times))
        vmm = basis_mod.construct_func_eval_matrix(tt, epsilon=vmm_epsilon, order=0)
        # Zero out cross-step correlation
        step_times = np.asarray(step_times)
        seg_id = np.searchsorted(step_times, times, side="right")  # 0 = pre-step
        seg = jnp.asarray(seg_id)
        same_seg = seg[:, None] == seg[None, :]
        vmm = jnp.where(same_seg, vmm, 0.0)
    rowsum = jnp.sum(vmm, axis=1, keepdims=True)
    return vmm / rowsum


def construct_eis_var_matrix(frequencies, vmm_epsilon, reim_cor, error_structure=None):
    """2N x 2N residual-averaging matrix over [Re; Im] with re/im correlation
    (reference mat1d.py:493-515)."""
    frequencies = jnp.asarray(frequencies)
    n = frequencies.shape[0]
    if error_structure == "uniform":
        vmm_main = jnp.ones((n, n))
    else:
        vmm_main = basis_mod.construct_func_eval_matrix(jnp.log(frequencies),
                                                        epsilon=vmm_epsilon, order=0)
    top = jnp.concatenate([vmm_main, vmm_main * reim_cor], axis=1)
    bot = jnp.concatenate([vmm_main * reim_cor, vmm_main], axis=1)
    vmm = jnp.concatenate([top, bot], axis=0)
    rowsum = jnp.sum(vmm, axis=1, keepdims=True)
    return vmm / rowsum


# ------------------------------------------------------------------
# PSD inversion
# ------------------------------------------------------------------
def invert_psd(a, use_cholesky=True):
    """Invert a positive semidefinite matrix (reference mat1d.py:521-540)."""
    a = jnp.asarray(a)
    if use_cholesky:
        import jax.scipy.linalg as jsl
        chol = jnp.linalg.cholesky(a)
        if bool(jnp.any(jnp.isnan(chol))):
            return jnp.linalg.inv(a)
        eye = jnp.eye(a.shape[0], dtype=a.dtype)
        return jsl.cho_solve((chol, True), eye)
    return jnp.linalg.inv(a)
