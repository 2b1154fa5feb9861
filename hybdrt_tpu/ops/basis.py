"""Radial basis functions for the DRT in ln(tau) space and the DOP in nu space.

TPU-first re-design of reference hybdrt/matrices/basis.py: every basis
function, derivative, and closed-form integral is a vectorized jnp expression
usable inside jit (no python-loop quadrature, no scipy).

Closed forms (gaussian basis):
  * phi(y) = exp(-(eps*y)^2)                        (reference basis.py:93-95)
  * d^k phi / dy^k for k=1..3                       (reference basis.py:219-233)
  * integral phi dy = sqrt(pi)/(2 eps) (1+erf(eps y))  (reference basis.py:312-314)
  * M_k(x_n, x_m) = int d^k phi_n * d^k phi_m dy, k=0..3 (reference basis.py:381-400)
"""
import jax.numpy as jnp
from jax.scipy.special import erf

SQRT_PI = 1.7724538509055159


# ------------------------------------------------------------------
# Basis functions phi(y, epsilon); y = ln(tau / tau_m) or (nu - nu_m)
# ------------------------------------------------------------------
def gaussian(y, epsilon):
    return jnp.exp(-((epsilon * y) ** 2))


def cole_cole(y, epsilon):
    """ZARC/Cole-Cole distribution in ln tau (reference basis.py:105-108)."""
    return (1 / (2 * jnp.pi)) * jnp.sin((1 - epsilon) * jnp.pi) / (
        jnp.cosh(epsilon * y) - jnp.cos((1 - epsilon) * jnp.pi))


def zic(y, epsilon=None):
    return 2 * jnp.exp(y) / (1 + jnp.exp(2 * y))


def pwl(y, epsilon):
    half_width = 1 / epsilon
    return jnp.where(jnp.abs(y) < half_width, (half_width - jnp.abs(y)) * epsilon, 0.0)


def step(y, epsilon=None):
    return jnp.where(y >= 0, 1.0, 0.0)


def delta(y, epsilon=None):
    return jnp.where(y == 0, 1.0, 0.0)


def beta(y, epsilon=None):
    return jnp.abs(y) * (1 - jnp.abs(y))


def beta_rbf(y, mu, epsilon):
    """Gaussian RBF centered at mu windowed by the beta envelope
    (reference basis.py:99-104). Signature phi(y, mu, epsilon)."""
    return gaussian(y - mu, epsilon) * beta(y)


def ramp(y, epsilon):
    return jnp.where(y > 0, y * epsilon, 0.0)


def bounded_ramp(y, epsilon):
    width = 1 / epsilon
    return jnp.clip(y * epsilon, 0.0, 1.0) * jnp.where(y > 0, 1.0, 0.0) + 0.0 * width


def pwl_transformed(y, epsilon):
    half_width = 1 / epsilon
    rise = (half_width - jnp.abs(y)) / half_width
    return jnp.where(y >= 0, 1.0, jnp.where(y > -half_width, rise, 0.0))


_BASIS_FUNCS = {
    "gaussian": gaussian,
    "Cole-Cole": cole_cole,
    "Zic": zic,
    "pwl": pwl,
    "step": step,
    "delta": delta,
    "beta": beta,
    "beta-rbf": beta_rbf,
    "ramp": ramp,
    "bounded_ramp": bounded_ramp,
    "pwl_transformed": pwl_transformed,
}


def get_basis_func(basis_type, zga_params=None):
    """Return phi(y, epsilon) for the requested basis type."""
    if basis_type == "zga":
        y_basis, coef, eps_zga = zga_params

        def phi(y, epsilon):
            y = jnp.asarray(y)
            terms = jnp.stack([x_i * cole_cole(y + y_i, eps_zga)
                               for x_i, y_i in zip(coef[1:], y_basis)])
            return jnp.sum(terms, axis=0)

        return phi
    try:
        return _BASIS_FUNCS[basis_type]
    except KeyError:
        raise ValueError(f"Unknown basis_type {basis_type!r}")


# ------------------------------------------------------------------
# Derivatives of basis functions
# ------------------------------------------------------------------
def get_basis_func_derivative(basis_type, order, zga_params=None):
    """d^order phi / dy^order (reference basis.py:205-300)."""
    if order == 0:
        return get_basis_func(basis_type, zga_params)

    if basis_type == "gaussian":
        if order == 1:
            return lambda y, epsilon: -2 * epsilon ** 2 * y * gaussian(y, epsilon)
        if order == 2:
            return lambda y, epsilon: (-2 * epsilon ** 2 + 4 * epsilon ** 4 * y ** 2) * gaussian(y, epsilon)
        if order == 3:
            return lambda y, epsilon: (12 * epsilon ** 4 * y - 8 * epsilon ** 6 * y ** 3) * gaussian(y, epsilon)
    elif basis_type == "Cole-Cole":
        if order == 1:
            def func(y, epsilon):
                nume = -jnp.sin((1 - epsilon) * jnp.pi) * jnp.sinh(epsilon * y) * epsilon
                deno = 2 * jnp.pi * (jnp.cosh(epsilon * y) - jnp.cos((1 - epsilon) * jnp.pi)) ** 2
                return nume / deno
            return func
        if order == 2:
            def func(y, epsilon):
                c = jnp.cos((1 - epsilon) * jnp.pi)
                nume = epsilon ** 2 * jnp.sin((1 - epsilon) * jnp.pi) * (
                    2 * jnp.sinh(epsilon * y) ** 2 - (jnp.cosh(epsilon * y) - c) * jnp.cosh(epsilon * y))
                deno = 2 * jnp.pi * (jnp.cosh(epsilon * y) - c) ** 3
                return nume / deno
            return func
    elif basis_type == "zga":
        y_basis, coef, eps_zga = zga_params
        f_zarc = get_basis_func_derivative("Cole-Cole", order)

        def func(y, epsilon):
            terms = jnp.stack([x_i * f_zarc(jnp.asarray(y) + y_i, eps_zga)
                               for x_i, y_i in zip(coef[1:], y_basis)])
            return jnp.sum(terms, axis=0)
        return func
    elif basis_type == "beta":
        if order == 1:
            return lambda y, epsilon=None: jnp.sign(y) - 2 * y
        if order == 2:
            return lambda y, epsilon=None: -2 * jnp.ones_like(jnp.asarray(y, dtype=float))
    elif basis_type == "beta-rbf":
        f = gaussian
        fx = get_basis_func_derivative("gaussian", 1)
        g = beta
        gx = get_basis_func_derivative("beta", 1)
        if order == 1:
            return lambda y, mu, epsilon: (f(y - mu, epsilon) * gx(y)
                                           + fx(y - mu, epsilon) * g(y))
        if order == 2:
            fxx = get_basis_func_derivative("gaussian", 2)
            gxx = get_basis_func_derivative("beta", 2)
            return lambda y, mu, epsilon: (gxx(y) * f(y - mu, epsilon)
                                           + 2 * gx(y) * fx(y - mu, epsilon)
                                           + fxx(y - mu, epsilon) * g(y))
    elif basis_type == "pwl":
        phi = get_basis_func("pwl")

        def ddiff(f, y, epsilon):
            dy = epsilon / 5
            return (f(y + dy, epsilon) - f(y - dy, epsilon)) / (2 * dy)

        if order == 1:
            return lambda y, epsilon: ddiff(phi, y, epsilon)
        if order == 2:
            return lambda y, epsilon: ddiff(lambda yy, ee: ddiff(phi, yy, ee), y, epsilon)

    raise ValueError(f"Derivative of order {order} not implemented for basis type {basis_type}")


def get_basis_func_integral(basis_type):
    """Indefinite integral of phi (reference basis.py:303-322)."""
    if basis_type == "gaussian":
        return lambda y, epsilon: (SQRT_PI / (2 * epsilon)) * (1 + erf(epsilon * y))
    if basis_type == "delta":
        return lambda y, epsilon: jnp.where(y >= 0, 1.0, 0.0)
    raise ValueError(f"Basis func integral not implemented for basis_type {basis_type}")


def get_basis_func_area(basis_type, epsilon, zga_params=None):
    """Total area under phi (reference basis.py:407-429)."""
    if basis_type == "gaussian":
        return SQRT_PI / epsilon
    if basis_type in ("Cole-Cole", "delta"):
        return 1.0
    if basis_type == "zga":
        return float(len(zga_params[0]))
    if basis_type == "pwl":
        return 1 / epsilon
    raise ValueError(f"Area undefined for basis_type {basis_type}")


# ------------------------------------------------------------------
# Integrated-derivative penalty kernels (gaussian basis, closed form)
# ------------------------------------------------------------------
def integrated_derivative_kernel(order):
    """func(x_n, x_m, epsilon) = int_-inf^inf d^k phi_n d^k phi_m d(ln tau).

    Closed-form erf/exp expressions (reference basis.py:381-400).
    """
    if order == 0:
        def func(x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            return jnp.sqrt(jnp.pi / 2) / epsilon * jnp.exp(-(a ** 2) / 2)
    elif order == 1:
        def func(x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            return -jnp.sqrt(jnp.pi / 2) * epsilon * (-1 + a ** 2) * jnp.exp(-(a ** 2) / 2)
    elif order == 2:
        def func(x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            return jnp.sqrt(jnp.pi / 2) * epsilon ** 3 * (3 - 6 * a ** 2 + a ** 4) * jnp.exp(-(a ** 2) / 2)
    elif order == 3:
        def func(x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            return -jnp.sqrt(jnp.pi / 2) * epsilon ** 5 * (-15 + 45 * a ** 2 - 15 * a ** 4 + a ** 6) \
                * jnp.exp(-(a ** 2) / 2)
    else:
        raise ValueError(f"Invalid order {order}; must be in 0..3")
    return func


def integrated_derivative_kernel_indefinite(order):
    """Indefinite version for truncated integration limits (reference basis.py:344-380)."""
    if order == 0:
        def func(x, x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            b = epsilon * (x_m + x_n - 2 * x)
            out = erf(b / jnp.sqrt(2.0))
            return out * (-jnp.sqrt(jnp.pi / 8) / epsilon * jnp.exp(-0.5 * a ** 2))
    elif order == 1:
        def func(x, x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            b = epsilon * (x_m + x_n - 2 * x)
            e_full = epsilon ** 2 * (2 * x * (x_m + x_n) - (x_m ** 2 + x_n ** 2 + 2 * x ** 2))
            e_erf = epsilon ** 2 * (0.5 * ((x_m + x_n) ** 2 + 4 * x ** 2)
                                    - (x_m ** 2 + x_n ** 2 + 2 * x ** 2))
            out = b * jnp.exp(e_full)
            out = out + 0.5 * jnp.sqrt(2 * jnp.pi) * (a ** 2 - 1) * jnp.exp(e_erf) * erf(b / jnp.sqrt(2.0))
            return out * 0.5 * epsilon
    elif order == 2:
        def func(x, x_n, x_m, epsilon):
            a = epsilon * (x_m - x_n)
            b = epsilon * (x_m + x_n - 2 * x)
            e_full = epsilon ** 2 * (2 * x * (x_m + x_n) - (x_m ** 2 + x_n ** 2 + 2 * x ** 2))
            e_erf = epsilon ** 2 * (0.5 * ((x_m + x_n) ** 2 + 4 * x ** 2)
                                    - (x_m ** 2 + x_n ** 2 + 2 * x ** 2))
            out = 2 * b * jnp.exp(e_full) * (3 * a ** 2 - 2 * epsilon ** 2
                                             * ((x - x_m) ** 2 + (x - x_n) ** 2) + 1)
            out = out + jnp.sqrt(2 * jnp.pi) * (a ** 4 - 6 * a ** 2 + 3) * jnp.exp(e_erf) \
                * erf(b / jnp.sqrt(2.0))
            return out * (-0.25 * epsilon ** 3)
    else:
        raise ValueError(f"Invalid order {order}; must be in 0..2 for indefinite kernels")
    return func


# ------------------------------------------------------------------
# Function evaluation matrices
# ------------------------------------------------------------------
def construct_func_eval_matrix(basis_grid, eval_grid=None, basis_type="gaussian", epsilon=1.0,
                               order=0, zga_params=None):
    """em @ x = vector of the order-th derivative of the fitted distribution
    evaluated at eval_grid (reference basis.py:488-514)."""
    basis_grid = jnp.asarray(basis_grid)
    if eval_grid is None:
        eval_grid = basis_grid
    eval_grid = jnp.asarray(eval_grid)
    func = get_basis_func_derivative(basis_type, order, zga_params)
    return func(eval_grid[:, None] - basis_grid[None, :], epsilon)


_EVAL_MATRIX_HOST_CACHE = {}
_EVAL_MATRIX_HOST_CACHE_MAX = 64


def func_eval_matrix_host(basis_grid, eval_grid=None, basis_type="gaussian",
                          epsilon=1.0, order=0, zga_params=None):
    """CPU-pinned, cached :func:`construct_func_eval_matrix` for host-side
    getters (predict_gamma/predict_dop, map postprocessing).

    The matrix is tiny but built with eager jnp ops: on a process whose
    default device is a remote accelerator every distinct op pays a
    per-process server-side compile (measured ~2 s per derivative order on
    the tunneled chip — 6.3 s of a 6.5 s map postproc pipeline before this
    helper existed). Host-side callers must use this instead of calling
    construct_func_eval_matrix directly; device compute paths (mat1d,
    resolve) keep the direct traced call."""
    from ..utils.device import host_cpu
    import numpy as np
    basis_grid = np.asarray(basis_grid, dtype=float)
    eval_grid = basis_grid if eval_grid is None \
        else np.asarray(eval_grid, dtype=float)
    if zga_params is None:
        zkey = None
    else:
        try:
            zkey = tuple(np.asarray(p, dtype=float).tobytes()
                         for p in zga_params)
        except TypeError:
            zkey = np.asarray(zga_params, dtype=float).tobytes()
    key = (basis_grid.tobytes(), eval_grid.tobytes(), basis_type,
           float(epsilon), int(order), zkey)
    em = _EVAL_MATRIX_HOST_CACHE.get(key)
    if em is None:
        with host_cpu():
            em = np.asarray(construct_func_eval_matrix(
                basis_grid, eval_grid, basis_type, epsilon, order,
                zga_params), dtype=float)
        if len(_EVAL_MATRIX_HOST_CACHE) >= _EVAL_MATRIX_HOST_CACHE_MAX:
            # user-supplied eval grids vary per call; bound the cache
            _EVAL_MATRIX_HOST_CACHE.pop(next(iter(_EVAL_MATRIX_HOST_CACHE)))
        _EVAL_MATRIX_HOST_CACHE[key] = em
    return em


# ------------------------------------------------------------------
# Impedance and time-response integrands
# ------------------------------------------------------------------
def get_impedance_func(part, basis_type="gaussian", zga_params=None):
    """Integrand (or analytic expression) for the impedance matrix
    (reference basis.py:517-574).

    For analytic bases (Cole-Cole, delta, zga) returns func(w_n, t_m, epsilon);
    for quadrature bases returns func(y, w_n, t_m, epsilon) with y = ln(tau/tau_m).
    """
    if basis_type == "Cole-Cole":
        if part == "real":
            return lambda w_n, t_m, epsilon: jnp.real(1 / (1 + (1j * w_n * t_m) ** epsilon))
        return lambda w_n, t_m, epsilon: jnp.imag(1 / (1 + (1j * w_n * t_m) ** epsilon))
    if basis_type == "delta":
        if part == "real":
            return lambda w_n, t_m, epsilon: 1 / (1 + (w_n * t_m) ** 2)
        return lambda w_n, t_m, epsilon: -w_n * t_m / (1 + (w_n * t_m) ** 2)
    if basis_type == "zga":
        y_basis, coef, eps_zga = zga_params
        f_zarc = get_impedance_func(part, "Cole-Cole")

        def func(w_n, t_m, epsilon):
            terms = jnp.stack([x_i * f_zarc(w_n, t_m * jnp.exp(y_i), eps_zga)
                               for x_i, y_i in zip(coef[1:], y_basis)])
            return jnp.sum(terms, axis=0)
        return func

    basis_func = get_basis_func(basis_type)
    if part == "real":
        def func(y, w_n, t_m, epsilon):
            return basis_func(y, epsilon) / (1 + jnp.exp(2 * (y + jnp.log(w_n * t_m))))
    elif part == "imag":
        def func(y, w_n, t_m, epsilon):
            return -basis_func(y, epsilon) * jnp.exp(y) * w_n * t_m \
                / (1 + jnp.exp(2 * (y + jnp.log(w_n * t_m))))
    else:
        raise ValueError(f"Invalid part {part!r}; options: real, imag")
    return func


def get_response_func(basis_type, op_mode="galv", step_model="ideal", zga_params=None):
    """Integrand for the chrono step-response matrix (reference basis.py:577-642).

    Quadrature form: func(y, tau_m, t_n, epsilon, tau_rise); analytic bases
    return func(tau_m, t_n, ...) directly.
    """
    if op_mode != "galv":
        raise ValueError("Response integrand only defined for galvanostatic mode; "
                         "potentiostatic response uses the delta-basis closed form")
    f_basis = get_basis_func(basis_type, zga_params)

    if step_model == "ideal":
        if basis_type == "delta":
            return lambda tau_m, t_n: 1 - jnp.exp(-t_n / tau_m)

        def func(y, tau_m, t_n, epsilon, tau_rise):
            return f_basis(y, epsilon) * (1 - jnp.exp(-t_n / (tau_m * jnp.exp(y))))
        return func
    elif step_model == "expdecay":
        if basis_type == "delta":
            def func(tau_m, t_n, tau_rise):
                return (1 - jnp.exp(-t_n / tau_m)
                        + (tau_rise / (tau_rise - tau_m))
                        * (jnp.exp(-t_n / tau_m) - jnp.exp(-t_n / tau_rise)))
            return func

        def func(y, tau_m, t_n, epsilon, tau_rise):
            tau = jnp.exp(y) * tau_m
            return f_basis(y, epsilon) * (1 - jnp.exp(-t_n / tau)
                                          + (tau_rise / (tau_rise - tau))
                                          * (jnp.exp(-t_n / tau) - jnp.exp(-t_n / tau_rise)))
        return func
    raise ValueError(f"Invalid step_model {step_model!r}")


# ------------------------------------------------------------------
# Basis-approximation fitting (reference basis.py:10-83,432-487): express one
# basis function as a finite sum of another family's basis functions. Used to
# build the ZGA basis (gaussian RBF approximated by Cole-Cole/ZARC elements,
# reference drtbase.py:688-700) so that ZGA fits admit exact analytic
# impedance/response kernels.
# ------------------------------------------------------------------

def _basis_design_matrix(x, basis_x, basis_type, epsilon, fit_intercept):
    """Design matrix A with A[n, k] = phi((x_n - basis_x_k), eps_k), plus an
    optional leading intercept column. One broadcasted evaluation instead of
    the reference's per-column python loop (reference basis.py:43-46)."""
    import numpy as np
    x = jnp.asarray(np.atleast_1d(np.asarray(x, dtype=float)))
    basis_x = jnp.asarray(np.asarray(basis_x, dtype=float))
    eps = jnp.broadcast_to(jnp.asarray(epsilon, dtype=x.dtype), basis_x.shape)
    phi = get_basis_func(basis_type)
    cols = phi(x[:, None] - basis_x[None, :], eps[None, :])
    if fit_intercept:
        cols = jnp.concatenate([jnp.ones((cols.shape[0], 1), cols.dtype), cols],
                               axis=1)
    return cols


def fit_basis_functions(x, f, basis_x, basis_type, epsilon=None, l1_lambda=0.0,
                        l2_lambda=0.0, nonneg=False, fit_intercept=True):
    """Fit coefficients c so that sum_k c_k phi(x - basis_x_k, eps_k) ~= f(x)
    (reference basis.py:10-66). The bounded least-squares problem is solved
    with this package's own interior-point box QP (ops/qp.py) instead of
    cvxopt; coefficients are bounded below by 0 (nonneg) or -10 (matching the
    reference's constraint vector). Returns coef with a leading intercept
    entry (0 when fit_intercept=False)."""
    import numpy as np
    from . import qp
    if epsilon is None:
        if basis_type == "gaussian":
            epsilon = 1.0 / float(np.mean(np.diff(np.asarray(basis_x, float))))
        elif basis_type == "Cole-Cole":
            epsilon = 0.96
        else:
            raise ValueError(f"No default epsilon for basis_type {basis_type!r}")
    A = _basis_design_matrix(x, basis_x, basis_type, epsilon, fit_intercept)
    f = jnp.asarray(np.atleast_1d(np.asarray(f, dtype=float)))
    n = A.shape[1]
    P = A.T @ A + l2_lambda * jnp.eye(n, dtype=A.dtype)
    qv = -(f @ A) + l1_lambda * jnp.ones(n, A.dtype)
    lb = jnp.full(n, 0.0 if nonneg else -10.0, A.dtype)
    res = qp.solve_qp_box(P, qv, lb)
    coef = np.asarray(res.x)
    if not fit_intercept:
        coef = np.concatenate(([0.0], coef))
    return coef


def evaluate_basis_fit(coef, eval_x, basis_x, basis_type, epsilon):
    """Evaluate a fit_basis_functions expansion at eval_x (reference
    basis.py:69-83). coef[0] is the intercept."""
    import numpy as np
    A = _basis_design_matrix(eval_x, basis_x, basis_type, epsilon,
                             fit_intercept=True)
    return np.asarray(A @ jnp.asarray(np.asarray(coef, dtype=float)))


def get_basis_approx_params(exact_basis_type, approx_basis_type,
                            exact_func_epsilon, approx_func_epsilon=None,
                            num_bases=21, basis_extent=2,
                            curvature_penalty=None, nonneg=False):
    """Approximate exact_basis_type by num_bases approx_basis_type functions
    (reference basis.py:432-487): returns (x_basis, coef, epsilon) — the ZGA
    parameter tuple consumed by get_basis_func('zga', ...). When
    approx_func_epsilon is None the shared shape parameter is optimized by
    bounded scalar minimization of ||f_hat - f_exact||^2 plus a curvature
    penalty on the fitted expansion (the reference wraps the same objective
    in least_squares)."""
    import numpy as np
    if exact_basis_type != "gaussian":
        raise ValueError("Basis approximation only implemented for the "
                         "gaussian RBF")
    x_basis = np.linspace(-basis_extent / exact_func_epsilon,
                          basis_extent / exact_func_epsilon, num_bases)
    x_eval = np.linspace(-10 / exact_func_epsilon, 10 / exact_func_epsilon,
                         2000)
    phi_exact = get_basis_func(exact_basis_type)
    f_exact = np.asarray(phi_exact(jnp.asarray(x_eval), exact_func_epsilon))
    if curvature_penalty is None:
        curvature_penalty = 1e-2 / exact_func_epsilon ** 2

    def fit(eps):
        return fit_basis_functions(x_eval, f_exact, x_basis, approx_basis_type,
                                   eps, nonneg=nonneg, fit_intercept=False)

    if approx_func_epsilon is not None:
        return x_basis, fit(approx_func_epsilon), approx_func_epsilon

    def objective(eps):
        coef = fit(eps)
        f_hat = evaluate_basis_fit(coef, x_eval, x_basis, approx_basis_type,
                                   eps)
        p2 = construct_func_eval_matrix(x_basis, x_basis, approx_basis_type,
                                        eps, order=2)
        curv = curvature_penalty * np.asarray(p2 @ jnp.asarray(coef[1:]))
        return float(np.sum((f_hat - f_exact) ** 2) + np.sum(curv ** 2))

    from scipy.optimize import minimize_scalar
    result = minimize_scalar(objective, bounds=(1e-3, 1.0), method="bounded",
                             options={"xatol": 1e-4})
    eps_opt = float(result.x)
    return x_basis, fit(eps_opt), eps_opt
