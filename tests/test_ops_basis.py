"""Unit tests for basis functions and matrix assembly against independent
numerical references (quadrature, finite differences)."""
import numpy as np
import jax.numpy as jnp
import pytest

from hybdrt_tpu.ops import basis, mat1d, lookup


EPS = 4.342944819032518  # 10 ppd


def test_gaussian_derivatives_match_finite_difference():
    y = np.linspace(-3, 3, 41)
    h = 1e-5
    phi = basis.get_basis_func("gaussian")
    for order in (1, 2, 3):
        f = basis.get_basis_func_derivative("gaussian", order)
        if order == 1:
            fd = (phi(y + h, 2.0) - phi(y - h, 2.0)) / (2 * h)
        elif order == 2:
            fd = (phi(y + h, 2.0) - 2 * phi(y, 2.0) + phi(y - h, 2.0)) / h ** 2
        else:
            f2 = basis.get_basis_func_derivative("gaussian", 2)
            fd = (f2(y + h, 2.0) - f2(y - h, 2.0)) / (2 * h)
        assert np.allclose(np.asarray(f(y, 2.0)), np.asarray(fd), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_integrated_derivative_kernel_vs_quadrature(order):
    """Closed-form integral of d^k phi_n d^k phi_m equals direct quadrature."""
    eps = 2.0
    y = np.linspace(-30, 30, 200001)
    dfunc = basis.get_basis_func_derivative("gaussian", order)
    kern = basis.integrated_derivative_kernel(order)
    for x_n, x_m in [(0.0, 0.0), (0.0, 0.5), (-1.0, 1.5)]:
        num = np.trapezoid(np.asarray(dfunc(y - x_n, eps)) * np.asarray(dfunc(y - x_m, eps)), x=y)
        closed = float(kern(x_n, x_m, eps))
        assert np.isclose(num, closed, rtol=1e-6, atol=1e-12), (order, x_n, x_m)


def test_indefinite_integrated_derivative_matches_definite():
    """Indefinite kernel over (-inf, inf) limits reduces to the definite form."""
    eps = 2.0
    grid = jnp.linspace(-1.0, 1.0, 5)
    for order in (0, 1, 2):
        m_def = np.asarray(mat1d.construct_integrated_derivative_matrix(
            grid, order=order, epsilon=eps))
        m_indef = np.asarray(mat1d.construct_integrated_derivative_matrix(
            grid, order=order, epsilon=eps, integration_limits=(-60.0, 60.0)))
        assert np.allclose(m_def, m_indef, rtol=1e-8, atol=1e-10), order


def test_impedance_matrix_interp_matches_trapz():
    freq = np.logspace(5, -1, 40)
    tau = np.logspace(-6, 1, 71)
    for part in ("real", "imag"):
        a_interp = np.asarray(mat1d.construct_impedance_matrix(
            freq, part, tau, epsilon=EPS, integrate_method="interp"))
        a_trapz = np.asarray(mat1d.construct_impedance_matrix(
            freq, part, tau, epsilon=EPS, integrate_method="trapz"))
        assert np.max(np.abs(a_interp - a_trapz)) < 1e-5


def test_impedance_matrix_delta_basis_is_rc():
    """Delta basis gives exact single-RC impedance."""
    freq = np.logspace(3, -1, 11)
    tau = np.array([1e-3, 1e-2])
    w = 2 * np.pi * freq
    a_re = np.asarray(mat1d.construct_impedance_matrix(freq, "real", tau, basis_type="delta"))
    a_im = np.asarray(mat1d.construct_impedance_matrix(freq, "imag", tau, basis_type="delta"))
    expected = 1 / (1 + 1j * w[:, None] * tau[None, :])
    assert np.allclose(a_re, expected.real)
    assert np.allclose(a_im, expected.imag)


def test_response_matrix_delta_basis_is_exponential():
    times = np.linspace(0, 1, 50)[1:]
    tau = np.array([0.01, 0.1])
    a, a_layered = mat1d.construct_response_matrix(
        tau, times, "ideal", np.array([0.0]), np.array([2.0]), basis_type="delta")
    expected = 2.0 * (1 - np.exp(-times[:, None] / tau[None, :]))
    assert np.allclose(np.asarray(a), expected)
    assert a_layered.shape == (1, len(times), 2)


def test_response_matrix_interp_matches_trapz():
    times = np.logspace(-5, 0, 30)
    tau = np.logspace(-5, 0, 21)
    kw = dict(basis_type="gaussian", epsilon=EPS)
    a_i, _ = mat1d.construct_response_matrix(tau, times, "ideal", np.array([0.0]),
                                             np.array([1.0]), integrate_method="interp", **kw)
    a_t, _ = mat1d.construct_response_matrix(tau, times, "ideal", np.array([0.0]),
                                             np.array([1.0]), integrate_method="trapz", **kw)
    assert np.max(np.abs(np.asarray(a_i) - np.asarray(a_t))) < 2e-5


def test_eis_var_matrix_properties():
    freq = np.logspace(4, 0, 17)
    vmm = np.asarray(mat1d.construct_eis_var_matrix(freq, 0.25, 0.25, None))
    assert vmm.shape == (34, 34)
    assert np.allclose(vmm.sum(axis=1), 1.0)
    assert np.all(vmm >= 0)
    # uniform structure: same-part weight 1, cross-part weight reim_cor, rows normalized
    vmm_u = np.asarray(mat1d.construct_eis_var_matrix(freq, 0.25, 0.25, "uniform"))
    n = 17
    rowsum = n * (1 + 0.25)
    assert np.allclose(vmm_u[:n, :n], 1.0 / rowsum)
    assert np.allclose(vmm_u[:n, n:], 0.25 / rowsum)
    assert np.allclose(vmm_u.sum(axis=1), 1.0)


def test_chrono_var_matrix_blocks_per_step():
    times = np.concatenate([np.linspace(-0.1, -0.01, 5), np.linspace(0.001, 0.5, 20),
                            np.linspace(0.501, 1.0, 20)])
    step_times = np.array([0.0, 0.5005])
    vmm = np.asarray(mat1d.construct_chrono_var_matrix(times, step_times, 4.0, None))
    assert np.allclose(vmm.sum(axis=1), 1.0)
    # no correlation across step boundary
    assert np.all(vmm[:5, 5:] == 0)
    assert np.all(vmm[5:25, 25:] == 0)


def test_lookup_tables_monotonic_domain():
    (lg_re, z_re), (lg_im, z_im) = lookup.generate_impedance_lookup("gaussian", EPS)
    assert len(lg_re) == 2000 and len(z_re) == 2000
    assert np.all(np.diff(lg_re) > 0)
    # real part decays monotonically with wt
    assert z_re[0] > z_re[-1]
    lg_td, resp = lookup.generate_response_lookup("gaussian", "galv", "ideal", EPS)
    assert np.all(np.diff(resp) > -1e-12)  # step response is nondecreasing in t/tau


def test_basis_library_complete():
    """Every basis type in the validation list resolves to a callable, and the
    full reference set (utils/validation.py:7) is covered."""
    from hybdrt_tpu.ops import basis as B
    from hybdrt_tpu.utils import validation
    reference_set = {"gaussian", "beta", "beta-rbf", "Cole-Cole", "step",
                     "delta", "ramp", "pwl", "pwl_transformed", "zga"}
    assert reference_set <= set(validation.basis_options) | {"zga"}
    y = np.linspace(-2, 2, 101)
    zga_params = (np.array([-0.5, 0.5]), np.array([0.0, 0.6, 0.4]), 0.9)
    for bt in validation.basis_options + ["zga"]:
        phi = B.get_basis_func(bt, zga_params=zga_params)
        if bt == "beta-rbf":
            out = np.asarray(phi(y, 0.3, 1.5))
        else:
            out = np.asarray(phi(y, 1.5))
        assert out.shape == y.shape and np.all(np.isfinite(out)), bt


@pytest.mark.parametrize("order", [1, 2])
def test_beta_and_beta_rbf_derivatives_vs_autodiff(order):
    """beta / beta-rbf closed-form derivatives against jax autodiff of the
    basis function itself (independent oracle; avoids |y|=0 and the beta
    envelope kink)."""
    import jax
    from hybdrt_tpu.ops import basis as B
    y = np.linspace(0.05, 0.95, 19)  # one smooth branch of |y|(1-|y|)

    d_beta = B.get_basis_func_derivative("beta", order)
    f = B.beta
    for _ in range(order):
        f = jax.grad(f)
    ad = np.array([float(f(float(v))) for v in y])
    assert np.allclose(np.asarray(d_beta(y)), ad, atol=1e-10)

    d_brbf = B.get_basis_func_derivative("beta-rbf", order)
    mu, eps = 0.3, 1.5
    g = lambda v: B.beta_rbf(v, mu, eps)
    for _ in range(order):
        g = jax.grad(g)
    ad2 = np.array([float(g(float(v))) for v in y])
    assert np.allclose(np.asarray(d_brbf(y, mu, eps)), ad2, atol=1e-8)


def test_fit_basis_functions_recovers_expansion():
    """fit_basis_functions solves the bounded LS problem: synthesizing a
    signal from a known nonnegative gaussian expansion and refitting it on
    the same centers recovers the coefficients (reference basis.py:10-66)."""
    from hybdrt_tpu.ops import basis as B
    basis_x = np.linspace(-2, 2, 9)
    coef_true = np.array([0.0, 0.1, 0.8, 0.3, 1.2, 0.05, 0.6, 0.0, 0.25])
    x = np.linspace(-5, 5, 400)
    eps = 1 / np.mean(np.diff(basis_x))
    f = B.evaluate_basis_fit(np.concatenate(([0.0], coef_true)), x, basis_x,
                             "gaussian", eps)
    coef = B.fit_basis_functions(x, f, basis_x, "gaussian", eps, nonneg=True,
                                 fit_intercept=False)
    assert coef[0] == 0.0  # intercept slot padded
    assert np.allclose(coef[1:], coef_true, atol=1e-5)


def test_zga_approx_params_match_gaussian():
    """The optimized Cole-Cole expansion approximates the gaussian RBF
    closely over the fit window (reference basis.py:432-487,
    drtbase.py:684-700)."""
    from hybdrt_tpu.ops import basis as B
    import jax.numpy as jnp
    eps_exact = 2.0
    x_basis, coef, eps = B.get_basis_approx_params(
        "gaussian", "Cole-Cole", eps_exact, num_bases=7, basis_extent=2)
    assert len(coef) == 8 and coef[0] == 0.0
    assert 0 < eps < 1  # optimized shape parameter
    y = np.linspace(-2 / eps_exact, 2 / eps_exact, 101)
    f_exact = np.exp(-(eps_exact * y) ** 2)
    phi_zga = B.get_basis_func("zga", (x_basis, coef, eps))
    f_zga = np.asarray(phi_zga(jnp.asarray(y), eps_exact))
    assert np.max(np.abs(f_zga - f_exact)) < 1e-2


def test_drt_set_zga_params_computes():
    """DRT.set_zga_params() with no tuple optimizes the approximation at the
    model's tau_epsilon (reference drtbase.py:684-700)."""
    from hybdrt_tpu import DRT
    drt = DRT(fixed_basis_tau=np.logspace(-6, 1, 51))
    drt.set_zga_params(num_bases=5)
    x_basis, coef, eps = drt.zga_params
    assert len(x_basis) == 5 and len(coef) == 6
    assert 0 < eps <= 1


def test_func_eval_matrix_host_caches_and_matches():
    """Host-side getters use the CPU-pinned cached eval matrix: same values
    as the traced builder, and the second call is a cache hit (the eager
    jnp build costs a per-process server-side compile on a remote default
    device — 6.3 s of a 6.5 s postproc pipeline before the helper)."""
    import numpy as np
    from hybdrt_tpu.ops import basis as B

    grid = np.log(np.logspace(-6, 1, 41))
    em1 = B.func_eval_matrix_host(grid, None, "gaussian", 1.1, 2)
    em2 = B.func_eval_matrix_host(grid.copy(), None, "gaussian", 1.1, 2)
    assert em1 is em2  # cache hit on equal key, not just equal values
    ref = np.asarray(B.construct_func_eval_matrix(grid, None, "gaussian",
                                                  1.1, 2), dtype=float)
    np.testing.assert_allclose(em1, ref, rtol=1e-12, atol=1e-12)
    # bounded: the cache never grows past its cap
    for i in range(B._EVAL_MATRIX_HOST_CACHE_MAX + 8):
        B.func_eval_matrix_host(grid, grid + 1e-9 * (i + 1), "gaussian", 1.1, 0)
    assert len(B._EVAL_MATRIX_HOST_CACHE) <= B._EVAL_MATRIX_HOST_CACHE_MAX
