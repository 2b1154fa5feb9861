"""Distribution-of-phasances (DOP) basis matrices.

Vectorized jnp re-design of reference hybdrt/matrices/phasance.py: the DOP
represents constant-phase features with impedance (j*omega)^nu over a basis in
nu in [-1, 1]; gaussian-in-nu bases have closed-form erf integrals.
"""
import jax.numpy as jnp
from jax.scipy.special import gammaln

SQRT_PI = 1.7724538509055159


def _complex_erf(z, n_terms=32):
    """erf of complex argument via the Abramowitz-Stegun 7.1.29 series.

    Needed because the gaussian-in-nu impedance integral has a complex erf
    argument (reference phasance.py:26-32 relies on scipy.special.erf which
    accepts complex input). Accurate to ~1e-14 for |Im z| <~ 3, which covers
    the DOP integral's argument range (|Im| = pi/(4 eps) < 1 for eps >= 1).
    """
    from jax.scipy.special import erf as real_erf
    x = jnp.real(z)
    y = jnp.imag(z)
    # erf(x + iy) ~ erf(x) + exp(-x^2)/(2 pi x) [(1 - cos 2xy) + i sin 2xy]
    #   + (2/pi) exp(-x^2) sum_k exp(-k^2/4)/(k^2+4x^2) [f_k + i g_k]
    two_xy = 2 * x * y
    x_safe = jnp.where(x == 0, 1.0, x)
    term1 = jnp.where(
        x == 0,
        1j * y / jnp.pi,
        jnp.exp(-x ** 2) / (2 * jnp.pi * x_safe) * ((1 - jnp.cos(two_xy)) + 1j * jnp.sin(two_xy)),
    )
    k = jnp.arange(1, n_terms + 1, dtype=x.dtype)
    k = k.reshape((n_terms,) + (1,) * x.ndim)
    fk = 2 * x - 2 * x * jnp.cosh(k * y) * jnp.cos(two_xy) + k * jnp.sinh(k * y) * jnp.sin(two_xy)
    gk = 2 * x * jnp.cosh(k * y) * jnp.sin(two_xy) + k * jnp.sinh(k * y) * jnp.cos(two_xy)
    series = jnp.sum(jnp.exp(-k ** 2 / 4) / (k ** 2 + 4 * x ** 2) * (fk + 1j * gk), axis=0)
    term2 = (2 / jnp.pi) * jnp.exp(-x ** 2) * series
    return real_erf(x) + term1 + term2


def unit_phasor_impedance(omega, nu):
    return (1j * omega) ** nu


def unit_phasor_voltage(t, nu):
    return t ** (-nu) * jnp.exp(-gammaln(1 - nu))


def get_nu_limits(nu_m):
    a = jnp.minimum(0, jnp.sign(nu_m))
    b = jnp.maximum(0, jnp.sign(nu_m))
    return a, b


def _phasor_z_integral(nu, omega, nu_m, epsilon):
    """Indefinite integral of gaussian(nu - nu_m) * (j w)^nu d nu
    (reference phasance.py:29-33)."""
    log_jw = jnp.log(1j * omega)
    out = 0.5 * SQRT_PI * unit_phasor_impedance(omega, nu_m) / epsilon
    out = out * (1j * omega) ** (log_jw / (4 * epsilon ** 2))
    out = out * _complex_erf(epsilon * (nu - nu_m) - log_jw / (2 * epsilon))
    return out


def _phasor_v_integral(nu, t, nu_m, epsilon):
    """Indefinite integral of gaussian(nu - nu_m) * t^-nu / Gamma(1-nu)... the
    reference approximates Gamma via the closed form at the center nu_m
    (reference phasance.py:50-54)."""
    from jax.scipy.special import erf
    log_t = jnp.log(t)
    out = 0.5 * SQRT_PI * unit_phasor_voltage(t, nu_m) / epsilon
    out = out * t ** (log_t / (4 * epsilon ** 2))
    out = out * erf(epsilon * (nu - nu_m) + log_t / (2 * epsilon))
    return out


def construct_phasor_z_matrix(frequencies, basis_nu, nu_basis_type="gaussian", nu_epsilon=None,
                              normalize=False, tau_c=None):
    """Complex Z matrix: columns are phasor basis impedances (reference
    phasance.py:108-118)."""
    omega = 2 * jnp.pi * jnp.asarray(frequencies)
    basis_nu = jnp.asarray(basis_nu)
    ww = omega[:, None]
    nn = basis_nu[None, :]
    if nu_basis_type == "delta":
        return unit_phasor_impedance(ww, nn)
    a, b = get_nu_limits(nn)
    return _phasor_z_integral(b, ww, nn, nu_epsilon) - _phasor_z_integral(a, ww, nn, nu_epsilon)


def construct_phasor_v_matrix(times, basis_nu, nu_basis_type, nu_epsilon, step_model,
                              step_times, step_sizes, op_mode="galv"):
    """Response matrix for phasor elements under current steps (reference
    phasance.py:121-144). Returns (rm, rm_layered)."""
    if op_mode != "galv":
        raise ValueError("Phasor response is only implemented for galvanostatic mode")
    if step_model != "ideal":
        raise ValueError("Phasor response is only supported for ideal steps")
    times = jnp.asarray(times)
    step_times = jnp.asarray(step_times)
    step_sizes = jnp.asarray(step_sizes)
    basis_nu = jnp.asarray(basis_nu)

    td = times[None, :] - step_times[:, None]          # (steps, times)
    active = td > 0
    td_safe = jnp.where(active, td, 1.0)[:, :, None]   # (steps, times, 1)
    nn = basis_nu[None, None, :]
    if nu_basis_type == "delta":
        vals = unit_phasor_voltage(td_safe, nn)
    else:
        a, b = get_nu_limits(nn)
        vals = (_phasor_v_integral(b, td_safe, nn, nu_epsilon)
                - _phasor_v_integral(a, td_safe, nn, nu_epsilon))
    rm_layered = jnp.where(active[:, :, None], vals, 0.0) * step_sizes[:, None, None]
    return jnp.sum(rm_layered, axis=0), rm_layered


def phasor_scale_vector(nu, basis_tau, quantiles=(0.25, 0.75)):
    """Quantile-based column scaling for DOP coefficients (reference
    phasance.py:165-184)."""
    nu = jnp.asarray(nu)
    lt = jnp.log(jnp.asarray(basis_tau))
    lt_min, lt_max = jnp.min(lt), jnp.max(lt)
    lt_range = lt_max - lt_min
    tau_q1 = jnp.exp(lt_min + quantiles[0] * lt_range)
    tau_q3 = jnp.exp(lt_min + quantiles[1] * lt_range)
    return jnp.where(nu <= 0, tau_q3 ** nu, tau_q1 ** nu)
