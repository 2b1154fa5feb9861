"""Integral lookup tables for fast matrix assembly.

The impedance/response matrix elements for quadrature bases depend only on the
scalar products w_n*tau_m (impedance) or (t_n - t_step)/tau_m (response), so a
1-D table of the integral vs. that product plus linear interpolation recovers
the full matrix (reference: hybdrt/matrices/basis.py:648-689).

Tables are generated once per (basis_type, epsilon) in float64 numpy on the
host with the exact grids and trapezoid rule of the reference, so that fits
are numerically interchangeable with the reference's default
``integrate_method='interp'`` path. Matrix assembly from the tables is pure
``jnp.interp`` and runs on device (see ops.mat1d).
"""
from functools import lru_cache

import numpy as np

from . import basis as basis_mod

IMPEDANCE_GRID_POINTS = 2000
RESPONSE_GRID_POINTS = 2000
QUAD_POINTS = 1000
Y_LIMIT = 20.0
# Lookup domain half-widths in log10(w*tau); imag integrand decays ~2x slower
RE_LIM = 2.7
IM_LIM = 2 * RE_LIM


def _np_func(f):
    """Evaluate a jnp closed form with numpy inputs, returning numpy."""
    def wrapped(*args):
        return np.asarray(f(*args))
    return wrapped


@lru_cache(maxsize=16)
def generate_impedance_lookup(basis_type, epsilon, grid_points=IMPEDANCE_GRID_POINTS,
                              zga_key=None):
    """Return ((log_wt_re, z_re), (log_wt_im, z_im)) lookup tables.

    Matches reference basis.py:648-669: trapezoid over y in
    linspace(-20, 20, 1000) at logspace wt grids.
    """
    wt_re_grid = np.logspace(-RE_LIM, RE_LIM, grid_points)
    wt_im_grid = np.logspace(-IM_LIM, IM_LIM, grid_points)
    y = np.linspace(-Y_LIMIT, Y_LIMIT, QUAD_POINTS)

    z_re_func = _np_func(basis_mod.get_impedance_func("real", basis_type))
    z_im_func = _np_func(basis_mod.get_impedance_func("imag", basis_type))

    # Vectorized over (wt, y) mesh: integrand(y; wt) with t_m = 1
    z_re_grid = np.trapezoid(z_re_func(y[None, :], wt_re_grid[:, None], 1.0, epsilon), x=y, axis=1)
    z_im_grid = np.trapezoid(z_im_func(y[None, :], wt_im_grid[:, None], 1.0, epsilon), x=y, axis=1)

    return (np.log(wt_re_grid), z_re_grid), (np.log(wt_im_grid), z_im_grid)


@lru_cache(maxsize=16)
def generate_response_lookup(basis_type, op_mode, step_model, epsilon,
                             grid_points=RESPONSE_GRID_POINTS, tau_rise=None, zga_key=None):
    """Return (log_td_grid, response_grid) for v((t_n - t_step)/tau_m).

    Matches reference basis.py:672-689.
    """
    td_grid = np.logspace(-6, 2, grid_points)
    y = np.linspace(-Y_LIMIT, Y_LIMIT, QUAD_POINTS)

    response_func = _np_func(basis_mod.get_response_func(basis_type, op_mode, step_model))
    if tau_rise is None:
        tau_rise_val = 0.0
    else:
        tau_rise_val = tau_rise
    response_grid = np.trapezoid(
        response_func(y[None, :], 1.0, td_grid[:, None], epsilon, tau_rise_val), x=y, axis=1)

    return np.log(td_grid), response_grid
