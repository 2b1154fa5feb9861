"""Ridge/trough surfaces across N-D DRT maps (reference hybdrt/mapping/surface.py).

Identifies peak (ridge) and trough trajectories through stacks of DRT rows by
combining curvature/height posteriors with hysteresis thresholds and ridge
repulsion.
"""
import numpy as np
from scipy import signal, ndimage

from . import ndx
from ..filters import std_filter, flexible_hysteresis_threshold


# ------------------------------------------------------------------
# Probability maps
# ------------------------------------------------------------------
def peak_prob(f, fx, fxx, std_size=5, std_baseline=0.1):
    """P(peak) per pixel from negative curvature and positive height
    normalized by local spread (reference surface.py / curvature usage)."""
    from scipy.special import ndtr
    f = np.asarray(f, dtype=float)
    fxx = np.asarray(fxx, dtype=float)
    f_std = std_filter(np.nan_to_num(f), std_size) + std_baseline * np.nanstd(f) + 1e-12
    fxx_std = std_filter(np.nan_to_num(fxx), std_size) \
        + std_baseline * np.nanstd(fxx) + 1e-12
    p_curv = ndtr(-fxx / fxx_std)
    p_height = ndtr(f / f_std)
    return p_curv * p_height


def trough_prob(f, fx, fxx, std_size=5, std_baseline=0.1):
    """P(trough): positive curvature or low height."""
    from scipy.special import ndtr
    f = np.asarray(f, dtype=float)
    fxx = np.asarray(fxx, dtype=float)
    f_std = std_filter(np.nan_to_num(f), std_size) + std_baseline * np.nanstd(f) + 1e-12
    fxx_std = std_filter(np.nan_to_num(fxx), std_size) \
        + std_baseline * np.nanstd(fxx) + 1e-12
    p_curv = ndtr(fxx / fxx_std)
    p_low = ndtr(-f / f_std + 1.0)
    return np.maximum(p_curv * p_low, p_low * 0.5)


# ------------------------------------------------------------------
# Ridge finding (reference surface.py:12-29)
# ------------------------------------------------------------------
def find_ridges_2d(p_ridge, distance=3, height=0.1, prominence=0.1, **kw):
    """Row-wise peak finding on a (psi, tau) probability image."""
    p_ridge = np.asarray(p_ridge, dtype=float)
    ridge_mask = np.zeros_like(p_ridge, dtype=bool)
    for i in range(p_ridge.shape[0]):
        peaks, _ = signal.find_peaks(p_ridge[i], distance=distance, height=height,
                                     prominence=prominence, **kw)
        ridge_mask[i, peaks] = True
    return ridge_mask


def find_ridges(p_ridge, num_group_dims, **kw):
    ridge_mask = ndx.filter_ndx(np.asarray(p_ridge, dtype=float), num_group_dims,
                                mask_nans=False, by_group=True,
                                filter_func=lambda a, **k: find_ridges_2d(a, **k).astype(float),
                                **kw)
    return np.nan_to_num(ridge_mask).astype(bool)


def find_troughs_1d(ridge_mask, f, p_trough):
    """Place a trough between each adjacent ridge pair at the max trough
    probability (reference surface.py:54-130)."""
    ridge_mask = np.asarray(ridge_mask, dtype=bool)
    trough_mask = np.zeros_like(ridge_mask)
    peaks = np.where(ridge_mask)[0]
    for i in range(len(peaks) - 1):
        lo, hi = peaks[i] + 1, peaks[i + 1]
        if hi > lo:
            trough_mask[lo + int(np.argmax(p_trough[lo:hi]))] = True
    return trough_mask


def find_troughs_2d(ridge_mask, f, p_trough):
    return np.stack([find_troughs_1d(ridge_mask[i], f[i], p_trough[i])
                     for i in range(ridge_mask.shape[0])], axis=0)


def ridge_repulsion(ridge_mask, p_trough, distance=2):
    """Suppress trough probability near ridges (reference surface.py:300-330)."""
    structure = np.ones((1,) * (ridge_mask.ndim - 1) + (2 * distance + 1,))
    near_ridge = ndimage.binary_dilation(ridge_mask, structure=structure)
    out = np.array(p_trough, copy=True)
    out[near_ridge] = 0
    return out


def ridge_prob_filter(p_ridge, num_group_dims, sigma=1.0):
    """Smooth ridge probability along the psi axes only."""
    sigma_vec = [sigma] * (p_ridge.ndim - 1) + [0]
    return ndimage.gaussian_filter(np.nan_to_num(p_ridge), sigma=sigma_vec)


def coef_to_ridges(x, drtmd, num_group_dims, normalize=True, ndx_filter=True,
                   filter_kw=None, std_size=5, std_baseline=0.1,
                   ridge_repulse_distance=2, hysteresis_threshold=True,
                   thresh_low=0.2, thresh_high=0.75, find_ridges_kw=None):
    """Full pipeline: coefficient maps -> ridge + trough masks
    (reference surface.py:150-330, simplified: no sato/meijering filters)."""
    x = np.asarray(x, dtype=float)
    if find_ridges_kw is None:
        find_ridges_kw = {}
    if normalize:
        x_sum = np.nansum(np.abs(x), axis=-1)
        x_sum[x_sum == 0] = 1
        x_norm = x / x_sum[..., None]
    else:
        x_norm = x

    from ..ops import basis as basis_mod
    def eval_order(order):
        em = np.asarray(basis_mod.construct_func_eval_matrix(
            np.log(drtmd.tau_supergrid), np.log(drtmd.tau_supergrid),
            drtmd.tau_basis_type, drtmd.tau_epsilon, order))
        return x_norm @ em.T

    f = eval_order(0)
    fx = eval_order(1)
    fxx = eval_order(2)

    cp = peak_prob(f, fx, fxx, std_size=std_size, std_baseline=std_baseline)
    tp = trough_prob(f, fx, fxx, std_size=std_size, std_baseline=std_baseline)
    p_ridge = cp * (1 - tp)
    p_trough = tp * (1 - cp)

    if ndx_filter:
        if filter_kw is None:
            filter_kw = dict(iterative=True, iter=2, nstd=5, impute=False,
                             by_group=False, sigma=(1,) * (x.ndim - 1) + (0,))
        p_ridge = np.nan_to_num(ndx.filter_ndx(p_ridge, num_group_dims, **filter_kw))
        p_trough = np.nan_to_num(ndx.filter_ndx(p_trough, num_group_dims, **filter_kw))

    if hysteresis_threshold:
        mask = flexible_hysteresis_threshold(p_ridge, thresh_low, thresh_high)
        p_ridge = np.where(mask, p_ridge, 0)

    ridge_mask = find_ridges_2d(p_ridge.reshape(-1, p_ridge.shape[-1]),
                                **find_ridges_kw).reshape(p_ridge.shape)
    if ridge_repulse_distance > 0:
        p_trough = ridge_repulsion(ridge_mask, p_trough, ridge_repulse_distance)
    trough_mask = find_troughs_2d(ridge_mask.reshape(-1, ridge_mask.shape[-1]),
                                  f.reshape(-1, f.shape[-1]),
                                  p_trough.reshape(-1, p_trough.shape[-1]))
    trough_mask = trough_mask.reshape(ridge_mask.shape)
    return ridge_mask, trough_mask, p_ridge, p_trough
