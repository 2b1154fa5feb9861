"""Kramers-Kronig consistency testing.

The KK test is implemented as a deliberately overfitted DRT (weak fixed
regularization, unconstrained sign, extended basis): any KK-consistent
spectrum can be represented, so large residuals indicate KK violations
(reference hybdrt/models/kk.py + drt1d.py:1370-1496).
"""
import numpy as np
from scipy import ndimage
from scipy.stats import chi2

from ..utils import eis as eis_utils


def normalize_residuals(z_meas, z_pred, norm="modulus"):
    z_err = np.asarray(z_meas) - np.asarray(z_pred)
    if norm == "modulus":
        return 100 * z_err / np.abs(z_meas)
    return z_err / norm


def _robust_std(x, sample_fraction=0.6):
    """Std estimated from the central sample_fraction of |x| quantiles."""
    x = np.asarray(x)
    lo = 50 - 100 * sample_fraction / 2
    hi = 50 + 100 * sample_fraction / 2
    q_lo, q_hi = np.percentile(x, [lo, hi])
    # Width of the central interval of a normal distribution
    from scipy.stats import norm as norm_dist
    z_width = norm_dist.ppf(hi / 100) - norm_dist.ppf(lo / 100)
    return (q_hi - q_lo) / z_width


def get_outliers(z_err_norm, n_iter=2, p_thresh=1e-4, n_sigma=None, std_sample_fraction=0.6):
    """Iterative chi-squared outlier detection on the residual modulus
    (reference kk.py:21-53)."""
    z_err_norm = np.asarray(z_err_norm)
    outlier_mask = np.zeros(len(z_err_norm), dtype=bool)
    for _ in range(n_iter):
        std = _robust_std(eis_utils.complex_vector_to_concat(z_err_norm[~outlier_mask]),
                          sample_fraction=std_sample_fraction)
        if n_sigma is None:
            # Squared error modulus follows chi-squared with k=2
            prob = 1 - chi2.cdf(np.abs(z_err_norm) ** 2, 2, scale=std ** 2)
            outlier_mask = prob < p_thresh
        else:
            outlier_mask = np.abs(z_err_norm) > std * n_sigma
    return np.where(outlier_mask)[0]


def get_limits(f_fit, outlier_index, max_num_outliers=2, return_index=False):
    """Frequency limits of the KK-valid window (reference kk.py:56-123)."""
    f_fit = np.asarray(f_fit)
    sort_index = np.argsort(f_fit)[::-1]
    f_sorted = f_fit[sort_index]
    pos = [sort_index.tolist().index(i) for i in np.atleast_1d(outlier_index)]

    is_outlier = np.zeros(len(f_sorted))
    is_outlier[pos] = 1
    badness = ndimage.uniform_filter1d(is_outlier, size=3)
    clean_index = np.where(badness == 0)[0]
    if len(clean_index) == 0:
        return (f_sorted[-1], f_sorted[0]) if not return_index \
            else ((f_sorted[-1], f_sorted[0]), (0, len(f_sorted) - 1))

    i_left, i_right = clean_index[0], clean_index[-1]
    num_bad_inside = np.sum(is_outlier[i_left:i_right])
    if num_bad_inside > max_num_outliers:
        num_to_remove = num_bad_inside - max_num_outliers
        from_left = np.cumsum(is_outlier[i_left:i_right + 1])
        from_right = np.cumsum(is_outlier[i_left:i_right + 1][::-1])
        ll, rr = np.meshgrid(from_left, from_right)
        tot_removed = ll + rr
        idx = np.argwhere(tot_removed >= num_to_remove)
        r, l = idx[np.argmin(np.sum(idx, axis=1))]
        i_left, i_right = i_left + l, i_right - r
    if is_outlier[i_left] == 1:
        i_left = int(np.min(clean_index[clean_index >= i_left]))
    if is_outlier[i_right] == 1:
        i_right = int(np.max(clean_index[clean_index <= i_right]))

    f_max, f_min = f_sorted[i_left], f_sorted[i_right]
    if return_index:
        return (f_min, f_max), (i_left, i_right)
    return f_min, f_max


def trim_data(frequencies, z, f_min, f_max):
    mask = (np.asarray(frequencies) <= f_max) & (np.asarray(frequencies) >= f_min)
    return np.asarray(frequencies)[mask], np.asarray(z)[mask]
