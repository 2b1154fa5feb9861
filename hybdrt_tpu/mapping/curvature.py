"""Row-wise peak probability from curvature and height posteriors
(reference hybdrt/mapping/curvature.py)."""
import numpy as np
from scipy import signal
from scipy.special import ndtr


def peak_prob_1d(arrays_1d, nonneg, sign, height, prominence):
    """Per-tau peak probability for one observation row.

    arrays_1d = (f, fxx, f_sigma, fxx_sigma)."""
    f, fxx, f_sigma, fxx_sigma = arrays_1d
    if nonneg and sign != 0:
        peak_indices, peak_info = signal.find_peaks(-sign * fxx, height=height,
                                                    prominence=prominence)
    else:
        idx_list, info_list = [], []
        for peak_sign in (-1, 1):
            p_idx, p_info = signal.find_peaks(-peak_sign * fxx, height=height,
                                              prominence=prominence)
            pos = peak_sign * f[p_idx] > 0
            idx_list.append(p_idx[pos])
            info_list.append({k: v[pos] for k, v in p_info.items()})
        peak_indices = np.concatenate(idx_list)
        peak_info = {k: np.concatenate([pi[k] for pi in info_list])
                     for k in info_list[0].keys()}
        order = np.argsort(peak_indices)
        peak_indices = peak_indices[order]
        peak_info = {k: v[order] for k, v in peak_info.items()}

    out = np.zeros(len(f))
    if len(peak_indices) == 0:
        return out
    min_prom = np.minimum(peak_info["prominences"], peak_info["peak_heights"])
    curv_prob = ndtr(min_prom / (fxx_sigma[peak_indices] + 1e-15))
    f_prob = ndtr(np.abs(f[peak_indices]) / (f_sigma[peak_indices] + 1e-15))
    out[peak_indices] = np.minimum(curv_prob, f_prob)
    return out


def peak_prob(f_nd, fxx_nd, f_sigma_nd, fxx_sigma_nd, nonneg=True, sign=1,
              height=1e-3, prominence=5e-3):
    """Apply peak_prob_1d over the last axis of N-D DRT maps."""
    shape = f_nd.shape[:-1]
    out = np.zeros_like(np.asarray(f_nd, dtype=float))
    for idx in np.ndindex(*shape):
        out[idx] = peak_prob_1d((f_nd[idx], fxx_nd[idx], f_sigma_nd[idx],
                                 fxx_sigma_nd[idx]), nonneg, sign, height, prominence)
    return out
