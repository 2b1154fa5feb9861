"""Peak identification and decomposition on DRT distributions.

Host-side postprocessing of small 1-D arrays (reference hybdrt/peaks.py);
operates on distributions evaluated by the jitted model, so plain numpy/scipy
is appropriate here.
"""
import numpy as np
from scipy import signal

from .utils.array import nearest_index


# ------------------------------------------------------------------
# Peak finding (reference peaks.py:10-89)
# ------------------------------------------------------------------
def find_slope_peak_pairs(fx, **kw):
    """Pair positive/negative peaks in the first derivative."""
    pos_peaks, _ = signal.find_peaks(fx, **kw)
    neg_peaks, _ = signal.find_peaks(-fx, **kw)

    if len(pos_peaks) == 0 and len(neg_peaks) == 0:
        pass
    elif len(pos_peaks) == 0:
        # A negative slope peak implies an uncaptured positive peak before it
        pos_peaks = np.array([0])
    elif len(neg_peaks) == 0:
        neg_peaks = np.array([len(fx) - 1])
    else:
        if neg_peaks[0] < pos_peaks[0]:
            pos_peaks = np.insert(pos_peaks, 0, 0)
        if pos_peaks[-1] > neg_peaks[-1]:
            neg_peaks = np.append(neg_peaks, len(fx) - 1)
    return pos_peaks, neg_peaks


def find_peaks_simple(data, order, **kw):
    """Find peaks from the function (order 0), its 1st derivative pair
    structure (order 1), or curvature minima (order 2)."""
    if order == 0:
        peaks, _ = signal.find_peaks(data, **kw)
    elif order == 1:
        fx, fxx = data
        delta_fx_thresh = kw.pop("delta_fx", 0)
        pos_peaks, neg_peaks = find_slope_peak_pairs(fx, **kw)
        if len(pos_peaks) == 0:
            peaks = np.array([], dtype=int)
        else:
            delta_fx = fx[pos_peaks] - fx[neg_peaks]
            keep = delta_fx > delta_fx_thresh
            pos_peaks, neg_peaks = pos_peaks[keep], neg_peaks[keep]
            peaks = np.array([pos + np.argmin(fxx[pos:neg + 1])
                              for pos, neg in zip(pos_peaks, neg_peaks)], dtype=int)
    elif order == 2:
        kw.setdefault("height", 0)
        peaks, _ = signal.find_peaks(-data, **kw)
    else:
        raise ValueError(f"order must be in [0, 1, 2]; got {order}")
    return peaks


def find_peaks_compound(fx, fxx, order1_kw=None, order2_kw=None):
    """Peaks confirmed by both slope-pair and curvature criteria
    (reference peaks.py:74-89)."""
    if order1_kw is None:
        order1_kw = {"prominence": 1e-3 + np.percentile(np.abs(fx[~np.isinf(fx)]), 100) * 0.01,
                     "delta_fx": 1e-3 + np.percentile(np.abs(fxx[~np.isinf(fxx)]), 90) * 0.05}
    if order2_kw is None:
        order2_kw = {"prominence": 5e-3 + np.percentile(np.abs(fxx[~np.isinf(fxx)]), 100) * 0.01,
                     "height": 0}
    peaks1 = find_peaks_simple((fx, fxx), order=1, **order1_kw)
    peaks2 = find_peaks_simple(fxx, order=2, **order2_kw)
    return np.intersect1d(peaks1, peaks2)


def find_troughs(f, fxx, peak_indices, peak_tau=None, tau=None):
    """Locate troughs between adjacent peaks (reference peaks.py:92-136)."""
    if peak_indices is None:
        if peak_tau is None or tau is None:
            raise ValueError("Provide peak_indices, or peak_tau with its tau grid")
        peak_indices = [nearest_index(np.log(tau), np.log(pt)) for pt in peak_tau]
    peak_indices = sorted(peak_indices)
    f_mix = -(f - fxx)
    trough_indices = []
    for i, start in enumerate(peak_indices[:-1]):
        end = peak_indices[i + 1]
        left_sign = np.sign(f[start])
        right_sign = np.sign(f[end])
        if left_sign == right_sign:
            sign = left_sign
            if np.min(sign * f[start:end]) < min(sign * f[start], sign * f[end]):
                trough = start + int(np.argmin(sign * f[start:end]))
            else:
                trough = start + int(np.argmax(sign * f_mix[start:end]))
                if trough in (start, end):
                    trough = int((start + end + 2 * trough) / 4)
        else:
            trough = start + nearest_index(f[start:end], 0)
        trough_indices.append(trough)
    return trough_indices


# ------------------------------------------------------------------
# Peak weight decomposition (reference peaks.py:139-233)
# ------------------------------------------------------------------
def estimate_peak_weight_distributions(tau, f, fxx, peak_indices, basis_tau,
                                       epsilon_factor=1.25, max_epsilon=1.25,
                                       min_epsilon=None, epsilon_uniform=None,
                                       trough_indices=None, peak_tau=None, trough_tau=None):
    """RBF-windowed split of coefficient weight among peaks; rows sum to 1
    over the basis grid."""
    if peak_tau is None:
        peak_tau = tau[peak_indices]
    basis_tau = np.asarray(basis_tau)
    if len(peak_tau) == 0:
        # No peaks -> no weight rows (reference returns an empty set, not a
        # phantom all-ones peak)
        return np.zeros((0, len(basis_tau)))
    if len(peak_tau) == 1:
        return np.ones((1, len(basis_tau)))

    peak_tau = np.sort(np.asarray(peak_tau))
    rbf = lambda y, eps: np.exp(-(eps * np.asarray(y)) ** 2)

    if trough_tau is None:
        if trough_indices is None:
            trough_indices = find_troughs(f, fxx, peak_indices=None, peak_tau=peak_tau, tau=tau)
        trough_tau = tau[trough_indices]

    peak_weights = np.empty((len(peak_tau), len(basis_tau)))
    for i, tau_i in enumerate(peak_tau):
        if epsilon_uniform is None:
            prev_trough = tau[0] if i == 0 else trough_tau[i - 1]
            next_trough = tau[-1] if i == len(peak_tau) - 1 else trough_tau[i]
            l_eps = min(epsilon_factor / np.log(tau_i / prev_trough), max_epsilon)
            r_eps = min(epsilon_factor / np.log(next_trough / tau_i), max_epsilon)
            if min_epsilon is not None:
                l_eps = max(l_eps, min_epsilon)
                r_eps = max(r_eps, min_epsilon)
        else:
            l_eps = r_eps = epsilon_uniform
        left = basis_tau < tau_i
        peak_weights[i, left] = rbf(np.log(basis_tau[left] / tau_i), l_eps)
        peak_weights[i, ~left] = rbf(np.log(basis_tau[~left] / tau_i), r_eps)
    peak_weights /= np.sum(peak_weights, axis=0)
    return peak_weights


def squeeze_peak_coef(x_peak, basis_tau, squeeze_factor):
    """Narrow a peak's coefficient profile around its max, preserving area."""
    max_index = int(np.argmax(x_peak))
    tau_max = basis_tau[max_index]
    ln_tau = np.log(basis_tau)
    ln_tau_sqz = np.log(tau_max) + (ln_tau - np.log(tau_max)) / squeeze_factor
    return squeeze_factor * np.interp(ln_tau, ln_tau_sqz, x_peak)


# ------------------------------------------------------------------
# Initial discrete-element parameter estimation (reference peaks.py:236-348)
# ------------------------------------------------------------------
def _dispersion_params(element_type, f_seg, tau_seg, peak_value, r_k, peak_ln_tau,
                       left_area, right_area, from_f_peaks):
    if element_type in ("HN", "RQ"):
        beta_k = (2 / np.pi) * np.arctan2(2 * np.pi * abs(peak_value), abs(r_k))
        if element_type == "HN":
            if right_area >= left_area:
                alpha_k = 0.99
            else:
                expo = ((1 - beta_k) ** 0.1 / (2 * beta_k)) if from_f_peaks \
                    else ((1 - beta_k) / (2 * beta_k))
                alpha_k = (right_area / left_area) ** expo
            return [r_k, peak_ln_tau, alpha_k, beta_k]
        return [r_k, peak_ln_tau, beta_k]
    elif element_type == "RC":
        return [r_k, peak_ln_tau]
    raise ValueError(f"Invalid element_type {element_type}")


def estimate_peak_params(tau, element_types, f=None, peak_indices=None,
                         trough_indices=None, f_peaks=None):
    """Per-peak (R, ln tau, [alpha], [beta]) estimates from peak shape; exact
    oracle initialization for DiscreteElementModel refinement."""
    if f is not None and f_peaks is not None:
        raise ValueError("Only one of f or f_peaks should be provided")
    if f is not None and peak_indices is None:
        raise ValueError("If f is provided, peak_indices must also be provided")
    if f is None and f_peaks is None:
        raise ValueError("Either (f AND peak_indices) OR f_peaks must be provided")
    num_peaks = len(peak_indices) if f is not None else len(f_peaks)

    if isinstance(element_types, (list, tuple)):
        if len(element_types) != num_peaks:
            raise ValueError("element_types length must match number of peaks")
    else:
        element_types = [element_types] * num_peaks

    peak_params = []
    ln_tau = np.log(tau)
    if f is not None:
        if trough_indices is None:
            trough_indices = [int(np.mean([peak_indices[i - 1], peak_indices[i]]))
                              for i in range(1, len(peak_indices))]
        starts = [0] + list(trough_indices)
        ends = np.array(list(trough_indices) + [len(tau)]) + 1
        for i, pk in enumerate(peak_indices):
            s, e = starts[i], ends[i]
            r_k = np.trapezoid(f[s:e], x=ln_tau[s:e])
            left = abs(np.trapezoid(f[s:pk], x=ln_tau[s:pk]))
            right = abs(np.trapezoid(f[pk:e], x=ln_tau[pk:e]))
            peak_params.append(_dispersion_params(element_types[i], f[s:e], tau[s:e],
                                                  f[pk], r_k, ln_tau[pk], left, right, False))
    else:
        for i, f_peak in enumerate(f_peaks):
            pk = int(np.argmax(np.abs(f_peak)))
            r_k = np.trapezoid(f_peak, x=ln_tau)
            left = abs(np.trapezoid(f_peak[:pk], x=ln_tau[:pk]))
            right = abs(np.trapezoid(f_peak[pk:], x=ln_tau[pk:]))
            peak_params.append(_dispersion_params(element_types[i], f_peak, tau,
                                                  f_peak[pk], r_k, ln_tau[pk], left, right, True))
    return peak_params


# ------------------------------------------------------------------
# Peak matching / similarity (reference peaks.py:351-441)
# ------------------------------------------------------------------
def min_peak_distances(new_peak_locations, base_peak_locations):
    if len(base_peak_locations) == 0:
        return np.full(len(new_peak_locations), np.inf)
    base = np.asarray(base_peak_locations)
    return np.array([np.min(np.abs(p - base)) for p in new_peak_locations])


def index_closest_peaks(new_peak_locations, base_peak_locations):
    base = np.asarray(base_peak_locations)
    return np.array([int(np.argmin(np.abs(p - base))) for p in new_peak_locations])


def peak_similarity_index(new_peak_locations, base_peak_locations, epsilon=1):
    d = min_peak_distances(new_peak_locations, base_peak_locations)
    return np.exp(-(epsilon * d) ** 2)


def find_new_peaks(new_peak_locations, base_peak_locations, distance_threshold=None):
    min_dist = min_peak_distances(new_peak_locations, base_peak_locations)
    num_new = len(new_peak_locations) - len(base_peak_locations)
    if num_new <= 0:
        if distance_threshold is None:
            distance_threshold = 0.5
        return np.where(min_dist > distance_threshold)
    if distance_threshold is None:
        return np.argsort(min_dist)[::-1][:num_new]
    return np.where(min_dist > distance_threshold)


def has_similar_peak(peak_location, compare_peak_locations, threshold=0.5, epsilon=1):
    return peak_similarity_index([peak_location], compare_peak_locations, epsilon)[0] >= threshold


def find_peak_inrange(tau, f, peak_range):
    t0, t1 = peak_range
    g = np.array(f, copy=True)
    g[(tau < t0) | (tau > t1)] = 0
    return int(np.argmax(g))


def find_peaks_byrange(tau, f, ranges):
    return np.array([find_peak_inrange(tau, f, r) for r in ranges])


def find_troughs_from_prob(tau, tp, peak_indices):
    """Trough positions from a trough-probability function: use the single
    confident trough if unique, otherwise the log-midpoint."""
    peak_tau = tau[peak_indices]
    ranges = [(peak_tau[i], peak_tau[i + 1]) for i in range(len(peak_tau) - 1)]
    trough_idx = []
    for r in ranges:
        tpr = np.array(tp, copy=True)
        tpr[tau < r[0]] = tpr[nearest_index(tau, r[0], constraint=-1)]
        tpr[tau >= r[1]] = tpr[nearest_index(tau, r[1], constraint=1)]
        pk, _ = signal.find_peaks(tpr, height=0.8, prominence=0.5)
        if len(pk) == 1:
            trough_idx.append(int(pk[0]))
        else:
            center = np.exp(np.mean(np.log(np.asarray(r))))
            trough_idx.append(nearest_index(tau, center))
    return trough_idx
