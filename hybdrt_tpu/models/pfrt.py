"""PFRT (probability function of relaxation times) post-processing.

Operations on the per-factor peak-probability arrays produced by the PFRT
regularization sweep (reference hybdrt/models/pfrt.py).
"""
import numpy as np

from ..utils.array import find_contiguous_ranges


def get_peak_ranges(pf, min_prob):
    index = np.where(np.asarray(pf) >= min_prob)[0]
    return find_contiguous_ranges(index)


def identify_peaks(pf, min_prob):
    """Indices of peaks: max of pf within each contiguous above-threshold range."""
    pf = np.asarray(pf)
    starts, ends = get_peak_ranges(pf, min_prob)
    return np.array([s + int(np.argmax(pf[s:e])) for s, e in zip(starts, ends)], dtype=int)


def identify_candidate_peaks(candidate_pf, threshold, shift=False, **shift_kw):
    """Peak indices of a candidate PFRT, optionally shifted onto the total
    PFRT's peak locations first (reference pfrt.py:66-84)."""
    if shift:
        candidate_pf = shift_candidate_pfrt(candidate_pf, **shift_kw)
    return identify_peaks(candidate_pf, threshold)


def integrate_peaks(pf, min_prob):
    """(peak_index, peak_areas) of contiguous above-threshold ranges."""
    pf = np.asarray(pf)
    starts, ends = get_peak_ranges(pf, min_prob)
    peak_index = identify_peaks(pf, min_prob)
    areas = np.array([np.trapezoid(pf[max(s - 1, 0):e + 1]) for s, e in zip(starts, ends)])
    return peak_index, areas


def rank_peaks(pf, min_prob, integrate=True):
    if integrate:
        peak_index, magnitudes = integrate_peaks(pf, min_prob)
    else:
        peak_index = identify_peaks(pf, min_prob)
        magnitudes = np.asarray(pf)[peak_index]
    order = np.argsort(magnitudes)[::-1]
    return peak_index[order], magnitudes[order]


def shift_candidate_pfrt(candidate_pf, tot_pf=None, tot_thresh=None, tot_peak_ranges=None,
                         tot_peak_indices=None):
    """Move candidate peak probabilities onto the matching total-PFRT peak
    locations (reference pfrt.py:87-133)."""
    candidate_pf = np.asarray(candidate_pf)
    if tot_pf is None:
        if tot_peak_ranges is None or tot_peak_indices is None:
            raise ValueError("Provide tot_pf, or tot_peak_ranges and tot_peak_indices")
    else:
        if tot_thresh is None:
            raise ValueError("If tot_pf is provided, tot_thresh must also be provided")
        tot_peak_ranges = get_peak_ranges(tot_pf, tot_thresh)
        tot_peak_indices = identify_peaks(tot_pf, tot_thresh)

    thresh_index = np.where(candidate_pf > 0)[0]
    starts, ends = tot_peak_ranges
    shift_pf = np.zeros(len(candidate_pf))
    for ti in thresh_index:
        # ranges are half-open [start, end): end itself is outside
        match = np.where((starts <= ti) & (ends > ti))[0]
        target = tot_peak_indices[match[0]] if len(match) == 1 else ti
        shift_pf[target] = max(shift_pf[target], candidate_pf[ti])
    return shift_pf


def candidate_corr(target_peak_indices, candidate_pf):
    target_pf = np.zeros_like(candidate_pf)
    target_pf[np.asarray(target_peak_indices, dtype=int)] = 1
    with np.errstate(invalid="ignore"):
        c = np.corrcoef(target_pf, candidate_pf)[0, 1]
    return 0.0 if np.isnan(c) else c


def get_matching_candidate(target_peak_indices, candidate_pfs, candidate_llh):
    quality = [candidate_corr(target_peak_indices, pf) * llh
               for pf, llh in zip(candidate_pfs, candidate_llh)]
    return int(np.argmax(quality))


def select_candidates(tot_pf, candidate_pfs, candidate_llh, start_thresh=0.99,
                      end_thresh=0.01, peak_thresh=1e-6):
    """Incrementally grow the target peak model from the most to least probable
    PFRT peaks, selecting the best-matching candidate at each size
    (reference pfrt.py:164-213)."""
    tot_peak_ranges = get_peak_ranges(tot_pf, peak_thresh)
    tot_peak_indices = identify_peaks(tot_pf, peak_thresh)
    shift_pfs = [shift_candidate_pfrt(pf, tot_peak_ranges=tot_peak_ranges,
                                      tot_peak_indices=tot_peak_indices)
                 for pf in candidate_pfs]
    ranked_idx, magnitudes = rank_peaks(tot_pf, peak_thresh)
    if len(magnitudes) == 0:
        return [], []
    magnitudes = magnitudes / np.max(magnitudes)

    include = np.where(magnitudes >= start_thresh)[0]
    include_index = include[-1] if len(include) > 0 else 0

    target_peak_indices, candidate_indices = [], []
    while include_index < len(magnitudes):
        targets = ranked_idx[:include_index + 1]
        cand = get_matching_candidate(targets, shift_pfs, candidate_llh)
        target_peak_indices.append(targets)
        candidate_indices.append(cand)
        include_index += 1
        if include_index >= len(magnitudes) or magnitudes[include_index] < end_thresh:
            break
    return target_peak_indices, candidate_indices
