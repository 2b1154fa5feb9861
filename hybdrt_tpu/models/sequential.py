"""Sequential fitting of chrono/hybrid time-series segments, subtracting each
fit's projected response from subsequent segments (reference
hybdrt/models/sequential.py)."""
import numpy as np

from .drt import DRT


def fit_sequence(data_sequence, drt: DRT = None, fit_type="hybrid", drt_kw=None,
                 **fit_kw):
    """Fit a sequence of datasets, carrying forward each segment's relaxation.

    :param data_sequence: list of (chrono_tuple, eis_tuple) pairs, where
        chrono_tuple = (times, i, v) and eis_tuple = (freq, z) or None.
    :returns: list of fitted DRT instances (one per segment).
    """
    if drt is None:
        drt = DRT(**(drt_kw or {}))
    fits = []
    prior_fits = []

    for chrono_data, eis_data in data_sequence:
        seg = drt.copy()
        times, i_signal, v_signal = chrono_data

        # Subtract the projected relaxation of all previous segments
        v_corrected = np.array(v_signal, dtype=float)
        for prev in prior_fits:
            v_corrected = v_corrected - prev.predict_response(
                times, step_times=prev.step_times, step_sizes=prev.step_sizes,
                v_baseline=np.zeros(1))
        if eis_data is None:
            seg.fit_chrono(times, i_signal, v_corrected, **fit_kw)
        else:
            seg.fit_hybrid(times, i_signal, v_corrected, *eis_data, **fit_kw)
        fits.append(seg)
        prior_fits.append(seg)
    return fits
