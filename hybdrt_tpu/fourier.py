"""Fourier-domain impedance extraction from chronopotentiometry data.

Comparison-only utility (the DRT transform is the primary analysis path):
for a uniformly sampled record, the impedance spectrum is the ratio of the
discrete Fourier transforms of the differenced excitation and response,
Z(f) = F[Δ^n v] / F[Δ^n i]. Differencing n times whitens drift of polynomial
order < n before the transform. Functional analog of reference
hybdrt/fourier.py:9-54.
"""
import numpy as np

from .utils.array import is_uniform


def _difference_and_window(signal, order, window, window_kwargs):
    """n-th discrete difference of a signal, tapered by an optional window.

    ``window`` may be a numpy window-function name ('hanning', 'blackman',
    ...), a callable ``f(n) -> array``, or an explicit taper array of the
    differenced length.
    """
    d = np.diff(np.asarray(signal, dtype=float), n=order)
    if window is None:
        return d
    if isinstance(window, str):
        maker = getattr(np, window, None)
        if maker is None:
            raise ValueError(
                f"Invalid window {window}; must be a numpy window function")
        taper = maker(d.size, **(window_kwargs or {}))
    elif callable(window):
        taper = window(d.size)
    else:
        taper = np.asarray(window, dtype=float)
        if taper.shape != d.shape:
            raise ValueError(
                f"Window array length {taper.size} != signal length {d.size}")
    return d * taper


def fft_impedance(times, i_signal, v_signal, order=1, exclude_zero=True,
                  window=None, window_kwargs=None, smooth=False,
                  smooth_sigma=1):
    """Estimate Z(f) from a uniformly sampled chrono record.

    Returns ``(frequencies, z)`` where ``z = rfft(Δ^order v) / rfft(Δ^order i)``.
    The zero-frequency bin is dropped by default (its ratio is dominated by
    residual baseline offsets). Optional pre-smoothing applies a gaussian filter of
    width ``smooth_sigma`` samples to both signals.
    """
    times = np.asarray(times, dtype=float)
    if not is_uniform(times):
        raise ValueError("times must be uniformly spaced for Fourier extraction")

    if smooth:
        from scipy.ndimage import gaussian_filter1d
        i_signal = gaussian_filter1d(np.asarray(i_signal, float), smooth_sigma)
        v_signal = gaussian_filter1d(np.asarray(v_signal, float), smooth_sigma)

    di = _difference_and_window(i_signal, order, window, window_kwargs)
    dv = _difference_and_window(v_signal, order, window, window_kwargs)

    z = np.fft.rfft(dv) / np.fft.rfft(di)
    freq = np.fft.rfftfreq(di.size, d=float(np.mean(np.diff(times))))

    start = 1 if exclude_zero else 0
    return freq[start:], z[start:]
