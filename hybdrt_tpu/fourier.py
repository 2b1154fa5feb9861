"""Reference-only FFT impedance extraction from chrono data
(reference hybdrt/fourier.py)."""
import numpy as np
from scipy import fft
from scipy.ndimage import gaussian_filter

from .utils.array import is_uniform


def fft_impedance(times, i_signal, v_signal, order=1, exclude_zero=True, window=None,
                  window_kwargs=None, smooth=False, smooth_sigma=1):
    """Impedance estimate Z(f) = FFT(dv)/FFT(di) for uniformly sampled chrono data."""
    if not is_uniform(times):
        raise ValueError("times must be uniformly spaced for Fourier extraction")
    t_sample = np.mean(np.diff(times))

    if smooth:
        i_signal = gaussian_filter(i_signal, sigma=smooth_sigma)
        v_signal = gaussian_filter(v_signal, sigma=smooth_sigma)

    di_dt = np.diff(i_signal, n=order)
    dv_dt = np.diff(v_signal, n=order)

    if window is not None:
        try:
            win = getattr(np, window)(len(di_dt), **(window_kwargs or {}))
        except AttributeError:
            raise ValueError(f"Invalid window {window}; must be a numpy window function")
        di_dt = di_dt * win
        dv_dt = dv_dt * win

    i_fft = fft.rfft(di_dt)
    v_fft = fft.rfft(dv_dt)
    z_fft = v_fft / i_fft
    frequencies = fft.rfftfreq(len(di_dt), d=t_sample)

    if exclude_zero:
        frequencies = frequencies[1:]
        z_fft = z_fft[1:]
    return frequencies, z_fft
