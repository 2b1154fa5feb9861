"""Chronopotentiometry time-axis helpers (reference: hybdrt/utils/chrono.py).

The forward transform maps each post-step interval onto a log scale so that
the flexible chrono error structure (and chrono plots) see uniform effective
spacing; implemented vectorized over segments rather than a python loop over
index masks.
"""
import numpy as np
from .validation import check_ctrl_mode


def get_time_transforms(times, step_times):
    """Return (rev_transform, fwd_transform) mapping measurement time to a
    piecewise log-time coordinate (reference: utils/chrono.py:5-68)."""
    times = np.asarray(times)
    start_times = np.asarray(step_times, dtype=float)

    t_sample = np.min(np.diff(times))
    trans_base = np.log(t_sample / 4)
    seg_offsets = np.log(start_times[1:] - start_times[:-1]) - trans_base
    trans_offsets = np.concatenate([[0.0], np.cumsum(seg_offsets)])

    def fwd_transform(t):
        t = np.atleast_1d(np.asarray(t, dtype=float))
        # Segment index for each time (-1 = pre-step)
        seg = np.searchsorted(start_times, t, side="right") - 1
        tt = np.empty_like(t)
        pre = seg < 0
        tt[pre] = t[pre] - start_times[0]
        post = ~pre
        td = np.maximum(t[post] - start_times[seg[post]], t_sample / 2)
        tt[post] = trans_offsets[seg[post]] + np.log(td) - trans_base
        return tt

    def rev_transform(tt):
        tt = np.atleast_1d(np.asarray(tt, dtype=float))
        seg = np.searchsorted(trans_offsets, tt, side="right") - 1
        t = np.empty_like(tt)
        pre = seg < 0
        t[pre] = tt[pre] + start_times[0]
        post = ~pre
        t[post] = np.exp(tt[post] - trans_offsets[seg[post]] + trans_base) + start_times[seg[post]]
        return t

    return rev_transform, fwd_transform


def get_input_and_response(i_signal, v_signal, ctrl_mode):
    """Map (i, v) to (input, response) depending on control mode."""
    if ctrl_mode is None:
        return None, None
    check_ctrl_mode(ctrl_mode)
    if ctrl_mode == "galv":
        return i_signal, v_signal
    return v_signal, i_signal


def signals_to_tuple(times, input_signal, response_signal, ctrl_mode):
    if ctrl_mode is None:
        return None
    check_ctrl_mode(ctrl_mode)
    if ctrl_mode == "galv":
        return times, input_signal, response_signal
    return times, response_signal, input_signal
