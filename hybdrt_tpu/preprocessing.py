"""Host-side data preprocessing: step detection, signal models, scaling
estimates, and basis-grid construction.

This is data preparation, not device compute; it runs once per fit in numpy
(reference: hybdrt/preprocessing.py). Downsampling of long chrono series is in
this module as well (log-uniform sampling around steps).
"""
import numpy as np

from .utils.array import unit_step, nearest_index
from .utils.validation import check_step_model


# ------------------------------------------------------------------
# Step detection (reference preprocessing.py:17-181)
# ------------------------------------------------------------------
def identify_steps(y, allow_consecutive=True, rthresh=50, athresh=1e-10):
    """Indices where the input signal steps."""
    y = np.asarray(y)
    dy = np.diff(y)
    step_idx = np.where((np.abs(dy) >= np.median(np.abs(dy)) * rthresh)
                        & (np.abs(dy) >= athresh))[0] + 1
    if not allow_consecutive:
        idx_diff = np.concatenate(([2], np.diff(step_idx)))
        step_idx = step_idx[idx_diff > 1]
    return step_idx


def split_steps(x, step_index):
    step_index = np.asarray(step_index)
    if step_index[0] > 0:
        step_index = np.insert(step_index, 0, 0)
    if step_index[-1] < len(x):
        step_index = np.append(step_index, len(x))
    return [x[start:end] for start, end in zip(step_index[:-1], step_index[1:])]


def get_step_indices_from_step_times(times, step_times):
    times = np.asarray(times)
    out = []
    for st in step_times:
        delta = np.where(times >= st, times - st, np.inf)
        out.append(int(np.argmin(delta)))
    return np.array(out)


def get_step_sizes(times, y, step_times, step_index=None):
    if step_index is None:
        step_index = get_step_indices_from_step_times(times, step_times)
    n_steps = len(step_times)
    step_sizes = np.zeros(n_steps)
    for n in range(n_steps):
        end = len(y) if n == n_steps - 1 else step_index[n + 1]
        prev_start = 0 if n == 0 else step_index[n - 1]
        step_sizes[n] = np.mean(y[step_index[n]:end]) - np.mean(y[prev_start:step_index[n]])
    return step_sizes


def get_step_info(times, y, allow_consecutive=True, offset_step_times=False, offset_size=None,
                  rthresh=50, athresh=1e-10):
    step_idx = identify_steps(y, allow_consecutive, rthresh, athresh)
    step_times = np.asarray(times)[step_idx].copy()
    if offset_step_times:
        if offset_size is None:
            t_sample = np.min(np.diff(times))
            # Actual step assumed one sample before observed; 1e-8 fudge keeps
            # step_time strictly after the previous sample (reference :71-80)
            offset_size = -t_sample * (1 - 1e-8)
        step_times = step_times + offset_size
    step_sizes = get_step_sizes(times, y, step_times, step_index=step_idx)
    return step_times, step_sizes


def process_input_signal(times, input_signal, step_model, offset_steps, offset_size=None,
                         rthresh=50, fixed_tau_rise=None):
    check_step_model(step_model)
    allow_consecutive = step_model == "ideal"
    step_times, step_sizes = get_step_info(times, input_signal, allow_consecutive,
                                           offset_steps, offset_size, rthresh)
    if step_model != "ideal":
        num_steps = len(step_times)
        fit = fit_signal_steps(times, input_signal, fixed_tau_rise=fixed_tau_rise)
        step_times = step_times + fit["x"][1:num_steps + 1] * 1e-6
        tau_rise = np.exp(fit["x"][num_steps + 1:])
    else:
        tau_rise = None
    return step_times, step_sizes, tau_rise


def generate_model_signal(times, step_times, step_sizes, tau_rise, step_model):
    """Idealized input signal from identified steps (reference :181-208)."""
    times = np.asarray(times)
    signal = np.zeros(len(times))
    if step_model == "ideal":
        for st, sa in zip(step_times, step_sizes):
            signal += sa * unit_step(times, st)
    else:
        for st, sa, tr in zip(step_times, step_sizes, tau_rise):
            mask = times >= st
            signal[mask] += sa * (1 - np.exp(-(times[mask] - st) / tr))
    return signal


def evaluate_step_fit(times, step_times, step_sizes, x):
    """Decaying-exponential step model (reference preprocessing.py:1020-1043)."""
    num_steps = len(step_times)
    signal_offset = x[0]
    t_step = step_times + x[1:num_steps + 1] * 1e-6
    tau_rise = np.exp(x[num_steps + 1:])
    y_hat = np.zeros(len(times)) + signal_offset
    for n in range(num_steps):
        mask = times >= t_step[n]
        y_hat[mask] += step_sizes[n] * (1 - np.exp(-(times[mask] - t_step[n]) / tau_rise[n]))
    return y_hat


def fit_signal_steps(times, signal, tau_var_penalty=0.1, t_step_offset_penalty=1e-5,
                     fixed_tau_rise=None):
    """Least-squares fit of non-ideal (exp-decay) steps (reference :1045-1147)."""
    from scipy.optimize import least_squares
    step_times, step_sizes = get_step_info(times, signal, allow_consecutive=False)
    num_steps = len(step_times)

    fixed_tail = None if fixed_tau_rise is None \
        else np.full(num_steps, np.log(fixed_tau_rise))

    def resid(x):
        if fixed_tail is not None:
            # Only the offset block is optimized; tau entries are pinned
            x = np.concatenate([x, fixed_tail])
        r = evaluate_step_fit(times, step_times, step_sizes, x) - signal
        penalties = np.concatenate([
            t_step_offset_penalty * x[1:num_steps + 1],
            tau_var_penalty * (x[num_steps + 1:] - np.mean(x[num_steps + 1:])),
        ])
        return np.concatenate([r, penalties])

    x0 = np.zeros(1 + 2 * num_steps)
    x0[num_steps + 1:] = np.log(np.min(np.diff(times)))
    if fixed_tail is not None:
        result = least_squares(resid, x0[:num_steps + 1])
        x_out = np.concatenate([result.x, fixed_tail])
    else:
        result = least_squares(resid, x0)
        x_out = result.x
    return {"x": x_out, "step_times": step_times, "step_sizes": step_sizes}


# ------------------------------------------------------------------
# Rp estimation (reference preprocessing.py:764-840)
# ------------------------------------------------------------------
def estimate_rp(times, step_times, input_step_sizes, response_signal, step_model, z):
    """Estimate the polarization resistance from chrono and/or EIS data."""
    if times is not None:
        times = np.asarray(times)
        step_times = np.asarray(step_times, dtype=float)
        input_step_sizes = np.asarray(input_step_sizes, dtype=float)
        if step_model == "ideal":
            # Condense consecutive steps into single steps
            new_step_index = np.concatenate(([0], np.where(np.diff(step_times) > 2e-5)[0] + 1))
            if len(new_step_index) < len(step_times):
                step_times_new = step_times[new_step_index]
                step_sizes_new = np.zeros_like(step_times_new)
                for i, start_index in enumerate(new_step_index):
                    end_index = len(input_step_sizes) if i == len(new_step_index) - 1 \
                        else new_step_index[i + 1]
                    step_sizes_new[i] = np.sum(input_step_sizes[start_index:end_index])
                step_times, input_step_sizes = step_times_new, step_sizes_new

        step_index = get_step_indices_from_step_times(times, step_times)
        step_r_min = np.full(len(step_index), np.nan)
        step_r_max = np.full(len(step_index), np.nan)
        for i, start_index in enumerate(step_index):
            end_index = len(times) if i == len(step_index) - 1 else step_index[i + 1]
            if start_index == end_index:
                continue
            pre_step_val = response_signal[start_index - 1]
            step_response = response_signal[start_index:end_index]
            step_r_min[i] = np.min((step_response - pre_step_val) / input_step_sizes[i])
            step_r_max[i] = np.max((step_response - pre_step_val) / input_step_sizes[i])
        r_min_chrono = np.nanmean(step_r_min)
        r_max_chrono = np.nanpercentile(step_r_max, 99)
    else:
        r_min_chrono, r_max_chrono = np.inf, 0.0

    if z is not None:
        r_min_eis = np.min(np.asarray(z).real)
        r_max_eis = np.max(np.asarray(z).real)
    else:
        r_min_eis, r_max_eis = np.inf, 0.0

    return max(r_max_chrono, r_max_eis) - min(r_min_chrono, r_min_eis)


def estimate_rp_batch(times, step_times, input_step_sizes, response_batch,
                      step_model, z_batch):
    """``estimate_rp`` vectorized over a batch of observations that SHARE a
    measurement protocol (identical ``times``/``step_times``/step sizes).

    ``response_batch`` is (k, T) or None; ``z_batch`` is (k, F) or None.
    Returns (k,) Rp estimates, row-for-row equal to calling ``estimate_rp``
    per observation (pinned by tests/test_ragged.py) — the per-step segment
    reductions and the nanmean/nanpercentile aggregations act on the same
    values in the same order, only stacked along the batch axis. Used by the
    ragged fitter's shared-protocol prep fast paths, where the per-obs
    Python loop is the host bottleneck on large heterogeneous maps."""
    if response_batch is not None:
        v = np.asarray(response_batch, dtype=float)
        k = v.shape[0]
        times = np.asarray(times)
        step_times = np.asarray(step_times, dtype=float)
        input_step_sizes = np.asarray(input_step_sizes, dtype=float)
        if step_model == "ideal":
            # Condense consecutive steps exactly as estimate_rp does
            new_step_index = np.concatenate(
                ([0], np.where(np.diff(step_times) > 2e-5)[0] + 1))
            if len(new_step_index) < len(step_times):
                step_times_new = step_times[new_step_index]
                step_sizes_new = np.zeros_like(step_times_new)
                for i, start_index in enumerate(new_step_index):
                    end_index = len(input_step_sizes) \
                        if i == len(new_step_index) - 1 else new_step_index[i + 1]
                    step_sizes_new[i] = np.sum(
                        input_step_sizes[start_index:end_index])
                step_times, input_step_sizes = step_times_new, step_sizes_new

        step_index = get_step_indices_from_step_times(times, step_times)
        step_r_min = np.full((len(step_index), k), np.nan)
        step_r_max = np.full((len(step_index), k), np.nan)
        for i, start_index in enumerate(step_index):
            end_index = len(times) if i == len(step_index) - 1 \
                else step_index[i + 1]
            if start_index == end_index:
                continue
            pre_step_val = v[:, start_index - 1]
            step_response = v[:, start_index:end_index]
            ratio = (step_response - pre_step_val[:, None]) / input_step_sizes[i]
            step_r_min[i] = np.min(ratio, axis=1)
            step_r_max[i] = np.max(ratio, axis=1)
        r_min_chrono = np.nanmean(step_r_min, axis=0)
        r_max_chrono = np.nanpercentile(step_r_max, 99, axis=0)
    else:
        k = np.asarray(z_batch).shape[0]
        r_min_chrono = np.full(k, np.inf)
        r_max_chrono = np.zeros(k)

    if z_batch is not None:
        zr = np.asarray(z_batch).real
        r_min_eis = np.min(zr, axis=1)
        r_max_eis = np.max(zr, axis=1)
    else:
        r_min_eis = np.full(k, np.inf)
        r_max_eis = np.zeros(k)

    return (np.maximum(r_max_chrono, r_max_eis)
            - np.minimum(r_min_chrono, r_min_eis))


# ------------------------------------------------------------------
# Quantile/extreme flagging (reference :844-860)
# ------------------------------------------------------------------
def get_quantile_limits(y, qr_size=0.5, qr_thresh=1.5):
    q_lo = np.percentile(y, 50 - 100 * qr_size / 2)
    q_hi = np.percentile(y, 50 + 100 * qr_size / 2)
    qr = q_hi - q_lo
    return q_lo - qr * qr_thresh, q_hi + qr * qr_thresh


def identify_extreme_values(y, qr_size=0.5, qr_thresh=1.5):
    y_min, y_max = get_quantile_limits(y, qr_size, qr_thresh)
    return (y < y_min) | (y > y_max)


# ------------------------------------------------------------------
# Tau grid construction (reference :918-1018)
# ------------------------------------------------------------------
def get_time_since_step(times, step_times, prestep_value=None):
    times = np.asarray(times)
    step_times = np.asarray(step_times, dtype=float)
    time_deltas = []
    t_sample = np.min(np.diff(times)) if len(times) > 1 else times[0]
    if prestep_value is not None:
        time_deltas.append(np.tile(prestep_value, len(times[times < step_times[0]])))
    for i, start_time in enumerate(step_times):
        end_time = np.inf if i == len(step_times) - 1 else step_times[i + 1]
        mask = (times >= start_time) & (times < end_time)
        if np.sum(mask) > 0:
            time_deltas.append(np.maximum(times[mask] - start_time, t_sample))
    return np.concatenate(time_deltas)


def get_tau_lim(frequencies, times, step_times):
    if frequencies is not None:
        eis_tau_min = 1 / (2 * np.pi * np.max(frequencies))
        eis_tau_max = 1 / (2 * np.pi * np.min(frequencies))
    else:
        eis_tau_min, eis_tau_max = np.inf, -np.inf
    if times is not None:
        td = get_time_since_step(times, step_times)
        chrono_tau_min, chrono_tau_max = np.min(td), np.max(td)
    else:
        chrono_tau_min, chrono_tau_max = np.inf, -np.inf
    return min(eis_tau_min, chrono_tau_min), max(eis_tau_max, chrono_tau_max)


def get_num_decades(frequencies, times, step_times):
    tau_min, tau_max = get_tau_lim(frequencies, times, step_times)
    return np.log10(tau_max) - np.log10(tau_min)


def get_basis_tau(frequencies, times, step_times, ppd=10, extend_decades=1, tau_grid=None):
    """10-ppd log grid covering the data range +- extend_decades, optionally
    snapped to a shared supergrid (reference preprocessing.py:982-1013)."""
    tau_min, tau_max = get_tau_lim(frequencies, times, step_times)
    log_tau_min = np.log10(tau_min) - extend_decades
    log_tau_max = np.log10(tau_max) + extend_decades

    if tau_grid is not None:
        tau_grid = np.asarray(tau_grid)
        if 10 ** log_tau_min < np.min(tau_grid):
            left_index = 0
        else:
            left_index = nearest_index(tau_grid, 10 ** log_tau_min, constraint=-1)
        if 10 ** log_tau_max > np.max(tau_grid):
            right_index = len(tau_grid)
        else:
            right_index = nearest_index(tau_grid, 10 ** log_tau_max, constraint=1) + 1
        return tau_grid[left_index:right_index]

    num_points_exact = (log_tau_max - log_tau_min) * ppd + 1
    num_points = int(np.ceil(num_points_exact))
    add_decades = 0.5 * (num_points - num_points_exact) / ppd
    return np.logspace(log_tau_min - add_decades, log_tau_max + add_decades, num_points)


def get_epsilon_from_ppd(ppd, factor=1):
    return factor / np.log(10 ** (1 / ppd))


# ------------------------------------------------------------------
# Chrono downsampling (reference preprocessing.py:210-506)
# ------------------------------------------------------------------
def generate_log_times(times, step_times, ppd, prestep_samples=None):
    """Target sample times: log-uniform after each step (reference :210-270)."""
    times = np.asarray(times)
    step_times = np.asarray(step_times, dtype=float)
    t_sample = np.min(np.diff(times))
    out = []
    if prestep_samples is None or prestep_samples > 0:
        # prestep_samples=None keeps EVERY pre-step sample (reference
        # behavior); an integer subsamples evenly; 0 drops the baseline
        pre = times[times < step_times[0]]
        if prestep_samples is not None and len(pre) > prestep_samples:
            idx = np.unique(np.linspace(0, len(pre) - 1, prestep_samples).astype(int))
            pre = pre[idx]
        out.append(pre)
    for i, st in enumerate(step_times):
        end_time = times[-1] if i == len(step_times) - 1 else step_times[i + 1]
        span = end_time - st
        if span <= t_sample:
            continue
        num_decades = np.log10(span) - np.log10(t_sample)
        n_pts = max(2, int(np.ceil(num_decades * ppd)) + 1)
        out.append(st + np.logspace(np.log10(t_sample), np.log10(span), n_pts))
    return np.concatenate(out) if out else times


def filter_chrono_signal(times, y, step_index=None, input_signal=None,
                         decimate_index=None, sigma_factor=0.01,
                         max_sigma=None, remove_outliers=False, outlier_kw=None,
                         median_prefilter=False, **kw):
    """Antialiasing filter applied segmentwise between steps with a
    time-since-step-ramped per-sample width (reference :507-601): sigma
    follows the inverse curvature scale of an RC relaxation,
    sigma_ideal = e*(t - t0)/2, scaled by sigma_factor and capped by
    max_sigma and (when given) the decimation-derived widths, so the sharp
    early transient is preserved while the slow tail is smoothed."""
    from scipy.ndimage import median_filter
    from .filters import nonuniform_gaussian_filter1d
    times = np.asarray(times, dtype=float)
    y = np.asarray(y, dtype=float).copy()
    if step_index is None:
        if input_signal is not None:
            step_index = identify_steps(np.asarray(input_signal),
                                        allow_consecutive=False)
        else:
            step_index = identify_steps(y)

    if remove_outliers:
        y_filt = filter_chrono_signal(times, y, step_index=step_index,
                                      decimate_index=decimate_index,
                                      sigma_factor=sigma_factor,
                                      max_sigma=max_sigma,
                                      remove_outliers=False,
                                      median_prefilter=True, **kw)
        outlier_flag = flag_chrono_outliers(y, y_filt, **(outlier_kw or {}))
        y[outlier_flag] = y_filt[outlier_flag]

    t_sample = np.median(np.diff(times))
    if max_sigma is None:
        max_sigma = sigma_factor / t_sample
    dec_sigma = None
    if decimate_index is not None:
        dec_sigma = sigma_from_decimate_index(y, np.asarray(decimate_index))

    segments = np.split(np.arange(len(y)), step_index)
    y_out = y.copy()
    for seg in segments:
        if len(seg) < 5:
            continue
        t_seg = times[seg]
        # Ideal sigma from the inverse sqrt of the max curvature of an RC
        # relaxation starting one sample before the segment
        sigma_ideal = np.exp(1) * (t_seg - (t_seg[0] - t_sample)) / 2
        sigmas = np.minimum(sigma_factor * sigma_ideal / t_sample, max_sigma)
        if dec_sigma is not None:
            sigmas = np.minimum(dec_sigma[seg], sigmas)
        seg_y = y[seg]
        if median_prefilter:
            seg_y = median_filter(seg_y, size=3, mode="nearest")
        y_out[seg] = nonuniform_gaussian_filter1d(seg_y, sigmas, **kw)
    return y_out


def filter_chrono_signal_batch(times, y_batch, step_index, sigma_factor=0.01):
    """``filter_chrono_signal`` vectorized over a (k, T) batch of response
    signals that share a measurement protocol (identical ``times`` and
    ``step_index``); mirrors the plain branch the ragged prep fast path uses
    (no outlier removal / decimation / median prefilter).

    The per-sample sigma ladder depends only on ``times``/``step_index``, so
    every row sees the same node set and ``scipy.ndimage.gaussian_filter1d``
    along axis=-1 applies identical arithmetic per row — output rows equal
    the serial per-observation calls (pinned by tests/test_ragged.py)."""
    from .filters import nonuniform_gaussian_filter1d
    times = np.asarray(times, dtype=float)
    y = np.asarray(y_batch, dtype=float)
    t_sample = np.median(np.diff(times))
    max_sigma = sigma_factor / t_sample
    segments = np.split(np.arange(y.shape[1]), step_index)
    y_out = y.copy()
    for seg in segments:
        if len(seg) < 5:
            continue
        t_seg = times[seg]
        sigma_ideal = np.exp(1) * (t_seg - (t_seg[0] - t_sample)) / 2
        sigmas = np.minimum(sigma_factor * sigma_ideal / t_sample, max_sigma)
        y_out[:, seg] = nonuniform_gaussian_filter1d(
            y[:, seg], np.broadcast_to(sigmas, y[:, seg].shape), axis=-1)
    return y_out


def downsample_data(times, i_signal, v_signal, target_times=None, step_times=None,
                    op_mode="galv", ppd=20, prestep_samples=10, antialiased=True):
    """Log-uniform downsampling around steps (reference preprocessing.py:335-470).

    Returns (sample_index, (times, i, v)).
    """
    times = np.asarray(times)
    i_signal = np.asarray(i_signal, dtype=float)
    v_signal = np.asarray(v_signal, dtype=float)
    if step_times is None:
        input_signal = i_signal if op_mode == "galv" else v_signal
        step_idx = identify_steps(input_signal)
        step_times = times[step_idx]
    if target_times is None:
        target_times = generate_log_times(times, step_times, ppd, prestep_samples)

    # Map each target time to the nearest available sample at-or-after it
    sample_index = np.unique(np.searchsorted(times, target_times, side="left").clip(0, len(times) - 1))

    if antialiased:
        step_index = get_step_indices_from_step_times(times, step_times)
        response = v_signal if op_mode == "galv" else i_signal
        response_f = filter_chrono_signal(times, response, step_index=step_index)
        if op_mode == "galv":
            v_signal = response_f
        else:
            i_signal = response_f

    return sample_index, (times[sample_index], i_signal[sample_index], v_signal[sample_index])


def get_decimation_index(times, step_times, t_sample, prestep_points,
                         decimation_interval, decimation_factor, max_t_sample):
    """Geometric post-step decimation (reference preprocessing.py): keep
    `prestep_points` evenly spaced pre-step samples; after each step keep
    `decimation_interval` consecutive samples, then stretches of
    `decimation_interval` samples at stride decimation_factor**j (j = 1, 2,
    ...), with the stride capped at max_t_sample / t_sample. The last sample
    before each next step is always retained."""
    times = np.asarray(times)
    step_times = np.atleast_1d(np.asarray(step_times))

    n_pre = np.sum(times < step_times.min())
    keep = [np.linspace(0, n_pre - 1, prestep_points).round().astype(int)] \
        if n_pre else []

    max_stride = np.inf if max_t_sample is None else int(max_t_sample / t_sample)
    step_starts = [int(np.argmax((times >= st))) for st in step_times]
    boundaries = step_starts[1:] + [len(times)]

    for start, stop in zip(step_starts, boundaries):
        block = np.arange(start, min(start + decimation_interval + 1, stop))
        keep.append(block)
        last = block[-1]
        j = 1
        while last < stop - 1:
            stride = int(min(decimation_factor ** j, max_stride))
            end = stop if stride >= max_stride \
                else min(last + decimation_interval * stride + 1, stop)
            idx = np.arange(last + stride, end, stride)
            if len(idx) == 0:
                idx = np.array([end - 1])
            if end == stop and idx[-1] < stop - 1:
                idx = np.append(idx, stop - 1)
            keep.append(idx)
            last = idx[-1]
            j += 1
    return np.unique(np.concatenate(keep)).astype(int)


def select_decimation_interval(times, step_times, t_sample, prestep_points,
                               decimation_factor, max_t_sample, target_size):
    """Pick the decimation_interval whose kept-sample count is closest to
    target_size (reference preprocessing.py)."""
    intervals = np.logspace(np.log10(2), np.log10(1000), 12).astype(int)
    sizes = [len(get_decimation_index(times, step_times, t_sample,
                                      prestep_points, iv, decimation_factor,
                                      max_t_sample)) for iv in intervals]
    if target_size > sizes[-1] or target_size < sizes[0]:
        import warnings as _warnings
        _warnings.warn(f"Cannot achieve target size {target_size} with "
                       f"decimation factor {decimation_factor}; adjust the "
                       f"factor or maximum period")
    return int(np.interp(target_size, sizes, intervals))


def sigma_from_decimate_index(y, decimate_index, truncate=4.0):
    """Antialiasing filter widths for decimated sampling: sigma reaching
    halfway to the nearest kept neighbor (zero where sampling is dense)
    (reference preprocessing.py)."""
    sigmas = np.zeros(len(y))
    diff = np.diff(decimate_index)
    ldiff = np.insert(diff, 0, diff[0])
    rdiff = np.append(diff, diff[-1])
    min_diff = np.minimum(ldiff, rdiff)
    sigma_dec = min_diff / (2 * truncate)
    sigma_dec[min_diff < 2] = 0
    sigmas[decimate_index] = sigma_dec
    return sigmas


def get_ocv_index(times, step_times, step_sizes, input_signal,
                  samples_per_step=1, input_rthresh=0.05):
    """Indices of samples representative of the OCV (zero-input) state: the
    sample(s) immediately before each step whose pre-step input is below
    input_rthresh of the mean step size (reference preprocessing.py)."""
    step_index = get_step_indices_from_step_times(times, step_times)
    starts = step_index - samples_per_step
    pre_input = np.array([np.mean(input_signal[s:e])
                          for s, e in zip(starts, step_index)])
    thresh = np.mean(np.abs(step_sizes)) * input_rthresh
    at_ocv = np.where(np.abs(pre_input) < thresh)[0]
    if len(at_ocv) == 0:
        return np.array([], dtype=int)
    return np.concatenate([np.arange(starts[i], step_index[i], dtype=int)
                           for i in at_ocv])


def get_input_signal_scale(times, step_times, input_step_sizes, step_model):
    """Input scale = mean |step size|, with consecutive ideal steps (< 20 us
    apart) merged first (reference preprocessing.py)."""
    step_times = np.atleast_1d(np.asarray(step_times, dtype=float))
    input_step_sizes = np.atleast_1d(np.asarray(input_step_sizes, dtype=float))
    if step_model == "ideal" and len(step_times) > 1:
        group_start = np.concatenate(
            ([0], np.where(np.diff(step_times) > 2e-5)[0] + 1))
        if len(group_start) < len(step_times):
            ends = np.append(group_start[1:], len(input_step_sizes))
            input_step_sizes = np.array(
                [np.sum(input_step_sizes[s:e])
                 for s, e in zip(group_start, ends)])
    return np.mean(np.abs(input_step_sizes))


def discard_first_n_chrono(times, i_signal, v_signal, n, op_mode="galv"):
    """Remove the first n samples after each step (reference :discard_first_n)."""
    times = np.asarray(times)
    input_signal = i_signal if op_mode == "galv" else v_signal
    step_idx = identify_steps(np.asarray(input_signal))
    keep = np.ones(len(times), dtype=bool)
    for si in step_idx:
        keep[si:si + n] = False
    idx = np.where(keep)[0]
    return idx, (times[idx], np.asarray(i_signal)[idx], np.asarray(v_signal)[idx])


# ------------------------------------------------------------------
# Outlier probability and sampling-density helpers
# (reference preprocessing.py:594-600, 860-905)
# ------------------------------------------------------------------
def outlier_prob(x, mu_in, sigma_in, sigma_out, p_prior):
    """Bernoulli-prior outlier probability; deviations within sigma_in are
    never flagged (reference preprocessing.py:860-878)."""
    from .utils import stats
    sigma_out = np.maximum(np.asarray(sigma_out, dtype=float), 1e-300)
    pdf_in = np.asarray(stats.pdf_normal(x, mu_in, sigma_in))
    pdf_out = np.asarray(stats.pdf_normal(x, mu_in, sigma_out))
    p_out = np.array(p_prior * pdf_out / ((1 - p_prior) * pdf_in + p_prior * pdf_out))
    p_out[np.abs(np.asarray(x) - mu_in) <= sigma_in] = 0
    return p_out


def flag_chrono_outliers(y_raw, y_filt, thresh=0.75, p_prior=0.01):
    """Flag chrono points whose deviation from the filtered signal has high
    outlier probability (reference preprocessing.py:594-600)."""
    from .utils import stats
    dev = np.asarray(y_filt) - np.asarray(y_raw)
    std = stats.robust_std(dev)
    sigma_out = np.maximum(np.abs(dev), 0.01 * std)
    return outlier_prob(dev, 0, std, sigma_out, p_prior) > thresh


def get_ppd(x):
    """Points per decade of a positive array (reference preprocessing.py:882)."""
    num_decades = np.log10(np.max(x)) - np.log10(np.min(x))
    return (len(x) - 1) / num_decades


def get_time_ppd(times, step_times, aggregate=True):
    """Points per decade of time-since-step (reference preprocessing.py:890)."""
    times = np.asarray(times)
    t_sample = np.min(np.diff(times)) if len(times) > 1 else times[0]
    step_times = np.atleast_1d(step_times)
    tds = []
    for i, start in enumerate(step_times):
        end = step_times[i + 1] if i < len(step_times) - 1 else np.inf
        idx = np.where((times >= start) & (times < end))
        td = times[idx] - start + t_sample
        if len(td) > 1:
            tds.append(td)
    if aggregate:
        return get_ppd(np.concatenate(tds))
    return [get_ppd(td) for td in tds]


# Reference-compatible alias (reference preprocessing.py:238)
generate_loguniform_times = generate_log_times


def get_signal_scales(times, step_times, input_step_sizes, response_signal,
                      step_model):
    """(input_scale, response_scale): mean |step size| and mean per-step
    response range (reference preprocessing.py; superseded by estimate_rp
    for Rp-based scaling but kept for parity)."""
    input_scale = get_input_signal_scale(times, step_times, input_step_sizes,
                                         step_model)
    step_index = get_step_indices_from_step_times(times, step_times)
    bounds = np.append(step_index, len(times))
    ranges = [np.ptp(response_signal[bounds[i]:bounds[i + 1]])
              for i in range(len(step_index)) if bounds[i + 1] > bounds[i]]
    response_scale = np.mean(ranges) if ranges else 1.0
    return input_scale, response_scale
