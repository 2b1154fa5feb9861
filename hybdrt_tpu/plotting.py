"""Plotting utilities: Nyquist/Bode/chrono/distribution plots
(reference hybdrt/plotting.py). Host-side matplotlib; all data-unit scaling
uses SI prefixes from utils.units."""
import numpy as np

from .utils import units as units_mod
from .utils.chrono import get_time_transforms


def _get_ax(ax=None, figsize=(4, 3)):
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots(figsize=figsize)
    return ax


def get_scale_prefix(values):
    """SI prefix string for a set of values (reference plotting.py scaling)."""
    return units_mod.get_prefix_char(np.max(np.abs(np.asarray(values))))


def _scale_factor(prefix):
    return units_mod.UnitPrefix(prefix).scale if prefix is not None else 1.0


# ------------------------------------------------------------------
# EIS plots (reference plotting.py:302-1010)
# ------------------------------------------------------------------
def process_eis_plot_data(data):
    """Normalize EIS plot input to (freq, z): accepts an ImmittanceData
    container, a (freq, z) tuple, a bare complex array, or a DataFrame with
    freq + real/imag (or modulus/phase) columns (reference plotting.py)."""
    from .dataload.datatypes import ImmittanceData
    if isinstance(data, ImmittanceData):
        return data.freq, data.x
    if isinstance(data, (tuple, list)):
        if len(data) != 2:
            raise ValueError("EIS data tuple must be (frequencies, z)")
        return np.asarray(data[0]), np.asarray(data[1])
    if hasattr(data, "columns"):  # DataFrame
        cols = set(data.columns)
        if not {"freq"} <= cols:
            raise ValueError("DataFrame must contain a 'freq' column")
        if {"real", "imag"} <= cols:
            z = data["real"].to_numpy() + 1j * data["imag"].to_numpy()
        elif {"z_re", "z_im"} <= cols:  # the library's standardized schema
            z = data["z_re"].to_numpy() + 1j * data["z_im"].to_numpy()
        elif {"y_re", "y_im"} <= cols:
            z = data["y_re"].to_numpy() + 1j * data["y_im"].to_numpy()
        elif {"modulus", "phase"} <= cols:
            z = data["modulus"].to_numpy() * np.exp(
                1j * np.deg2rad(data["phase"].to_numpy()))
        else:
            raise ValueError("DataFrame must contain (real, imag), "
                             "(z_re, z_im), (y_re, y_im), or "
                             "(modulus, phase) columns")
        return data["freq"].to_numpy(), z
    return None, np.asarray(data)  # bare complex array


def process_chrono_plot_data(data):
    """Normalize chrono plot input to (times, i_signal, v_signal): accepts a
    ChronoData container, a 3-tuple, or a DataFrame with time/i/v columns
    (reference plotting.py)."""
    from .dataload.datatypes import ChronoData
    if isinstance(data, ChronoData):
        return data.time, data.i, data.v
    if isinstance(data, (tuple, list)):
        if len(data) != 3:
            raise ValueError("Chrono data tuple must be (times, i, v)")
        return data
    if hasattr(data, "columns"):
        cols = set(data.columns)
        if {"time", "i", "v"} <= cols:
            return (data["time"].to_numpy(), data["i"].to_numpy(),
                    data["v"].to_numpy())
        raise ValueError("DataFrame must contain time, i, v columns")
    raise ValueError("data must be ChronoData, a (times, i, v) tuple, or a "
                     "DataFrame")


def plot_nyquist(data, ax=None, scale_prefix=None, label="", set_aspect_ratio=True,
                 plot_func="scatter", **kw):
    """Nyquist plot (-Z'' vs Z'). data = ZData, (freq, z), or z array."""
    freq, z = process_eis_plot_data(data)
    z = np.asarray(z)
    ax = _get_ax(ax)
    if scale_prefix is None:
        scale_prefix = get_scale_prefix(np.concatenate([z.real, z.imag]))
    scale = _scale_factor(scale_prefix)
    getattr(ax, plot_func)(z.real / scale, -z.imag / scale, label=label, **kw)
    ax.set_xlabel(f"$Z^{{\\prime}}$ ({scale_prefix}$\\Omega$)")
    ax.set_ylabel(f"$-Z^{{\\prime\\prime}}$ ({scale_prefix}$\\Omega$)")
    if set_aspect_ratio:
        ax.set_aspect("equal", adjustable="datalim")
    return ax


def plot_bode(data, axes=None, scale_prefix=None, rep="cartesian", plot_func="scatter",
              label="", **kw):
    """Bode plots vs frequency; rep in ('cartesian', 'polar')."""
    import matplotlib.pyplot as plt
    freq, z = process_eis_plot_data(data)
    freq = np.asarray(freq)
    z = np.asarray(z)
    if axes is None:
        _, axes = plt.subplots(1, 2, figsize=(8, 3))
    if scale_prefix is None:
        scale_prefix = get_scale_prefix(np.concatenate([z.real, z.imag]))
    scale = _scale_factor(scale_prefix)
    if rep == "cartesian":
        ys = (z.real / scale, -z.imag / scale)
        labels = (f"$Z^{{\\prime}}$ ({scale_prefix}$\\Omega$)",
                  f"$-Z^{{\\prime\\prime}}$ ({scale_prefix}$\\Omega$)")
    else:
        ys = (np.abs(z) / scale, np.angle(z, deg=True))
        labels = (f"$|Z|$ ({scale_prefix}$\\Omega$)", r"$\theta$ ($^\circ$)")
    for ax, y, ylabel in zip(np.ravel(axes), ys, labels):
        getattr(ax, plot_func)(freq, y, label=label, **kw)
        ax.set_xscale("log")
        ax.set_xlabel("$f$ (Hz)")
        ax.set_ylabel(ylabel)
    return axes


def plot_eis(data, plot_type="all", axes=None, **kw):
    """Combined Nyquist + Bode plot (reference plotting.py:858)."""
    import matplotlib.pyplot as plt
    if plot_type == "nyquist":
        return plot_nyquist(data, ax=axes, **kw)
    if plot_type == "bode":
        return plot_bode(data, axes=axes, **kw)
    if axes is None:
        _, axes = plt.subplots(1, 3, figsize=(11, 3))
    plot_nyquist(data, ax=axes[0], **kw)
    plot_bode(data, axes=axes[1:], **kw)
    axes[0].get_figure().tight_layout()
    return axes


# ------------------------------------------------------------------
# Chrono plots (reference plotting.py:17-292)
# ------------------------------------------------------------------
def get_transformed_plot_time(times, step_times):
    """Piecewise-log transformed time axis for step-response plots
    (reference plotting.py:154)."""
    _, fwd = get_time_transforms(times, step_times)
    return fwd(times)


def plot_chrono(data, ax=None, which="v", step_times=None, transform_time=False,
                scale_prefix=None, label="", plot_func="plot", **kw):
    """Plot chrono current/voltage vs (optionally step-transformed) time."""
    times, i_signal, v_signal = process_chrono_plot_data(data)
    times = np.asarray(times)
    y = np.asarray(v_signal if which == "v" else i_signal)
    ax = _get_ax(ax)
    if scale_prefix is None:
        scale_prefix = get_scale_prefix(y)
    scale = _scale_factor(scale_prefix)
    if transform_time and step_times is not None:
        x = get_transformed_plot_time(times, step_times)
        ax.set_xlabel("Transformed time")
    else:
        x = times
        ax.set_xlabel("$t$ (s)")
    getattr(ax, plot_func)(x, y / scale, label=label, **kw)
    unit = "V" if which == "v" else "A"
    ax.set_ylabel(f"${which}$ ({scale_prefix}{unit})")
    return ax


# ------------------------------------------------------------------
# Distribution plots (reference plotting.py:322-389)
# ------------------------------------------------------------------
def plot_distribution(tau, gamma, ax=None, scale_prefix=None, ylabel=None,
                      normalize_by=None, log_scale_x=True, **kw):
    ax = _get_ax(ax)
    gamma = np.asarray(gamma)
    if normalize_by is not None:
        gamma = gamma / normalize_by
        scale_prefix = ""
    if scale_prefix is None:
        scale_prefix = get_scale_prefix(gamma)
    scale = _scale_factor(scale_prefix)
    ax.plot(tau, gamma / scale, **kw)
    if log_scale_x:
        ax.set_xscale("log")
    ax.set_xlabel(r"$\tau$ (s)")
    if ylabel is None:
        ylabel = fr"$\gamma$ ({scale_prefix}$\Omega$)"
    ax.set_ylabel(ylabel)
    return ax


# ------------------------------------------------------------------
# Model-level plots
# ------------------------------------------------------------------
def plot_drt_result(drt, axes=None, tau=None, ppd=20, show_ci=True, distribution_kw=None,
                    **eis_kw):
    """Fit overview: data vs model impedance + fitted DRT with credible bands
    (reference drt1d.plot_results, drt1d.py:5330)."""
    import matplotlib.pyplot as plt
    if axes is None:
        fig, axes = plt.subplots(1, 3, figsize=(11, 3))
    freq = drt.get_fit_frequencies()
    if freq is not None and len(freq) > 0:
        z_hat = drt.predict_z(freq)
        plot_nyquist((freq, drt.z_fit), ax=axes[0], label="data", **eis_kw)
        plot_nyquist((freq, z_hat), ax=axes[0], plot_func="plot", c="k", label="fit")
        axes[0].legend()
        # Residuals
        sigma = drt.fit_parameters.get("z_sigma_tot")
        resid = (z_hat - drt.z_fit)
        axes[1].scatter(freq, resid.real, s=10, label="Re")
        axes[1].scatter(freq, resid.imag, s=10, label="Im")
        if sigma is not None and show_ci:
            axes[1].fill_between(freq, -3 * sigma.real, 3 * sigma.real, alpha=0.15,
                                 color="k", label=r"$\pm 3\sigma$")
        axes[1].set_xscale("log")
        axes[1].set_xlabel("$f$ (Hz)")
        axes[1].set_ylabel(r"$\hat{Z} - Z$ ($\Omega$)")
        axes[1].legend()
    if tau is None:
        tau = drt.get_tau_eval(ppd)
    gamma = drt.predict_distribution(tau)
    distribution_kw = distribution_kw or {}
    plot_distribution(tau, gamma, ax=axes[2], **distribution_kw)
    if show_ci:
        lo, hi = drt.predict_drt_ci(tau=tau)
        if lo is not None:
            prefix = get_scale_prefix(gamma)
            scale = _scale_factor(prefix)
            axes[2].fill_between(tau, lo / scale, hi / scale, alpha=0.2, color="k")
    axes[2].get_figure().tight_layout()
    return axes


def plot_dop(drt, ax=None, nu=None, normalize=True, **kw):
    """Distribution of phasances vs nu (reference drt1d.py:5243)."""
    if nu is None:
        nu = np.linspace(-1, 1, 201)
    dop = drt.predict_dop(nu=nu, normalize=normalize)
    ax = _get_ax(ax)
    ax.plot(nu, dop, **kw)
    ax.set_xlabel(r"$\nu$")
    ax.set_ylabel(r"$\rho$" + (" (normalized)" if normalize else ""))
    return ax


def plot_kk_results(drt, axes=None, norm="modulus", outlier_index=None, f_lim=None,
                    s=20, alpha=0.5, **kw):
    """KK residual plots with outliers and valid-window markers
    (reference drt1d.plot_kk_results)."""
    import matplotlib.pyplot as plt
    f_fit = drt.get_fit_frequencies()
    y_err = drt.eval_kk_residuals(norm=norm)
    if outlier_index is None:
        outlier_index = drt.get_kk_outliers(norm=norm)
    mask = np.zeros(len(f_fit), dtype=bool)
    mask[np.asarray(outlier_index, dtype=int)] = True
    unit = "% of $|Z|$" if norm == "modulus" else r"$\Omega$"

    if axes is None:
        _, axes = plt.subplots(1, 3, figsize=(9, 2.75))
    plot_bode((f_fit[~mask], y_err[~mask]), axes=axes[:2], rep="cartesian", s=s,
              alpha=alpha, **kw)
    if mask.any():
        plot_bode((f_fit[mask], y_err[mask]), axes=axes[:2], rep="cartesian", s=s,
                  alpha=alpha, c="r", **kw)
    axes[2].scatter(f_fit[~mask], np.abs(y_err[~mask]), s=s, alpha=alpha, **kw)
    axes[2].scatter(f_fit[mask], np.abs(y_err[mask]), s=s, alpha=alpha, c="r", **kw)
    axes[2].set_xscale("log")
    axes[2].set_xlabel("$f$ (Hz)")
    axes[2].set_ylabel(f"Error modulus ({unit})")

    if f_lim is None:
        f_lim = drt.get_kk_limits(outlier_index)
    for ax in np.ravel(axes):
        ax.axhline(0, c="k", lw=1, zorder=-10)
        for f in f_lim:
            ax.axvline(f, c="k", ls=":")
    axes[0].set_ylabel(f"$Z^{{\\prime}}$ residuals ({unit})")
    # plot_bode's cartesian panel plots -Im; label accordingly
    axes[1].set_ylabel(f"$-Z^{{\\prime\\prime}}$ residuals ({unit})")
    fig = np.ravel(axes)[0].get_figure()
    fig.tight_layout()
    return axes


# ------------------------------------------------------------------
# Axis helpers (reference plotting.py:162-320, 570-650)
# ------------------------------------------------------------------
def add_linear_time_axis(ax, times, step_times, trans_functions):
    """Secondary top axis showing linear time on a transformed-time plot
    (reference plotting.py:162)."""
    axt = ax.secondary_xaxis("top", functions=trans_functions)
    t_ticks = np.append(np.atleast_1d(step_times), times[-1])
    max_nticks = max(len(ax.get_xticks()), 1)
    factor = int(np.ceil(len(t_ticks) / max_nticks))
    axt.set_xticks(t_ticks[::max(factor, 1)])
    axt.set_xlabel("$t$ (s)")
    return axt


def add_freq_axis(ax):
    """Secondary frequency axis on a tau-axis DRT plot
    (reference plotting.py:293)."""
    def ft_trans(x):
        with np.errstate(divide="ignore"):
            return 1 / (2 * np.pi * x)
    freq_ax = ax.secondary_xaxis("top", functions=(ft_trans, ft_trans))
    freq_ax.set_xlabel("$f$ (Hz)")
    return freq_ax


def normalize_and_scale(f, area=None, scale_prefix=None, normalize_by=None):
    """Apply basis-area and Rp normalization, then unit-prefix scaling
    (reference plotting.py:303-320)."""
    f = np.asarray(f)
    if area is not None:
        f = f * area
    if normalize_by is not None:
        f = f / normalize_by
    if scale_prefix is None:
        scale_prefix = get_scale_prefix(f)
    return f, scale_prefix, _scale_factor(scale_prefix)


def shade_extrap_regions(ax, tau_min, tau_max, color="gray", alpha=0.2, ls="",
                         **kw):
    """Shade the extrapolation regions of a distribution plot — tau outside
    the measured window (reference plotting.py)."""
    if tau_min is not None:
        ax.axvspan(ax.get_xlim()[0], tau_min, color=color, alpha=alpha, ls=ls,
                   **kw)
    if tau_max is not None:
        ax.axvspan(tau_max, ax.get_xlim()[1], color=color, alpha=alpha, ls=ls,
                   **kw)
    return ax


def display_linear_time_ticks(ax, times, step_times, trans_functions,
                              step_increment=1, ticks_per_step=9,
                              major_tick_format=".1f"):
    """Linear-time tick labels on a step-transformed time axis: major ticks
    at step times (+ the final time), minor ticks evenly spaced in linear
    time within each step (reference plotting.py)."""
    _, time2trans = trans_functions
    step_times = np.atleast_1d(np.asarray(step_times))[::step_increment]
    major = np.append(step_times, times[-1])
    minor = np.concatenate([
        np.linspace(major[i], major[i + 1], ticks_per_step + 2)[1:-1]
        for i in range(len(major) - 1)])
    ax.set_xticks(np.atleast_1d(time2trans(major)))
    ax.set_xticklabels([f"{t:{major_tick_format}}" for t in major])
    ax.set_xticks(np.atleast_1d(time2trans(minor)), minor=True)
    ax.set_xlabel("$t$ (s)")
    return ax


def zoom_nyquist_x(ax, xlim, ymin=None, tight_layout=True):
    """Zoom a Nyquist plot to an x (Z') range, keeping the equal aspect
    (reference plotting.py)."""
    ax.set_xlim(*xlim)
    if ymin is not None:
        ax.set_ylim(bottom=ymin)
    set_nyquist_aspect(ax, set_to_axis="x", tight_layout=tight_layout)
    return ax


def zoom_nyquist_y(ax, ylim, xmin=None, tight_layout=True):
    """Zoom a Nyquist plot to a y (-Z'') range, keeping the equal aspect
    (reference plotting.py)."""
    ax.set_ylim(*ylim)
    if xmin is not None:
        ax.set_xlim(left=xmin)
    set_nyquist_aspect(ax, set_to_axis="y", tight_layout=tight_layout)
    return ax


def set_nyquist_aspect(ax, data=None, set_to_axis=None, tight_layout=True):
    """Equal-impedance-scale aspect for Nyquist plots
    (reference plotting.py:570)."""
    if data is not None:
        z = np.asarray(data)
        xspan = np.max(z.real) - np.min(z.real)
        yspan = np.max(-z.imag) - np.min(-z.imag)
        if set_to_axis is None:
            set_to_axis = "x" if xspan >= yspan else "y"
    ax.set_aspect("equal")
    if tight_layout:
        ax.get_figure().tight_layout()
    return ax
