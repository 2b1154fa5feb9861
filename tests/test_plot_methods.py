"""DRT class plotting methods (reference drt1d.py:4547-5420) — headless
smoke tests: every method renders without error and returns axes."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

from hybdrt_tpu import DRT


@pytest.fixture(scope="module")
def fitted_eis():
    rng = np.random.default_rng(0)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    z = 0.4 + 1.0 / (1 + (w * 1e-3) ** 0.9) + 0.8 / (1 + (w * 1e-1) ** 0.85)
    z = z + rng.normal(0, 1e-3, 41) + 1j * rng.normal(0, 1e-3, 41)
    drt = DRT(warn=False)
    drt.fit_eis(f, z)
    return drt, f, z


def test_eis_plots(fitted_eis):
    drt, f, z = fitted_eis
    assert drt.plot_eis_fit() is not None
    assert drt.plot_eis_fit(plot_type="bode") is not None
    axes = drt.plot_eis_residuals()
    assert len(axes) == 2
    assert drt.plot_results() is not None


def test_distribution_plots(fitted_eis):
    drt, f, z = fitted_eis
    ax = drt.plot_distribution(mark_peaks=True)
    assert ax is not None
    assert drt.plot_drt(show_ci=False) is not None
    ax = drt.plot_peak_distributions()
    assert ax is not None


def test_chrono_plots():
    rng = np.random.default_rng(0)
    t_pre = np.linspace(-0.01, -0.0005, 10)
    times = np.concatenate([t_pre, np.logspace(-5, 0.5, 100)])
    i_sig = np.where(times >= 0, 0.1, 0.0)
    v = 0.05 + 0.1 * np.where(times >= 0,
                              0.3 + 1.5 * (1 - np.exp(-np.maximum(times, 0) / 1e-2)), 0.0)
    v = v + rng.normal(size=len(times)) * 2e-4
    drt = DRT(warn=False)
    drt.fit_chrono(times, i_sig, v)
    assert drt.plot_chrono_fit() is not None
    assert drt.plot_chrono_residuals() is not None


def test_dual_and_kk_plots(fitted_eis):
    _, f, z = fitted_eis
    drt = DRT(warn=False)
    drt.kk_test(f, z)
    assert drt.plot_kk_results() is not None

    drt2 = DRT(warn=False)
    drt2.dual_fit_eis(f, z)
    assert drt2.plot_candidate_distribution(2, "continuous") is not None
    assert drt2.plot_candidate_distribution(2, "discrete") is not None
    assert drt2.plot_pdrt() is not None
    assert drt2.plot_norm_bayes_factors() is not None


def test_dop_plot():
    rng = np.random.default_rng(0)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    z = 0.4 + 1.0 / (1 + (w * 1e-3) ** 0.9) + rng.normal(0, 1e-3, 41) * (1 + 1j)
    drt = DRT(warn=False, fit_dop=True)
    drt.fit_eis(f, z)
    assert drt.plot_dop() is not None


def test_plot_chrono_correction():
    rng = np.random.default_rng(0)
    times = np.concatenate([np.linspace(-0.01, -0.0005, 15),
                            np.logspace(-5, 0.5, 120)])
    i_sig = np.where(times >= 0, 0.1, 0.0)
    v = 0.05 + 0.1 * np.where(times >= 0,
                              0.3 + 1.5 * (1 - np.exp(-np.maximum(times, 0) / 1e-2)), 0.0)
    v = v + 0.01 * np.sin(2 * np.pi * times / 1.5) + rng.normal(size=len(times)) * 2e-4
    drt = DRT(warn=False)
    drt.fit_chrono(times, i_sig, v, subtract_background=True,
                   estimate_background_kw={"gp_kw": {"n_grid": 4}})
    assert drt.plot_chrono_correction() is not None


def test_plot_peak_drts_and_zga(fitted_eis):
    drt, f, z = fitted_eis
    ax = drt.plot_peak_drts()
    assert ax is not None
    # ZGA approximation plot requires zga_params
    with pytest.raises(ValueError):
        drt.plot_zga_approximation()


def test_discrete_model_plot_methods(fitted_eis):
    """DiscreteElementModel plotting surface (reference
    elements.py:1352-1800)."""
    drt, f, z = fitted_eis
    from hybdrt_tpu.models.elements import DiscreteElementModel
    m = DiscreteElementModel.from_drt(drt, element_types="RQ")
    m.fit_eis(f, z)
    assert m.plot_distribution() is not None
    assert m.plot_drt() is not None
    assert m.plot_element_drts() is not None
    axes = m.plot_eis_fit()
    assert len(np.atleast_1d(axes)) == 3
    axes = m.plot_eis_residuals()
    assert len(np.atleast_1d(axes)) == 2


def test_plot_data_processing_and_helpers():
    """process_eis_plot_data / process_chrono_plot_data accept containers,
    tuples, and DataFrames; zoom/shade/tick helpers render
    (reference plotting.py helper surface)."""
    import pandas as pd
    import matplotlib.pyplot as plt
    from hybdrt_tpu import plotting as hplt
    from hybdrt_tpu.dataload import ZData, ChronoData

    f = np.logspace(3, 0, 10)
    z = 1.0 + 1.0 / (1 + 2j * np.pi * f * 1e-2)
    zd = ZData(f, z)
    for src in (zd, (f, z), pd.DataFrame({"freq": f, "real": z.real,
                                          "imag": z.imag})):
        fo, zo = hplt.process_eis_plot_data(src)
        assert np.allclose(zo, z)
    # polar DataFrame form
    fo, zo = hplt.process_eis_plot_data(pd.DataFrame(
        {"freq": f, "modulus": np.abs(z),
         "phase": np.degrees(np.angle(z))}))
    assert np.allclose(zo, z)
    with pytest.raises(ValueError):
        hplt.process_eis_plot_data(pd.DataFrame({"freq": f}))

    t = np.linspace(0, 1, 20)
    cd = ChronoData(t, np.ones(20), np.zeros(20))
    for src in (cd, (t, np.ones(20), np.zeros(20)),
                pd.DataFrame({"time": t, "i": np.ones(20),
                              "v": np.zeros(20)})):
        to, io, vo = hplt.process_chrono_plot_data(src)
        assert np.allclose(to, t)

    # Containers plug directly into the plot functions
    ax = hplt.plot_nyquist(zd)
    hplt.zoom_nyquist_x(ax, (0.9, 2.1))
    hplt.zoom_nyquist_y(ax, (0, 0.6))
    ax2 = hplt.plot_chrono(cd)

    fig, ax3 = plt.subplots()
    ax3.semilogx([1e-4, 1e2], [0, 1])
    hplt.shade_extrap_regions(ax3, 1e-3, 1e1)

    from hybdrt_tpu.utils.chrono import get_time_transforms
    times = np.concatenate([np.linspace(-0.01, -0.001, 5),
                            np.logspace(-5, 0, 50),
                            1.0 + np.logspace(-5, 0, 50)])
    trans = get_time_transforms(times, np.array([0.0, 1.0]))
    fig, ax4 = plt.subplots()
    ax4.plot(trans[1](times), np.ones(len(times)))
    hplt.display_linear_time_ticks(ax4, times, np.array([0.0, 1.0]), trans)
    plt.close("all")
