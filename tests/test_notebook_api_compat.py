"""Reference-notebook API compatibility: every distinctive call signature
the reference's tutorials and webinar notebooks use must run against this
package (a switching user replays those notebooks verbatim). Signatures
extracted from reference tutorials/*.ipynb and webinar/software_demo.ipynb."""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from hybdrt_tpu import DRT
from hybdrt_tpu.models.elements import DiscreteElementModel

FREQ = np.logspace(5, -1, 41)
TAU_PLOT = np.logspace(-6, 1, 141)


@pytest.fixture(scope="module")
def fitted():
    z = (0.5 + 1.0 / (1 + (2j * np.pi * FREQ * 1e-3) ** 0.9)
         + 0.8 / (1 + (2j * np.pi * FREQ * 1e-1) ** 0.85))
    rng = np.random.default_rng(0)
    z = z + 0.002 * (rng.normal(size=41) + 1j * rng.normal(size=41))
    drt = DRT()
    drt.fit_eis(FREQ, z)
    return drt, z


def test_plot_drt_reference_kwargs(fitted):
    drt, _ = fitted
    _, ax = plt.subplots()
    drt.plot_drt(ax=ax, c="k", plot_ci=True, label="b", mark_peaks=True,
                 mark_peaks_kw={"edgecolors": "k", "facecolors": "none"})
    out = drt.plot_drt(c="k", plot_ci=True, return_line=True, ax=ax)
    assert isinstance(out, tuple) and out[1] is not None
    drt.plot_drt(normalize=True, c="r", ls="--")
    peak_tau = drt.find_peaks(prominence=1e-2)
    drt.plot_drt(mark_peaks=True, mark_peaks_kw=dict(peak_tau=peak_tau))
    plt.close("all")


def test_plot_eis_fit_reference_kwargs(fitted):
    drt, _ = fitted
    drt.plot_eis_fit(plot_type="bode", bode_rep="polar")
    ax = drt.plot_eis_fit(plot_type="nyquist", c="r", data_kw={"c": "green"})
    # kwargs style the FIT line; data_kw styles the measured points
    assert any(l.get_color() == "r" for l in ax.get_lines())
    axes = drt.plot_eis_fit(plot_type="all", plot_data=False)
    assert len(np.ravel(axes)) == 3
    drt.plot_eis_residuals()
    plt.close("all")


def test_peak_drt_reference_kwargs(fitted):
    drt, _ = fitted
    gammas = drt.estimate_peak_drts(TAU_PLOT,
                                    find_peaks_kw=dict(prominence=1e-2))
    assert gammas.shape[1] == len(TAU_PLOT)
    _, ax = plt.subplots()
    peak_tau = drt.find_peaks()
    drt.plot_peak_drts(ax=ax, alpha=0.9,
                       estimate_peak_drts_kw={"peak_tau": peak_tau}, label="x")
    drt.plot_peak_drts(tau=TAU_PLOT, peak_gammas=gammas, alpha=0.75)
    plt.close("all")


def test_discrete_model_reference_kwargs(fitted):
    drt, z = fitted
    dem = DiscreteElementModel.from_drt(drt, drt_element="RQ")
    assert dem.num_drt_elements >= 1
    dem.fit_eis(FREQ, z, from_drt=False)
    _, ax = plt.subplots()
    dem.plot_element_drts(
        TAU_PLOT, ax=ax,
        kw_list=[{"label": f"RQ{i + 1}"} for i in range(dem.num_drt_elements)])
    labels = [l.get_label() for l in ax.get_lines()]
    assert "RQ1" in labels
    plt.close("all")


def test_predict_distribution_accepts_raw_solver_vector(fitted):
    """The probabilistic-fitting notebook plots pfrt history entries via
    plot_drt(x=step_x_row): raw solver-space vectors (special params +
    scaled coefs) must be stripped and unscaled like the reference."""
    drt_pf = DRT()
    freq = np.logspace(4, -1, 21)
    z = 0.4 + 1.0 / (1 + (2j * np.pi * freq * 1e-2) ** 0.9)
    drt_pf.pfrt_fit_eis(freq, z)
    step_x = np.asarray(drt_pf.pfrt_result["step_x"])
    g = drt_pf.predict_distribution(TAU_PLOT, x=step_x[-1])
    assert g.shape == TAU_PLOT.shape and np.all(np.isfinite(g))
    _, ax = plt.subplots()
    drt_pf.plot_drt(x=step_x[0], ax=ax)
    plt.close("all")
