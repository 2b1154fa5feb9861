"""Tests for discrete equivalent-circuit models and the from_drt pipeline."""
import numpy as np
import pytest

from hybdrt_tpu.models.elements import (
    DiscreteElementModel, parse_model_string, element_impedance_function,
    element_distribution_function, get_constraint_transforms)
from hybdrt_tpu.models.drt import DRT


def _zarc(f, r, lntau, beta):
    return r / (1 + (2j * np.pi * f * np.exp(lntau)) ** beta)


def test_parse_model_string():
    names, types, ptypes, pnames, bounds, pidx = parse_model_string("R0-L0-HN1-HN2")
    assert names == ["R0", "L0", "HN1", "HN2"]
    assert types == ["R", "L", "HN", "HN"]
    assert pnames[0] == "R_R0"
    assert pnames[2] == "R_HN1"
    assert pidx[-1] == (6, 10)
    with pytest.raises(ValueError):
        parse_model_string("R0-R0")


def test_element_impedance_closed_forms():
    freq = np.logspace(3, -1, 9)
    w = 2 * np.pi * freq
    z_rc = np.asarray(element_impedance_function("RC")(freq, 2.0, np.log(1e-2)))
    assert np.allclose(z_rc, 2.0 / (1 + 1j * w * 1e-2))
    z_l = np.asarray(element_impedance_function("L")(freq, np.log(1e-6)))
    assert np.allclose(z_l, 1j * w * 1e-6)
    # HN with alpha=1 reduces to RQ
    z_hn = np.asarray(element_impedance_function("HN")(freq, 1.0, np.log(1e-2), 1.0, 0.8))
    z_rq = np.asarray(element_impedance_function("RQ")(freq, 1.0, np.log(1e-2), 0.8))
    assert np.allclose(z_hn, z_rq)


def test_rq_distribution_integrates_to_r():
    """gamma(ln tau) of an RQ element integrates to R."""
    tau = np.logspace(-8, 4, 4000)
    g = np.asarray(element_distribution_function("RQ")(tau, 1.5, np.log(1e-2), 0.8))
    area = np.trapezoid(g, x=np.log(tau))
    assert np.isclose(area, 1.5, rtol=1e-3)


def test_constraint_transform_roundtrip():
    bounds = [(-np.inf, np.inf), (0, 1), (0, np.inf), (-1, 1)]
    t, inv = get_constraint_transforms(bounds)
    x = np.array([3.2, 0.7, 5.0, -0.3])
    x_rt = np.asarray(inv(np.asarray(t(x))))
    assert np.allclose(x_rt, x, rtol=1e-8)


def test_fit_eis_recovers_truth():
    rng = np.random.default_rng(7)
    freq = np.logspace(5, -1, 51)
    z = 0.4 + 1j * 2 * np.pi * freq * 2e-7 + _zarc(freq, 1.2, np.log(1e-3), 0.85) \
        + _zarc(freq, 0.9, np.log(0.05), 0.9)
    z_noisy = z + (rng.normal(size=51) + 1j * rng.normal(size=51)) * 0.002

    m = DiscreteElementModel("R0-L0-RQ1-RQ2")
    m.parameter_values = np.array([0.5, np.log(1e-7), 1.0, np.log(1e-3), 0.9,
                                   1.0, np.log(0.1), 0.9])
    m.fit_eis(freq, z_noisy)
    p = m.get_parameter_dict()
    assert abs(p["R_R0"] - 0.4) < 0.01
    assert abs(p["R_RQ1"] - 1.2) < 0.05
    assert abs(p["lntau_RQ1"] - np.log(1e-3)) < 0.05
    assert abs(p["beta_RQ1"] - 0.85) < 0.02
    assert abs(p["R_RQ2"] - 0.9) < 0.05
    assert bool(m.fit_result.converged)
    # Beta respects its (0, 1) bound
    assert 0 < p["beta_RQ1"] < 1


def test_from_drt_pipeline():
    """DRT fit -> peak detection -> discrete model init -> LM refinement."""
    rng = np.random.default_rng(7)
    freq = np.logspace(5, -1, 51)
    z = 0.4 + 1j * 2 * np.pi * freq * 2e-7 + _zarc(freq, 1.2, np.log(1e-3), 0.85) \
        + _zarc(freq, 0.9, np.log(0.05), 0.9)
    z_noisy = z + (rng.normal(size=51) + 1j * rng.normal(size=51)) * 0.002

    drt = DRT(warn=False)
    drt.fit_eis(freq, z_noisy)
    m = DiscreteElementModel.from_drt(drt, element_types="RQ")
    assert m.model_string == "R0-L0-RQ1-RQ2"
    m.fit_eis(freq, z_noisy)
    p = m.get_parameter_dict()
    assert abs(p["R_RQ1"] - 1.2) < 0.05
    assert abs(p["R_RQ2"] - 0.9) < 0.05
    # BIC should favor the true structure over an overparameterized one
    m3 = DiscreteElementModel("R0-L0-RQ1-RQ2-RQ3")
    m3.parameter_values = np.concatenate([m.parameter_values, [0.05, np.log(1e1), 0.9]])
    m3.fit_eis(freq, z_noisy)
    assert m.evaluate_bic() < m3.evaluate_bic()


def test_predict_response_rc():
    m = DiscreteElementModel("R0-RC1")
    m.parameter_values = np.array([0.3, 1.0, np.log(1e-2)])
    times = np.linspace(-0.01, 0.1, 200)
    v = m.predict_response(times, [0.0], [0.1])
    expected = 0.1 * np.where(times > 0, 0.3 + 1.0 * (1 - np.exp(-np.maximum(times, 0) / 1e-2)), 0)
    assert np.allclose(v, expected, atol=1e-10)


def test_element_level_accessors():
    """Per-element DRT/impedance, totals, setters (reference
    elements.py:302-410,1126-1212)."""
    import pytest
    from hybdrt_tpu.models.elements import DiscreteElementModel
    dem = DiscreteElementModel("R0-RQ1-RQ2")
    dem.set_parameter_values([0.3, 1.0, np.log(1e-3), 0.9, 0.5, np.log(1e-1), 0.85])
    tau = np.logspace(-5, 1, 60)
    g_tot = dem.predict_drt(tau)
    g_1 = dem.predict_element_drt(tau, "RQ1")
    g_2 = dem.predict_element_drt(tau, 2)
    assert np.allclose(g_tot, g_1 + g_2, atol=1e-12)
    f = np.logspace(5, -1, 21)
    z_r = dem.predict_element_z("R0", f)
    assert np.allclose(z_r, 0.3)
    z_tot = dem.predict_z(f)
    z_sum = sum(dem.predict_element_z(i, f) for i in range(dem.num_elements))
    assert np.allclose(z_tot, z_sum, atol=1e-12)
    assert dem.predict_r_tot() == pytest.approx(0.3 + 1.5)
    assert dem.num_elements == 3 and dem.num_parameters == 7
    # gamma-only vs (gamma, tau) return conventions
    g_only = dem.predict_distribution(tau)
    assert isinstance(g_only, np.ndarray) and g_only.shape == tau.shape
    g_auto, tau_auto = dem.predict_distribution()
    assert g_auto.shape == tau_auto.shape
    # setters validate lengths
    with pytest.raises(ValueError):
        dem.set_parameter_values([1.0])
    with pytest.raises(ValueError):
        dem.set_bounds([(0, 1)], element_name="RQ1")
    dem.set_bounds([(0, 10), (-20, 5), (0.5, 1.0)], element_name="RQ1")
    assert dem.parameter_bounds[2] == (-20, 5)


def test_hn_voltage_response():
    """HN unit-step voltage response V(t) = R x^a E^a_{b,ab+1}(-x), x=(t/tau)^b
    (via the Prabhakar Mittag-Leffler function; the reference leaves HN voltage
    unimplemented, elements.py:2102-2107). Checked three ways: RQ reduction at
    alpha=1, RC reduction at alpha=beta=1, and the DRT-convolution oracle
    V(t) = int gamma_HN(tau) (1 - exp(-t/tau)) dln tau."""
    from hybdrt_tpu.models.elements import (element_voltage_function,
                                            element_distribution_function)
    v_hn = element_voltage_function("HN")
    v_rq = element_voltage_function("RQ")
    v_rc = element_voltage_function("RC")
    times = np.concatenate([[-1e-3, 0.0], np.geomspace(1e-6, 1e2, 60)])
    r, ln_tau = 2.0, np.log(1e-2)

    # alpha = 1: HN reduces to RQ
    out_hn = np.asarray(v_hn(times, r, ln_tau, 1.0, 0.8))
    out_rq = np.asarray(v_rq(times, r, ln_tau, 0.8))
    assert np.allclose(out_hn, out_rq, rtol=1e-6, atol=1e-8)

    # alpha = beta = 1: HN reduces to RC
    out_hn1 = np.asarray(v_hn(times, r, ln_tau, 1.0, 1.0))
    out_rc = np.asarray(v_rc(times, r, ln_tau))
    assert np.allclose(out_hn1, out_rc, rtol=1e-5, atol=1e-7)

    # t <= 0 is identically zero; late times saturate at R
    assert np.all(out_hn[:2] == 0)
    assert abs(float(v_hn(1e6, r, ln_tau, 0.9, 0.8)) - r) < 1e-3 * r

    # Independent oracle: convolve the analytic HN distribution with the
    # single-RC step kernel over a wide fine ln tau grid
    alpha, beta = 0.85, 0.75
    gamma_hn = element_distribution_function("HN")
    tau_grid = np.geomspace(1e-12, 1e12, 4000)
    g = np.asarray(gamma_hn(tau_grid, r, ln_tau, alpha, beta))
    t_chk = np.geomspace(1e-5, 1e1, 25)
    kernel = 1 - np.exp(-t_chk[:, None] / tau_grid[None, :])
    v_oracle = np.trapezoid(g[None, :] * kernel, x=np.log(tau_grid), axis=1)
    v_ours = np.asarray(v_hn(t_chk, r, ln_tau, alpha, beta))
    assert np.allclose(v_ours, v_oracle, rtol=2e-3, atol=2e-3 * r)


def test_predict_response_hn_model():
    """Full-model step-superposed response with an HN element."""
    m = DiscreteElementModel("R0-HN1")
    m.set_parameter_values([0.3, 1.5, np.log(1e-2), 0.9, 0.85])
    times = np.linspace(-0.01, 0.5, 300)
    v = m.predict_response(times, [0.0, 0.2], [0.1, -0.05])
    from hybdrt_tpu.models.elements import element_voltage_function
    v_hn = element_voltage_function("HN")
    expected = np.zeros_like(times)
    for ts, ss in [(0.0, 0.1), (0.2, -0.05)]:
        dt = times - ts
        expected += ss * (np.where(dt > 0, 0.3, 0.0)
                          + np.asarray(v_hn(dt, 1.5, np.log(1e-2), 0.9, 0.85)))
    assert np.allclose(v, expected, rtol=1e-6, atol=1e-8)


def test_singularity_and_mass_surface():
    """Singularity detection + relaxation-mass prediction for delta-like
    elements (reference elements.py:512-541,1202,1682); total mass conserves
    Rp and the evaluation scorer's discretize path consumes it."""
    from hybdrt_tpu.models.elements import (
        DiscreteElementModel, element_distribution_integral_function)

    # RC is always singular; RQ with beta<1 is not
    m = DiscreteElementModel("R0-RC1-RQ2")
    m.set_parameter_values([0.3, 1.0, np.log(1e-3), 0.7, np.log(1e-1), 0.85])
    assert m.get_element_singular_status_list() == [False, True, False]
    assert m.is_singular
    info = m.singularity_info
    assert len(info) == 1
    assert info[0][0] == pytest.approx(1.0)
    assert info[0][1] == pytest.approx(1e-3)

    tau = np.logspace(-6, 2, 400)
    mass = m.predict_mass(tau)
    # Total mass = total polarization resistance (RC 1.0 + RQ 0.7)
    assert np.sum(mass) == pytest.approx(1.7, rel=0.02)
    # The RC delta's mass lands in the interval containing tau0
    k = np.searchsorted(tau, 1e-3)
    assert np.sum(mass[k - 1:k + 2]) > 0.99

    # Singular HN (beta=1, Davidson-Cole) closed form: monotone 0 -> r
    hn_int = element_distribution_integral_function("HN")
    cum = hn_int(tau, 1.0, np.log(1e-2), 0.6, 1.0)
    # Davidson-Cole has a power-law small-tau tail ~ exp(alpha*y)/alpha
    assert cum[0] < 0.01
    assert cum[-1] == pytest.approx(1.0, rel=1e-6)
    assert np.all(np.diff(cum) >= -1e-9)
    assert cum[np.searchsorted(tau, 1e-2)] == pytest.approx(1.0, rel=1e-3)

    # Scorer integration: process_model_instance uses predict_mass when
    # discretizing a singular model
    from hybdrt_tpu import evaluation as ev
    y_reg, peak_tau = ev.process_model_instance(m, tau, tau, discretize=True)
    assert np.sum(y_reg) == pytest.approx(1.7, rel=0.02)

    # evaluate_eis_residuals after a fit
    f = np.logspace(5, -1, 31)
    z = m.predict_z(f) + 1e-4
    m.fit_eis(f, z)
    resid = m.evaluate_eis_residuals()
    assert np.max(np.abs(resid)) < 1e-2
    assert m.plot_mass(tau=tau) is not None


def test_element_helpers_and_signal_scales():
    """element_has_distribution / parse_parameter_string (reference
    elements.py) and preprocessing.get_signal_scales."""
    from hybdrt_tpu.models.elements import (element_has_distribution,
                                            parse_parameter_string)
    from hybdrt_tpu import preprocessing as pp

    assert element_has_distribution("HN")
    assert not element_has_distribution("L")
    assert parse_parameter_string("lntau_HN2") == ("lntau", "HN2")

    t = np.arange(-0.01, 1.0, 1e-3)
    i_sig = np.where(t >= 0, 0.1, 0.0)
    v = 0.3 * i_sig + 0.05 * (1 - np.exp(-np.maximum(t, 0) / 0.01)) * (t >= 0)
    s_in, s_resp = pp.get_signal_scales(t, [0.0], [0.1], v, "ideal")
    assert np.isclose(s_in, 0.1)
    assert 0.04 < s_resp < 0.12
