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
