"""DCT (capacitive-system DRT) and sequential fitting
(reference hybdrt/models/dct.py, sequential.py)."""
import numpy as np
import pytest

from hybdrt_tpu.models.dct import DCT, invert_mat, should_invert
from hybdrt_tpu.models import sequential
from hybdrt_tpu import DRT


def test_invert_mat_helpers():
    m = np.array([[1.0, 2.0], [0.5, 3.0]])
    assert should_invert(m)
    out = invert_mat(m)
    assert np.allclose(out, -m)
    assert not should_invert(out)
    assert invert_mat(None) is None


def test_dct_fit_recovers_capacitive_feature():
    """A DCT fit on sign-inverted relaxation data recovers positive
    coefficients, and predictions match the data."""
    rng = np.random.default_rng(0)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    # Capacitive-branch spectrum: inverted ZARC relaxation
    z = 0.4 - 1.5 / (1 + (w * 1e-2) ** 0.9)
    z = z + rng.normal(0, 1e-3, 41) + 1j * rng.normal(0, 1e-3, 41)
    dct = DCT(warn=False)
    dct.fit_eis(f, z, scale_data=False)
    # Coefficients positive (nonneg), representing the inverted feature
    assert dct.predict_r_p() > 1.3
    # Peak at the true time constant
    tau = np.logspace(-5, 1, 200)
    gamma = dct.predict_distribution(tau)
    assert abs(np.log10(tau[np.argmax(gamma)]) - (-2)) < 0.4
    # Prediction consistency: z_hat matches the inverted data
    z_hat = dct.predict_z(f)
    assert np.linalg.norm(z_hat - z) / np.linalg.norm(z) < 0.02
    assert abs(dct.fit_parameters["R_inf"] - 0.4) < 0.05


def test_sequential_fit_segments():
    """Two sequential current steps: the second fit sees the first segment's
    relaxation subtracted and still recovers the element."""
    rng = np.random.default_rng(1)
    tau0, r0, rinf = 1e-2, 1.0, 0.3

    def seg(t0, amp):
        t_pre = np.linspace(t0 - 0.005, t0 - 0.0005, 8)
        t_post = t0 + np.logspace(-5, 0, 80)
        times = np.concatenate([t_pre, t_post])
        return times

    # Segment 1: step at t=0, amp 0.1; segment 2: step at t=2, amp 0.05
    t1 = seg(0.0, 0.1)
    i1 = np.where(t1 >= 0, 0.1, 0.0)
    v1 = rinf * i1 + 0.1 * r0 * (1 - np.exp(-np.maximum(t1, 0) / tau0)) * (t1 >= 0)
    v1 += rng.normal(0, 2e-4, len(t1))

    t2 = seg(2.0, 0.05)
    i2 = np.where(t2 >= 2.0, 0.15, 0.1)  # total current after second step
    # response = first step's (still relaxed) contribution + second step's
    v2 = rinf * i2 + 0.1 * r0 * (1 - np.exp(-np.maximum(t2, 0) / tau0)) \
        + 0.05 * r0 * (1 - np.exp(-np.maximum(t2 - 2.0, 0) / tau0)) * (t2 >= 2.0)
    v2 += rng.normal(0, 2e-4, len(t2))

    fits = sequential.fit_sequence(
        [((t1, i1, v1), None), ((t2, i2, v2), None)],
        drt_kw={"warn": False})
    assert len(fits) == 2
    for fit in fits:
        assert abs(fit.predict_r_p() - r0) < 0.25
