"""Tests: multi-spectrum co-fit, PFRT-discrete models, profiling, md utils."""
import numpy as np
import pytest

from hybdrt_tpu.models.elements import DiscreteElementModel
from hybdrt_tpu import profiling
from hybdrt_tpu.utils import md


def test_fit_eis_multi_tracks_drift():
    rng = np.random.default_rng(0)
    freq = np.logspace(4, 0, 31)
    b = 6
    rs = 1.0 + 0.1 * np.arange(b)
    taus = np.log(1e-2) + 0.1 * np.arange(b)
    z_list = [0.4 + rs[i] / (1 + (2j * np.pi * freq * np.exp(taus[i])) ** 0.9)
              + (rng.normal(size=31) + 1j * rng.normal(size=31)) * 0.002
              for i in range(b)]
    m = DiscreteElementModel("R0-RQ1")
    m.parameter_values = np.array([0.5, 1.0, np.log(1e-2), 0.9])
    m.fit_eis_multi(freq, z_list, similarity_strength=1.0)
    pv = m.parameter_values_multi
    assert pv.shape == (b, 4)
    assert np.max(np.abs(pv[:, 1] - rs)) < 0.02
    assert np.max(np.abs(pv[:, 2] - taus)) < 0.02
    # Smoothness: co-fit parameters vary monotonically
    assert np.all(np.diff(pv[:, 1]) > 0)


def test_timer_and_block_time():
    import jax.numpy as jnp
    timer = profiling.Timer()
    with timer.section("outer"):
        with timer.section("inner"):
            _ = jnp.ones(10).sum()
    summary = timer.summary()
    assert "outer" in summary and "outer/inner" in summary
    assert summary["outer"]["total"] >= summary["outer/inner"]["total"]
    out, t = profiling.block_and_time(lambda x: x * 2, jnp.ones(4), repeats=2)
    assert t >= 0


def test_md_utils_roundtrip():
    vecs = [np.arange(3.0), np.arange(5.0), np.arange(2.0)]
    v, starts = md.concatenate_vectors(vecs)
    back = md.split_vector(v, starts)
    for a, b in zip(vecs, back):
        assert np.allclose(a, b)
    arr, mask = md.pad_vectors(vecs)
    assert arr.shape == (3, 5)
    assert mask.sum() == 10


def test_series_neg_fit():
    """series_neg: stacked nonneg pos/neg coefficient sets recover a series
    negative feature (reference drt1d.py:152-153,359-360,2963-2991)."""
    import pytest
    from hybdrt_tpu import DRT
    rng = np.random.default_rng(1)
    f = np.logspace(5, -1, 41)
    w = 2j * np.pi * f
    z = 0.3 + 1.5 / (1 + (w * 1e-3) ** 0.9) - 0.5 / (1 + (w * 1e0) ** 0.9)
    z = z + rng.normal(0, 5e-4, 41) + 1j * rng.normal(0, 5e-4, 41)

    drt = DRT(warn=False)
    drt.fit_eis(f, z, nonneg=True, series_neg=True)
    tau = np.logspace(-6, 2, 100)
    g_pos = drt.predict_distribution(tau, sign=1)
    g_neg = drt.predict_distribution(tau, sign=-1)
    g_tot = drt.predict_distribution(tau, sign=0)
    # Signed components land at the true time constants
    assert abs(np.log10(tau[np.argmax(g_pos)]) - (-3)) < 0.5
    assert abs(np.log10(tau[np.argmin(g_neg)]) - 0.0) < 0.5
    assert np.all(g_pos >= -1e-10) and np.all(g_neg <= 1e-10)
    assert np.allclose(g_tot, g_pos + g_neg, atol=1e-10)
    # Net Rp = 1.5 - 0.5; ohmic recovered; data reproduced
    assert abs(drt.predict_r_p() - 1.0) < 0.1
    assert abs(drt.fit_parameters["R_inf"] - 0.3) < 0.02
    zh = drt.predict_z(f)
    assert np.linalg.norm(zh - z) / np.linalg.norm(z) < 0.01
    # series_neg requires nonneg (reference drt1d.py:152-153)
    with pytest.raises(ValueError):
        DRT(warn=False).fit_eis(f, z, nonneg=False, series_neg=True)
