"""Tests for the filters package and N-D assembly/QC."""
import numpy as np
import pytest
from scipy import ndimage

from hybdrt_tpu import filters as flt
from hybdrt_tpu.mapping import ndx, nddata


RNG = np.random.default_rng(3)


def test_rms_std_iqr_filters():
    a = RNG.normal(size=(40, 40))
    r = flt.rms_filter(a, 5)
    assert r.shape == a.shape and np.all(r >= 0)
    s = flt.std_filter(a, 5)
    assert np.all(s >= 0)
    # For iid normal data, local std should be near 1
    assert abs(np.median(s) - 1.0) < 0.3
    q = flt.iqr_filter(a, 5)
    assert np.all(q >= 0)


def test_empty_gaussian_excludes_center():
    a = np.zeros(21)
    a[10] = 1.0
    out = flt.empty_gaussian_filter1d(a, sigma=2)
    # Center pixel gets no self-contribution
    assert out[10] == 0
    assert out[9] > 0 and out[11] > 0
    # N-D version
    a2 = np.zeros((11, 11))
    a2[5, 5] = 1.0
    out2 = flt.empty_gaussian_filter(a2, sigma=1.5)
    # Sequential 1-D empty passes (reference semantics): the axis-aligned
    # cross through the impulse receives nothing, diagonals do
    assert out2[5, 5] == 0
    assert out2[5, 6] == 0 and out2[6, 5] == 0
    assert out2[6, 6] > 0 and out2[4, 6] > 0


def test_masked_filter_ignores_masked_values():
    a = np.ones((20, 20))
    a[5, 5] = 100.0  # masked-out junk
    mask = np.ones_like(a)
    mask[5, 5] = 0
    out = flt.masked_filter(a, mask, sigma=2)
    assert np.allclose(out[~np.isnan(out)], 1.0, atol=1e-10)


def test_iterative_gaussian_filter_rejects_outliers():
    x = np.linspace(0, 4 * np.pi, 200)
    clean = np.sin(x)
    noisy = clean + RNG.normal(size=200) * 0.02
    noisy[50] += 5.0  # gross outlier
    out = flt.iterative_gaussian_filter(noisy, sigma=2)
    plain = ndimage.gaussian_filter(noisy, sigma=2)
    # Iterative filter should be much closer to clean signal at the outlier
    assert abs(out[50] - clean[50]) < abs(plain[50] - clean[50]) / 3


def test_nonuniform_gaussian_filter1d():
    a = RNG.normal(size=100)
    sigma = np.linspace(0.1, 5, 100)
    out = flt.nonuniform_gaussian_filter1d(a, sigma)
    assert out.shape == a.shape
    # Large-sigma end should be much smoother than small-sigma end
    assert np.std(np.diff(out[80:])) < np.std(np.diff(out[:20]))
    # Zero sigma returns original
    assert np.allclose(flt.nonuniform_gaussian_filter1d(a, np.zeros(100)), a)


def test_hysteresis_thresholds():
    a = np.zeros(30)
    a[5:10] = [0.3, 0.6, 1.5, 0.6, 0.3]   # crosses high
    a[20:23] = [0.3, 0.6, 0.3]            # low only
    out = flt.flexible_hysteresis_threshold(a, 0.2, 1.0)
    assert out[5:10].all()
    assert not out[20:23].any()
    # Signed version: negative feature
    b = a - 2 * a[::-1]
    out_s = flt.signed_hysteresis_threshold(b, 0.2, 1.0)
    assert out_s.dtype == bool


def test_assemble_ndx_grid():
    # 2-D psi grid: 3 temperatures x 4 biases, 5 tau points
    temps = np.repeat([700, 750, 800], 4)
    biases = np.tile([0.0, 0.1, 0.2, 0.3], 3)
    psi = np.stack([temps, biases], axis=1)
    x = RNG.normal(size=(12, 5))
    dims, ndx_arr = ndx.assemble_ndx(x, psi, ["T", "V"], tau=np.arange(5),
                                     group_by=["T"], sort_by=["V"])
    assert ndx_arr.shape == (3, 4, 5)
    # Values preserved
    assert np.allclose(ndx_arr[0, 0], x[0])
    assert np.allclose(ndx_arr[2, 3], x[11])


def test_assemble_ndx_missing_points():
    temps = np.array([700, 700, 750])
    biases = np.array([0.0, 0.1, 0.0])
    psi = np.stack([temps, biases], axis=1)
    x = RNG.normal(size=(3, 4))
    dims, arr = ndx.assemble_ndx(x, psi, ["T", "V"], tau=np.arange(4),
                                 group_by=["T"], sort_by=["V"],
                                 sort_dim_grids=[np.array([0.0, 0.1])])
    assert arr.shape == (2, 2, 4)
    assert np.isnan(arr[1, 1]).all()  # (750, 0.1) not measured


def test_filter_ndx_smooths_and_preserves_nans():
    arr = RNG.normal(size=(6, 6, 8)) * 0.1 + np.arange(8)
    arr[2, 3] = np.nan
    out = ndx.filter_ndx(arr, num_group_dims=2, sigma=(1, 1, 0), iterative=False)
    assert np.isnan(out[2, 3]).all()
    valid = ~np.isnan(arr)
    assert np.nanstd(out[valid] - np.arange(8)[None, :].repeat(36, 0).reshape(6, 6, 8)[valid]) \
        < np.nanstd(arr[valid] - np.arange(8)[None, :].repeat(36, 0).reshape(6, 6, 8)[valid])


def test_flag_outliers_and_bad_obs():
    arr = np.tile(np.sin(np.linspace(0, np.pi, 20)), (10, 1))
    arr = arr + RNG.normal(size=arr.shape) * 0.01
    arr[4, 10] += 3.0
    flags = nddata.flag_outliers(arr, filter_size=(3, 5), thresh=0.5)
    assert flags[4, 10]
    assert flags.sum() < 5

    x_filt = ndimage.gaussian_filter(arr, (1, 0))
    bad_arr = arr.copy()
    bad_arr[7] += RNG.normal(size=20) * 2.0  # whole observation corrupted
    # Reference threshold semantics (rss >= thresh, not thresh^2): the
    # corrupted row is flagged at moderate thresholds, and a higher
    # threshold separates it cleanly from the noise rows
    bad = nddata.flag_bad_obs(bad_arr, x_filt, std_size=(3, 5), thresh=3)
    assert bad[7]
    bad_hi = nddata.flag_bad_obs(bad_arr, x_filt, std_size=(3, 5), thresh=8)
    assert bad_hi[7] and bad_hi.sum() <= 2


def test_cr_filter_smooths_noise():
    """Curvature-regularizing filter (filters/curvreg.py): removes noise while
    preserving a smooth (zero-Gaussian-curvature) ramp."""
    from hybdrt_tpu.filters import curvreg
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 24)
    ramp = x[:, None] + 0.5 * x[None, :]          # planar: GC = MC-free ramp
    noisy = ramp + rng.normal(0, 0.05, ramp.shape)
    # The min-|projection| update is conservative: gc reduces noise modestly,
    # mc (minimal-surface target) substantially
    bounds = {"gc": 0.95, "mc": 0.7}
    for ct in ("gc", "mc"):
        out = curvreg.cr_filter(noisy, n_iter=30, curv_type=ct)
        assert out.shape == ramp.shape
        err_in = np.std(noisy - ramp)
        err_out = np.std(out - ramp)
        assert err_out < bounds[ct] * err_in
    # A plane is a fixed point (projection distances ~ 0)
    flat = curvreg.cr_filter(ramp, n_iter=10, curv_type="gc")
    assert np.allclose(flat, ramp, atol=1e-8)
    # Invalid options raise
    import pytest
    with pytest.raises(ValueError):
        curvreg.cr_filter(noisy, curv_type="bogus")
    with pytest.raises(ValueError):
        curvreg.cr_filter(noisy, mode="bogus")
