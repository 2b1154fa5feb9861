"""Bounded tuple-form path tracing and quantification
(reference mapping/path.py:13-860)."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

from hybdrt_tpu.mapping import path as pth


def _ridge_prob_map(n_rows=24, n_cols=60, centers=(15, 40), drift=(0.3, -0.2),
                    width=2.0, amp=(1.0, 1.0)):
    """Synthetic (psi, tau) ridge-probability map with drifting ridges."""
    cols = np.arange(n_cols)
    prob = np.zeros((n_rows, n_cols))
    for c0, d, a in zip(centers, drift, list(amp) + [1.0] * len(centers)):
        for i in range(n_rows):
            prob[i] += a * np.exp(-0.5 * ((cols - (c0 + d * i)) / width) ** 2)
    return np.clip(prob, 1e-8, 1 - 1e-8)


def test_find_path_2d_tracks_ridge_and_terminates():
    prob = _ridge_prob_map(centers=(20,), drift=(0.5,))
    energy = pth.energy_from_prob(prob)
    (rows, cols), cost = pth.find_path_2d(energy, (0, 20), 23)
    assert rows.tolist() == list(range(24))
    # follows the drifting ridge center within 2 columns
    assert np.all(np.abs(cols - (20 + 0.5 * rows)) <= 2)
    assert np.isfinite(cost)

    # max_energy terminates the path where probability collapses
    prob2 = prob.copy()
    prob2[12:] = 1e-8
    (rows2, cols2), _ = pth.find_path_2d(pth.energy_from_prob(prob2), (0, 20),
                                         23, max_energy=5.0)
    assert rows2[-1] < 23


def test_bounded_paths_masks_and_wells():
    prob = _ridge_prob_map()
    paths, costs = pth.find_bounded_paths_2d(prob, [0], [23], height=0.3)
    assert len(paths) == 2
    mask = pth.tuple_paths_to_mask(prob.shape, paths)
    assert mask.sum() == 2 * 24
    labels = pth.tuple_paths_to_mask(prob.shape, paths, increment_labels=True)
    assert set(np.unique(labels)) == {0, 1, 2}

    well = pth.path_energy_well(mask, pth.energy_from_prob(prob))
    assert well.shape == prob.shape
    assert well[mask].all()          # wells contain their paths
    assert well.sum() > mask.sum()   # and extend beyond them


def test_missing_peaks_and_paths():
    prob = _ridge_prob_map(centers=(12, 30, 48), drift=(0.0, 0.0, 0.0))
    # Trace only the first two ridges
    paths = [(np.arange(24), np.full(24, 12)), (np.arange(24), np.full(24, 30))]
    missing = pth.find_missing_peaks(prob, paths=paths, height=0.3)
    rows, cols = np.where(missing)
    assert len(rows) > 0
    assert np.all(np.abs(cols - 48) <= 2)  # only the untraced ridge flagged

    new_paths, new_costs = pth.find_missing_paths(prob, missing,
                                                  grad_strength=0)
    assert len(new_paths) == 1
    rows_n, cols_n = new_paths[0]
    assert len(rows_n) == 24
    assert np.all(np.abs(cols_n - 48) <= 2)


def test_bounding_troughs_and_integration_conserves_mass():
    tau = np.logspace(-4, 0, 60)
    prob = _ridge_prob_map(centers=(15, 40), drift=(0.0, 0.0))
    f = 0.8 * prob  # use the ridge field itself as the distribution map
    paths, _ = pth.find_bounded_paths_2d(prob, [0], [23], height=0.3,
                                         grad_strength=0)
    trough_mask = np.zeros_like(prob, dtype=bool)
    trough_mask[:, 27] = True  # single trough between the ridges
    troughs = [pth.find_bounding_troughs(trough_mask, p) for p in paths]
    # Bounding columns bracket each path
    for (rows, cols), (left, right) in zip(paths, troughs):
        assert np.all(left <= cols) and np.all(cols <= right)

    path_dist, path_sizes = pth.integrate_paths(tau, f, paths,
                                                troughs=troughs)
    assert path_dist.shape == (2, *f.shape)
    # Mass conservation where weights are nonzero
    covered = np.sum(path_dist, axis=0)
    assert np.all(covered <= f + 1e-12)
    total = np.trapezoid(f, x=np.log(tau), axis=-1)
    assert np.allclose(np.sum(path_sizes, axis=0), total, rtol=0.05)
    # Each path captures roughly its own ridge's mass (equal here)
    assert np.allclose(path_sizes[0], path_sizes[1], rtol=0.2)

    # Fixed-width variant
    _, sizes_w = pth.integrate_paths(tau, f, paths, widths=8.0)
    assert np.allclose(np.sum(sizes_w, axis=0), total, rtol=0.05)


def test_path_tau_clip_compare_merge():
    tau = np.logspace(-4, 0, 60)
    p1 = (np.arange(24), np.full(24, 15))
    p2 = (np.arange(24), np.full(24, 16))
    p3 = (np.arange(10, 24), np.full(14, 40))

    pt = pth.get_path_tau(tau, [p1, p3], shape=(24, 60))
    assert pt.shape == (2, 24)
    assert np.isnan(pt[1, :10]).all() and np.isfinite(pt[1, 10:]).all()

    rows_c, cols_c = pth.clip_path(p1, (5, 10))
    assert rows_c.tolist() == list(range(5, 11))

    corr, rss = pth.compare_paths([p1], [p2, p3])
    assert rss[0, 0] == pytest.approx(1.0)
    assert rss[0, 1] > 100

    merged, labels = pth.merge_paths([p1], [p2, p3], rss_thresh=2.0)
    assert len(merged) == 2  # p1+p2 merged, p3 passes through
    merged_cols = merged[labels[0][0]][1]
    assert np.all((merged_cols == 15) | (merged_cols == 16))


def test_coherent_3d_path():
    # 3 slices; ridge center shifts by +2 per slice (slope 2/3 per slice
    # index) and drifts +0.5/row within each slice
    n_slices, n_rows, n_cols = 3, 20, 60
    prob = np.stack([_ridge_prob_map(n_rows, n_cols, centers=(20 + 2 * s,),
                                     drift=(0.5,)) for s in range(n_slices)])
    lines = pth.find_starting_lines_3d(prob, 0, max_slope=3, height=0.3)
    assert len(lines) == 1
    assert np.all(np.abs(lines[0] - np.array([20, 22, 24])) <= 1)

    energy = pth.energy_from_prob(prob)
    (rows, cols), cost = pth.find_path_3d(energy, 0, lines[0], n_rows - 1,
                                          grad_strength=0)
    assert cols.shape == (n_slices, n_rows)
    for s in range(n_slices):
        assert np.all(np.abs(cols[s] - (20 + 2 * s + 0.5 * rows)) <= 3)

    paths, costs = pth.find_bounded_paths_3d(prob, 0, n_rows - 1, height=0.3,
                                             grad_strength=0)
    assert len(paths) == 1

    mask3 = pth.tuple_paths_to_mask(prob.shape, paths)
    assert mask3.sum() == n_slices * n_rows


def test_make_ridge_path_mask_and_plot():
    prob = _ridge_prob_map()
    mask = pth.make_ridge_path_mask(prob, [0], [23], height=0.3)
    assert mask.shape == prob.shape and mask.sum() == 2 * 24
    # grouped (extra leading dim)
    mask_g = pth.make_ridge_path_mask(prob[None], [0], [23], height=0.3)
    assert np.array_equal(mask_g[0], mask)

    paths, _ = pth.find_bounded_paths_2d(prob, [0], [23], height=0.3)
    trough_mask = np.zeros_like(prob, dtype=bool)
    trough_mask[:, 27] = True
    troughs = [pth.find_bounding_troughs(trough_mask, p) for p in paths]
    ax = pth.plot_paths_and_troughs(paths, troughs, prob.shape)
    assert ax is not None
