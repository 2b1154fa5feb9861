"""Tests for mapping postprocessing: surfaces, flow, paths, segmentation,
extrema, sheets."""
import numpy as np
import pytest

from hybdrt_tpu.mapping import surface, flow, path, segmentation, extrema, sheet


RNG = np.random.default_rng(2)


def _moving_peak_image(n_rows=20, n_cols=60, start=15, slope=1.0, width=3.0):
    img = np.zeros((n_rows, n_cols))
    cols = np.arange(n_cols)
    centers = start + slope * np.arange(n_rows)
    for i, c in enumerate(centers):
        img[i] = np.exp(-0.5 * ((cols - c) / width) ** 2)
    return img, centers


def test_find_ridges_2d_tracks_moving_peak():
    img, centers = _moving_peak_image()
    mask = surface.find_ridges_2d(img, height=0.5)
    found = np.argmax(mask, axis=1)
    assert np.max(np.abs(found - centers)) <= 1


def test_troughs_between_ridges():
    img1, c1 = _moving_peak_image(start=10, slope=0.5)
    img2, c2 = _moving_peak_image(start=40, slope=-0.5)
    img = img1 + img2
    mask = surface.find_ridges_2d(img, height=0.3)
    p_trough = 1 - img
    troughs = surface.find_troughs_2d(mask, img, p_trough)
    # One trough per row, between the two ridges
    for i in range(img.shape[0]):
        t = np.where(troughs[i])[0]
        assert len(t) == 1
        lo, hi = sorted([c1[i], c2[i]])
        assert lo < t[0] < hi


def test_partial_flow_recovers_shift():
    img, _ = _moving_peak_image(slope=0.0, start=30)
    shifted = np.roll(img, 3, axis=1)
    fl = flow.partial_flow_ilk(shifted, img, flow_axes=(-1,), radius=8)
    # In the peak region, flow should be ~ -3 (img needs +3 shift -> sample at x-3)
    core = img > 0.3
    assert abs(np.median(fl[0][core]) + 3) < 1.0


def test_warp_roundtrip():
    img, _ = _moving_peak_image(slope=0.5)
    fl = np.full((1, *img.shape), 2.0)
    warped = flow.warp_image(img, fl)
    # warp by +2 shifts content left by 2 (sampling at x+2)
    assert np.allclose(warped[:, :-2], img[:, 2:], atol=1e-8)


def test_align_to_reference():
    base, _ = _moving_peak_image(n_rows=1, start=30, slope=0)
    frames = np.stack([np.roll(base[0], s) for s in (0, 2, 4)])
    frames = np.tile(frames[:, None, :], (1, 8, 1))  # (3 frames, 8 rows, 60 cols)
    aligned, flows = flow.align_to_reference(frames, ref_index=0, radius=8)
    # After alignment, all frames should match frame 0 in the peak region
    core = frames[0] > 0.3
    for i in (1, 2):
        assert np.median(np.abs(aligned[i][core] - frames[0][core])) < 0.12


def test_trace_path_follows_valley():
    img, centers = _moving_peak_image(slope=0.8)
    energy = -img  # valley along the peak
    p = path.trace_path_2d(energy, start_col=15, start_row=0, max_step=2)
    assert np.max(np.abs(p - centers)) <= 2
    paths = path.find_paths_2d(energy, start_kw={"height": 0.5})
    assert len(paths) >= 1
    mask = path.paths_to_mask(paths, img.shape)
    assert mask.sum() == img.shape[0] * len(paths)
    rec = path.mask_to_paths(mask)
    assert len(rec) == len(paths)


def test_mc_anneal_separates_clusters():
    pts1 = RNG.normal(size=(30, 2)) + [0, 0]
    pts2 = RNG.normal(size=(30, 2)) + [8, 8]
    points = np.vstack([pts1, pts2])
    labels, centers = segmentation.mc_anneal(points, 2, n_iter=3000, rng=0)
    # Points in each true cluster should share a label
    first = labels[:30]
    second = labels[30:]
    purity = max(np.mean(first == first[0]), 1 - np.mean(first == first[0]))
    purity2 = max(np.mean(second == second[0]), 1 - np.mean(second == second[0]))
    assert purity > 0.9 and purity2 > 0.9
    assert first[0] != second[np.argmax(np.bincount(second))] or purity2 > 0.9


def test_optimize_extrema_enforces_alternation():
    ridge = np.zeros((1, 20), dtype=bool)
    trough = np.zeros((1, 20), dtype=bool)
    ridge[0, [3, 10]] = True   # two ridges with no trough between
    trough[0, [16]] = True
    r2, t2 = extrema.optimize_extrema(ridge, trough)
    assert extrema.alternation_energy(r2, t2) == 0
    # The repulsion energy resolves the double-ridge window: either a
    # trough is inserted between them or the crowded window is thinned
    assert t2[0, 4:10].any() or r2[0].sum() < 2


def test_optimize_extrema_keeps_probable_ridge():
    """A high-probability ridge pair with an empty trough window between
    them is repaired by trough insertion, not ridge removal (the log-odds
    term makes removal expensive; reference extrema.py:92-137)."""
    ridge = np.zeros((1, 20), dtype=bool)
    trough = np.zeros((1, 20), dtype=bool)
    ridge[0, [3, 10]] = True
    trough[0, [16]] = True
    rp = np.full(ridge.shape, 0.01)
    rp[0, [3, 10]] = 0.999
    tp = np.full(trough.shape, 0.5)
    tp[0, 16] = 0.999
    tp[0, 6] = 0.9   # most probable trough site between the ridges
    r2, t2 = extrema.optimize_extrema(ridge, trough, rp, tp, lp_scale=60.0)
    assert extrema.alternation_energy(r2, t2) == 0
    assert r2[0, 3] and r2[0, 10]
    assert t2[0, 6]


def test_sheet_fit_roundtrip():
    coords = RNG.uniform(0, 1, size=(50, 2))
    values = np.sin(2 * np.pi * coords[:, 0]) + coords[:, 1]
    coef, centers = sheet.fit_sheet(coords, values, epsilon=2.0, ridge=1e-10)
    pred = sheet.evaluate_sheet(coords, coef, centers, epsilon=2.0)
    assert np.max(np.abs(pred - values)) < 1e-2


def test_surface_find_troughs_and_integrate_ridges():
    """Grouped trough finding + per-ridge area integration
    (reference surface.py find_troughs/integrate_ridges)."""
    from hybdrt_tpu.mapping import surface as sf

    tau = np.logspace(-4, 0, 60)
    x_grid = np.log(tau)
    # Two gaussian ridges per row, drifting with the row index
    n_rows = 6
    f = np.stack([np.exp(-0.5 * ((x_grid + 3.2 + 0.05 * i) / 0.3) ** 2)
                  + 0.6 * np.exp(-0.5 * ((x_grid + 1.0 - 0.05 * i) / 0.3) ** 2)
                  for i in range(n_rows)])
    ridge_mask = np.zeros_like(f, dtype=bool)
    for i in range(n_rows):
        for mu in (-3.2 - 0.05 * i, -1.0 + 0.05 * i):
            ridge_mask[i, np.argmin(np.abs(x_grid - mu))] = True
    p_trough = 1 - f / f.max()

    troughs = sf.find_troughs(ridge_mask, f, p_trough)
    assert troughs.shape == f.shape
    # exactly one trough between the two ridges per row
    assert np.all(troughs.sum(axis=1) == 1)
    for i in range(n_rows):
        r = np.where(ridge_mask[i])[0]
        t = np.where(troughs[i])[0][0]
        assert r[0] < t < r[1]

    area = sf.integrate_ridges(f, ridge_mask, troughs, tau=tau)
    assert area.shape == f.shape
    # mass only at ridge indices; totals match the distribution mass
    assert np.all((area > 0) == ridge_mask)
    # grouped form matches the flat 2-D form
    area_g = sf.integrate_ridges(f[None], ridge_mask[None], troughs[None],
                                 num_group_dims=1, tau=tau)
    assert np.allclose(area_g[0], area)


def test_flow_full_dim_warp_sum_blend():
    """Full-dimensional warp / warp_flow / sum_flows / blend_frames
    (reference flow.py)."""
    from hybdrt_tpu.mapping import flow as fl

    rng = np.random.default_rng(0)
    img = np.zeros((16, 16))
    img[6:10, 6:10] = 1.0
    # Constant shift by (0, 2): flow is an inverse coordinate map
    flow = np.zeros((2, 16, 16))
    flow[1] = 2.0
    warped = fl.warp(img, flow)
    assert np.allclose(warped[6:10, 8:12], img[6:10, 6:10] * 0 + warped[6:10, 8:12])
    # mass moved right by 2 columns
    assert warped[7, 4] == pytest.approx(1.0)

    # summing a flow with its reverse ~ identity
    total = fl.sum_flows([flow, fl.reverse_flow_full(flow)])
    assert np.max(np.abs(total)) < 0.3

    frames = fl.blend_frames(img, np.roll(img, 2, axis=1), sigma=1.0, num=2)
    assert frames.shape == (4, 16, 16)
    assert np.allclose(frames[0], img)
    # intermediate frames carry intermediate mass positions
    assert frames[1:3].max() > 0.3


def test_array_and_stats_parity_helpers():
    """weighted_quantile_2d / row_match_index / apply_along_axis_multi /
    inctrapz / beta-dirichlet pdfs / outer_cdf_chi2
    (reference utils/array.py, utils/stats.py)."""
    from hybdrt_tpu.utils import array as ua
    from hybdrt_tpu.utils import stats as us

    rng = np.random.default_rng(1)
    vals = rng.normal(size=(500, 3))
    q = ua.weighted_quantile_2d(vals, [0.025, 0.5, 0.975])
    assert q.shape == (3, 3)
    assert np.allclose(q[1], np.median(vals, axis=0), atol=0.1)
    # Uniform weights ~ plain quantiles
    q2 = ua.weighted_quantile_2d(vals, [0.5], np.ones(500))
    assert np.allclose(q[1], q2[0], atol=1e-9)

    a = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    b = np.array([[3.0, 4.0], [9.9, 9.9], [1.0, 2.0]])
    assert ua.row_match_index(a, b).tolist() == [1, -1, 0]

    arrs = [np.arange(12).reshape(3, 4), np.ones((3, 4))]
    out = ua.apply_along_axis_multi(lambda xs: np.sum(xs[0] * xs[1]), 1, arrs)
    assert np.allclose(out, np.arange(12).reshape(3, 4).sum(axis=1))

    ct = ua.inctrapz(np.ones(5), x=np.arange(5.0))
    assert np.allclose(ct, [0, 1, 2, 3, 4])

    x = np.linspace(0.01, 0.99, 50)
    p = us.pdf_beta(x, 2.0, 3.0)
    assert np.trapezoid(p, x) == pytest.approx(1.0, abs=0.01)
    assert np.allclose(np.log(p), us.log_pdf_beta(x, 2.0, 3.0))
    assert us.pdf_dirichlet(np.array([0.3, 0.7]), np.array([1.0, 1.0])) \
        == pytest.approx(1.0)
    assert us.outer_cdf_chi2(0.0, 1.0, 2) == pytest.approx(1.0)
    assert us.outer_cdf_chi2(1e6, 1.0, 2) == pytest.approx(0.0, abs=1e-12)


def test_flow_1d_axis_variants():
    """solve_flow_field_1d / align_to_reference_1d over an arbitrary
    velocity axis (reference flow.py)."""
    from hybdrt_tpu.mapping import flow as fl

    # (tau, frame) layout: velocity axis is 1, features shift along axis 0
    n_tau, n_frames = 64, 4
    x_grid = np.arange(n_tau)
    stack = np.stack([np.exp(-0.5 * ((x_grid - 25 - 3 * k) / 4.0) ** 2)
                      for k in range(n_frames)], axis=1)
    flows = fl.solve_flow_field_1d(stack, velocity_axis=1, flow_axes=(0,),
                                   radius=[7, 0])
    assert flows.shape[0] == n_frames - 1
    aligned = fl.align_to_reference_1d(stack, flows, velocity_axis=1,
                                       flow_axes=(0,), reference_index=0)
    assert aligned.shape == stack.shape
    # After alignment every frame's peak sits near the reference peak
    peaks = np.argmax(aligned, axis=0)
    assert np.all(np.abs(peaks - 25) <= 2)


def test_ridge_prob_pipeline_and_smooth_paths():
    """End-to-end ridge_prob (peak-minus-trough + ndx filter + signed
    hysteresis) and tuple-aware smooth_paths (reference surface.py:403,
    path.py:474)."""
    from hybdrt_tpu.mapping import surface as sf
    from hybdrt_tpu.mapping import path as pth

    x_grid = np.linspace(-3, 3, 80)
    f = np.stack([np.exp(-0.5 * ((x_grid - 0.5 * np.sin(k / 3)) / 0.4) ** 2)
                  for k in range(12)])
    fx = np.gradient(f, axis=1)
    fxx = np.gradient(fx, axis=1)
    rp = sf.ridge_prob(f, fx, fxx, num_group_dims=0)
    assert rp.shape == f.shape
    assert np.max(rp) > 0.5
    # Ridge probability concentrates at the moving peak
    cols = np.argmax(rp, axis=1)
    truth = np.array([np.argmin(np.abs(x_grid - 0.5 * np.sin(k / 3)))
                      for k in range(12)])
    assert np.all(np.abs(cols - truth) <= 3)

    sm = pth.smooth_paths([(np.arange(5), np.array([1, 2, 5, 2, 1]))], 1.0)
    assert sm[0][1][2] < 5  # spike attenuated
    assert pth.paths_to_mask_3d is pth.tuple_paths_to_mask


def test_bidirectional_flow_recovers_shift():
    """Review regression: bidirectional_flow averages the forward and
    reversed-backward estimates with a PLUS sign (a minus cancels them)."""
    from hybdrt_tpu.mapping import flow as fl
    x_grid = np.arange(96, dtype=float)
    img_a = np.exp(-0.5 * ((x_grid - 40) / 4.0) ** 2)[None, :].repeat(4, 0)
    img_b = np.exp(-0.5 * ((x_grid - 43) / 4.0) ** 2)[None, :].repeat(4, 0)
    flow_bi = fl.bidirectional_flow(img_b, img_a)
    flow_fwd = fl.partial_flow_ilk(img_b, img_a)
    core = np.abs(x_grid - 41.5) < 6
    assert np.median(flow_bi[0][:, core]) == pytest.approx(
        np.median(flow_fwd[0][:, core]), abs=0.5)
    assert abs(np.median(flow_bi[0][:, core])) > 1.5  # not cancelled to ~0


def test_zero_peaks_weight_decomposition_empty():
    """Review regression: no peaks -> empty weight set, not a phantom
    all-ones peak."""
    from hybdrt_tpu import peaks as pk
    tau = np.logspace(-4, 0, 50)
    w = pk.estimate_peak_weight_distributions(tau, np.zeros(50), np.zeros(50),
                                              np.array([], dtype=int), tau)
    assert w.shape == (0, 50)


def test_find_troughs_sign_change_at_zero_crossing():
    """Opposite-sign ridges place the trough at f's zero crossing, not at
    the max trough probability (reference surface.py:54-80)."""
    from hybdrt_tpu.mapping import surface as sf
    x_grid = np.linspace(-3, 3, 61)
    f = (np.exp(-0.5 * ((x_grid + 1.5) / 0.4) ** 2)
         - np.exp(-0.5 * ((x_grid - 1.5) / 0.4) ** 2))
    ridge_mask = np.zeros(61, dtype=bool)
    ridge_mask[np.argmin(np.abs(x_grid + 1.5))] = True
    ridge_mask[np.argmin(np.abs(x_grid - 1.5))] = True
    # Adversarial p_trough: maximal far from the crossing
    p_trough = np.exp(-0.5 * ((x_grid + 1.0) / 0.2) ** 2)
    troughs = sf.find_troughs_1d(ridge_mask, f, p_trough)
    t_idx = np.where(troughs)[0]
    assert len(t_idx) == 1
    assert abs(x_grid[t_idx[0]]) < 0.2  # at the zero crossing


def test_partial_flow_blended_beats_plain_ilk():
    """Blended partial flow (reference flow.py:93-216): for a ridge drift
    well beyond the ILK window's capture range, intermediate-frame blending
    with momentum recovers substantially more of the displacement than
    plain ILK on the same noisy map."""
    rng = np.random.default_rng(0)
    x = np.arange(120, dtype=float)
    disp = 12.0
    ridge = lambda c: np.exp(-0.5 * ((x - c) / 3.0) ** 2)
    ref2d = np.tile(ridge(45), (10, 1))
    mov2d = np.tile(ridge(45 + disp), (10, 1))
    ref_n = ref2d + rng.normal(0, 0.05, ref2d.shape)
    mov_n = mov2d + rng.normal(0, 0.05, mov2d.shape)
    core = ref2d > 0.1

    def flow_rmse(fl):
        return np.sqrt(np.mean((fl[0][core] - disp) ** 2))

    fl_plain = flow.partial_flow_ilk(ref_n, mov_n, flow_axes=(-1,), radius=8)
    fl_blend = flow.partial_flow_blended(ref_n, mov_n, flow_axes=(-1,),
                                         blend_sigma=1.0, blend_num=4,
                                         momentum_radius=2, radius=8)
    assert fl_blend.shape == fl_plain.shape
    assert flow_rmse(fl_blend) < 0.6 * flow_rmse(fl_plain)

    # pairwise (momentum=False) variant runs and returns the same shape
    fl_pair = flow.partial_flow_blended(ref_n, mov_n, flow_axes=(-1,),
                                        blend_sigma=1.0, blend_num=4,
                                        momentum=False, radius=8)
    assert fl_pair.shape == fl_plain.shape
    assert np.all(np.isfinite(fl_pair))

    # post_blend_op hook is applied to the blended stack
    seen = {}

    def op(stack, scale=1.0):
        seen["shape"] = stack.shape
        return stack * scale

    flow.partial_flow_blended(ref_n, mov_n, flow_axes=(-1,), blend_num=3,
                              post_blend_op=op, op_kwargs={"scale": 1.0})
    assert seen["shape"][0] == 5

    # many blend frames stay finite (ill-conditioned guard)
    fl16 = flow.partial_flow_blended(ref_n, mov_n, flow_axes=(-1,),
                                     blend_num=16, radius=8)
    assert np.all(np.isfinite(fl16))


def test_warp_order_planning_picks_occupied_path():
    """solve_warp_axis_order ranks axis-ordered Manhattan paths by
    occupancy: stepping into fitted cells costs 1, hopping a single gap
    costs 2, dead ends cost inf (reference flow.py:294-364)."""
    from hybdrt_tpu.mapping.flow import (warp_step_cost, warp_path_cost,
                                         solve_warp_axis_order)
    # 3x3 grid: column 0 and row 2 fully fitted; interior cell (1,1) empty
    occ = np.array([[1, 0, 0],
                    [1, 1, 0],
                    [1, 1, 1]], dtype=bool)
    # Stepping from (0,0) down into (1,0): occupied -> 1
    assert warp_step_cost(occ, (0, 0), 1, 0) == 1.0
    # Stepping right from (0,0) into empty (0,1) with empty (0,2) beyond -> inf
    assert warp_step_cost(occ, (0, 0), 1, 1) == np.inf
    # Hop: from (1,1) right into empty (1,2)? beyond is out of bounds -> inf
    assert warp_step_cost(occ, (1, 1), 1, 1) == np.inf
    # Hop over a gap: row 0 of [[1,0,1]]
    occ2 = np.array([[1, 0, 1]], dtype=bool)
    assert warp_step_cost(occ2, (0, 0), 1, 1) == 2.0

    # From (0,0) to (2,2): going rows-first stays on occupied cells
    # (cost 4); columns-first crosses the empty top row (inf)
    c_rows, steps = warp_path_cost(occ, (0, 0), (2, 2), (0, 1))
    c_cols, _ = warp_path_cost(occ, (0, 0), (2, 2), (1, 0))
    assert c_rows == 4.0 and np.isinf(c_cols)
    assert len(steps) == 4
    order, cost, steps = solve_warp_axis_order(occ, (0, 0), (2, 2))
    assert order == (0, 1) and cost == 4.0


def test_optimize_extrema_cross_slab_attraction():
    """A slab missing an extremum is repaired toward its neighbors'
    positions via the cross-slab Gaussian attraction field (reference
    extrema.py:189-217): the NaN-masked blur of the other slabs' masks
    pulls the insertion to the neighbors' ridge column."""
    ridge = np.zeros((3, 1, 32), dtype=bool)
    trough = np.zeros_like(ridge)
    trough[:, 0, [5, 20]] = True     # every slab: bounding troughs
    ridge[0, 0, 12] = True            # neighbors have a ridge at col 12
    ridge[2, 0, 12] = True            # ... but the middle slab lost it
    r2, t2 = extrema.optimize_extrema(ridge, trough)
    assert r2.shape == ridge.shape
    # Neighbors are stable (already alternating, attraction reinforces)
    assert r2[0, 0, 12] and r2[2, 0, 12]
    # The middle slab's empty trough window is repaired by inserting a
    # ridge AT the neighbors' column, not at an arbitrary position
    assert r2[1, 0, 12]
    for g in range(3):
        assert extrema.alternation_energy(r2[g], t2[g]) == 0


def test_optimize_extrema_nd_group_dims():
    """N-d masks (*group_dims, rows, tau) are repaired slab-by-slab with
    reference N-d defaults (attraction=1, repulsion=100; reference
    extrema.py:175-221)."""
    ridge = np.zeros((2, 3, 1, 20), dtype=bool)
    trough = np.zeros_like(ridge)
    ridge[..., 0, [3, 10]] = True
    trough[..., 0, 16] = True
    r2, t2 = extrema.optimize_extrema(ridge, trough)
    assert r2.shape == ridge.shape
    for idx in np.ndindex(2, 3):
        assert extrema.alternation_energy(r2[idx], t2[idx]) == 0
