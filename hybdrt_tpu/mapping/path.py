"""Peak-trajectory tracing through (psi, ln tau) energy landscapes
(reference hybdrt/mapping/path.py).

Greedy minimum-energy paths with momentum and offset costs, starting-line
detection, and path <-> mask conversion.
"""
import numpy as np
from scipy import ndimage, signal


def find_starting_points(energy, start_row=0, height=None, prominence=None):
    """Candidate path starts: minima of the energy along the starting row
    (reference path.py:104)."""
    row = np.asarray(energy)[start_row]
    if height is None:
        height = -np.percentile(row, 75)
    peaks, _ = signal.find_peaks(-row, height=height, prominence=prominence)
    return peaks


def trace_path_2d(energy, start_col, start_row=0, momentum=0.5, offset_cost=0.1,
                  max_step=2):
    """Greedy min-energy path from a starting column, moving row by row
    (reference path.py:13-103).

    Each step chooses the next column within +-max_step that minimizes
    normalized energy + offset_cost * |step - momentum_pred|."""
    energy = np.asarray(energy, dtype=float)
    # Normalize so the offset cost is commensurate with energy contrasts
    e_std = np.std(energy)
    if e_std > 0:
        energy = (energy - np.mean(energy)) / e_std
    n_rows, n_cols = energy.shape
    path = np.empty(n_rows, dtype=int)
    path[start_row] = start_col
    velocity = 0.0

    for direction, rows in ((1, range(start_row + 1, n_rows)),
                            (-1, range(start_row - 1, -1, -1))):
        vel = velocity
        prev = start_col
        for r in rows:
            lo = max(prev - max_step, 0)
            hi = min(prev + max_step + 1, n_cols)
            steps = np.arange(lo, hi) - prev
            cost = energy[r, lo:hi] + offset_cost * np.abs(steps - momentum * vel)
            best = int(np.argmin(cost))
            vel = momentum * vel + (1 - momentum) * steps[best]
            prev = prev + steps[best]
            path[r] = prev
    return path


def find_paths_2d(energy, start_row=0, momentum=0.5, offset_cost=0.1, max_step=2,
                  start_kw=None):
    """All paths from detected starting points (reference path.py:79)."""
    starts = find_starting_points(energy, start_row, **(start_kw or {}))
    return [trace_path_2d(energy, c, start_row, momentum, offset_cost, max_step)
            for c in starts]


def find_paths_3d(energy, start_index=0, **kw):
    """Trace paths independently in each leading slice of a 3-D energy volume
    (reference path.py:240)."""
    return [find_paths_2d(energy[i], **kw) for i in range(energy.shape[0])]


def paths_to_mask(paths, shape):
    """Convert a list of column-index paths into a boolean image mask
    (reference path.py:420)."""
    mask = np.zeros(shape, dtype=bool)
    for path in paths:
        mask[np.arange(shape[0]), np.asarray(path, dtype=int)] = True
    return mask


def mask_to_paths(mask):
    """Extract per-row column indices of each connected ridge in a mask."""
    mask = np.asarray(mask, dtype=bool)
    labels, count = ndimage.label(mask, structure=np.ones((3, 3)))
    paths = []
    for lab in range(1, count + 1):
        rows, cols = np.where(labels == lab)
        path = np.full(mask.shape[0], -1, dtype=int)
        for r in np.unique(rows):
            path[r] = int(np.round(np.mean(cols[rows == r])))
        paths.append(path)
    return paths


def smooth_path(path, sigma=1.0):
    return np.round(ndimage.gaussian_filter1d(np.asarray(path, dtype=float),
                                              sigma)).astype(int)


def path_distance(path_a, path_b):
    """Mean absolute column distance between two paths over shared rows."""
    a = np.asarray(path_a)
    b = np.asarray(path_b)
    valid = (a >= 0) & (b >= 0)
    if not valid.any():
        return np.inf
    return float(np.mean(np.abs(a[valid] - b[valid])))


def match_paths(paths_a, paths_b, max_distance=5.0):
    """Greedy pairing of two path sets by mean distance (reference path.py:500)."""
    pairs = []
    dist = np.array([[path_distance(a, b) for b in paths_b] for a in paths_a])
    if dist.size == 0:
        return pairs
    used_a, used_b = set(), set()
    for flat in np.argsort(dist, axis=None):
        i, j = np.unravel_index(flat, dist.shape)
        if i in used_a or j in used_b or dist[i, j] > max_distance:
            continue
        pairs.append((i, j))
        used_a.add(i)
        used_b.add(j)
    return pairs


def recover_missing_paths(energy, paths, expected_count, **trace_kw):
    """If fewer paths than expected, seed extra paths at the lowest-energy
    columns away from existing paths (reference path.py:344-419)."""
    paths = list(paths)
    if len(paths) >= expected_count:
        return paths
    energy = np.asarray(energy, dtype=float)
    mean_row = np.mean(energy, axis=0)
    taken = np.zeros(energy.shape[1], dtype=bool)
    for p in paths:
        cols = np.asarray(p)
        med = int(np.median(cols[cols >= 0]))
        taken[max(0, med - 2):med + 3] = True
    order = np.argsort(mean_row)
    for col in order:
        if len(paths) >= expected_count:
            break
        if not taken[col]:
            paths.append(trace_path_2d(energy, col, **trace_kw))
            taken[max(0, col - 2):col + 3] = True
    return paths


# ======================================================================
# Bounded tuple-form paths (reference path.py:13-860): paths represented
# as (row_indices, col_indices) so they can start/stop anywhere, carry a
# total energy cost, terminate early on an energy threshold, and extend
# to coherent 3-D (slice, psi, tau) trajectories with a shared slope.
# ======================================================================
def energy_from_prob(ridge_prob):
    """Path energy landscape from ridge probability (reference path.py:74)."""
    with np.errstate(divide="ignore"):
        return -np.log(ridge_prob)


def _valley_energy(energy, grad_strength, grad_sigma):
    """Energy plus column-gradient magnitude: steers paths to valley floors
    (the reference uses a scharr edge filter; sobel is equivalent up to
    scale, scipy-only)."""
    if grad_strength <= 0:
        return energy
    base = ndimage.gaussian_filter(energy, grad_sigma) if grad_sigma else energy
    grad = np.abs(ndimage.sobel(base, axis=1)) / 4.0
    return energy + grad_strength * grad


def find_path_2d(energy, start_coords, end_row_index, offset=2, offset_cost=0.1,
                 momentum=0.1, max_energy=np.inf, grad_strength=2, grad_sigma=2):
    """Greedy min-energy path from start_coords toward end_row_index.
    Returns ((row_indices, col_indices), total_cost); the path terminates
    early where the landscape exceeds max_energy (reference path.py:13)."""
    i0, j0 = int(start_coords[0]), int(start_coords[1])
    direction = int(np.sign(end_row_index - i0)) or 1
    energy = np.nan_to_num(np.asarray(energy, dtype=float))
    tot_energy = _valley_energy(energy, grad_strength, grad_sigma)

    n_steps = abs(int(end_row_index) - i0)
    cols = np.empty(n_steps + 1, dtype=int)
    cols[0] = j0
    offsets = np.arange(-offset, offset + 1, dtype=int)
    off_costs = offset_cost * np.abs(offsets)

    i, j, prev_off, tot_cost, end_i = i0, j0, 0, 0.0, int(end_row_index)
    for n in range(n_steps):
        valid = (j + offsets >= 0) & (j + offsets < energy.shape[1])
        offs, ocost = offsets[valid], off_costs[valid]
        e_row = tot_energy[i + direction, j + offs]
        cost = e_row + momentum * np.abs(offs - prev_off) + ocost
        best = int(np.argmin(cost))
        if energy[i + direction, j + offs[best]] > max_energy:
            end_i = i
            cols = cols[:n + 1]
            break
        i += direction
        j += offs[best]
        cols[n + 1] = j
        tot_cost += cost[best]
        prev_off = offs[best]
    rows = np.arange(i0, end_i + direction, direction)
    return (rows, cols), tot_cost


def find_bounded_paths_2d(ridge_prob, start_rows, end_rows, offset=2,
                          offset_cost=0.1, momentum=0.1, min_prob=0,
                          grad_strength=2, grad_sigma=2, **find_peaks_kw):
    """Tuple-form paths seeded at ridge-probability peaks on each start row
    (reference path.py:79 find_paths_2d). Returns (paths, costs)."""
    energy = energy_from_prob(np.asarray(ridge_prob) + 1e-10)
    # Energy threshold consistent with energy_from_prob (-log p): a path
    # terminates where probability drops below min_prob. (The reference's
    # 2-D form used the logit instead, which degenerates for min_prob >=
    # 0.5 and disagrees with its own 3-D form.)
    max_energy = np.inf if min_prob == 0 else -np.log(min_prob)
    paths, costs = [], []
    for start_row, end_row in zip(np.atleast_1d(start_rows),
                                  np.atleast_1d(end_rows)):
        peaks, _ = signal.find_peaks(np.asarray(ridge_prob)[start_row],
                                     **find_peaks_kw)
        for peak in peaks:
            path, cost = find_path_2d(energy, (start_row, peak), end_row,
                                      offset=offset, offset_cost=offset_cost,
                                      momentum=momentum, max_energy=max_energy,
                                      grad_strength=grad_strength,
                                      grad_sigma=grad_sigma)
            paths.append(path)
            costs.append(cost)
    return paths, costs


def tuple_paths_to_mask(shape, paths, increment_labels=False, fill_nan=False):
    """Mask (or label image) from tuple-form paths; 3-D paths carry one
    column track per leading slice (reference path.py:420-465)."""
    out = np.zeros(shape, dtype=int if increment_labels else bool)
    for k, (rows, cols) in enumerate(paths):
        cols = np.asarray(cols)
        val = k + 1 if increment_labels else True
        if cols.ndim > 1:
            for idx in np.ndindex(*cols.shape[:-1]):
                out[idx + (rows, cols[idx])] = val
        else:
            out[..., rows, cols] = val
    if fill_nan:
        out = out.astype(float)
        out[out == 0] = np.nan
    return out


def path_energy_well(path_mask, energy, sigma=2):
    """Region around each path where the column-curvature of the energy is
    positive (the surrounding valley), found by hysteresis growth from the
    path (reference path.py:314)."""
    from ..filters import flexible_hysteresis_threshold
    from ..filters._scifilters import gaussian_laplace1d
    curv = gaussian_laplace1d(np.nan_to_num(energy), sigma=sigma, axis=1)
    well_depth = np.max(-energy[np.isfinite(energy)]) + 1
    elev = curv + well_depth * np.nan_to_num(path_mask)
    structure = np.zeros((3, 3))
    structure[1] = 1  # connect along tau only
    return flexible_hysteresis_threshold(elev, 0, well_depth,
                                         structure=structure)


def find_peaks_2d(ridge_prob, distance=3, height=0.1, prominence=0.1, **kw):
    """Row-wise scipy peak mask of a (psi, tau) probability map
    (reference path.py:333)."""
    mask = np.zeros_like(ridge_prob, dtype=bool)
    for i in range(ridge_prob.shape[0]):
        peaks, _ = signal.find_peaks(ridge_prob[i], distance=distance,
                                     height=height, prominence=prominence,
                                     **kw)
        mask[i, peaks] = True
    return mask


def find_missing_peaks(ridge_prob, *, paths=None, path_mask=None,
                       **find_peaks_kw):
    """Probability peaks not connected to any traced path's energy well
    (reference path.py:344)."""
    if (paths is None) == (path_mask is None):
        raise ValueError("Provide exactly one of paths or path_mask")
    if paths is not None:
        path_mask = tuple_paths_to_mask(np.shape(ridge_prob), paths)
    energy = energy_from_prob(np.asarray(ridge_prob) + 1e-10)
    well = path_energy_well(path_mask, energy)
    peak_mask = find_peaks_2d(ridge_prob, **find_peaks_kw)
    structure = np.zeros((3, 3))
    structure[1] = 1
    labels, count = ndimage.label(peak_mask, structure=structure)
    sums = ndimage.sum_labels(well, labels, index=np.arange(count + 1))
    return (sums == 0)[labels] & peak_mask


def find_missing_paths(ridge_prob, missing_peak_mask, row_lim=None,
                       **path_kwargs):
    """Trace a path through each undetected-peak group, out to both row
    limits, and join the halves (reference path.py:372)."""
    labels, count = ndimage.label(missing_peak_mask, structure=np.ones((3, 3)))
    energy = energy_from_prob(np.asarray(ridge_prob) + 1e-10)
    if row_lim is None:
        row_lim = (0, len(ridge_prob) - 1)
    paths, costs = [], []
    for lab in range(1, count + 1):
        start = tuple(np.argwhere(labels == lab)[0])
        if start[0] == row_lim[0]:
            ends = [row_lim[1]]
        elif start[0] == row_lim[1]:
            ends = [row_lim[0]]
        else:
            ends = list(row_lim)
        segs, cost = [], 0.0
        for end_row in ends:
            seg, c = find_path_2d(energy, start, end_row, **path_kwargs)
            segs.append(seg)
            cost += c
        rows = np.concatenate([s[0] for s in segs])
        cols = np.concatenate([s[1] for s in segs])
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
        keep = np.concatenate([[True], np.diff(rows) > 0])
        paths.append((rows[keep], cols[keep]))
        costs.append(cost)
    return paths, costs


def clip_path(path, row_limits):
    """Restrict a tuple-form path to a row range (reference path.py:810)."""
    rows, cols = path
    keep = (rows >= row_limits[0]) & (rows <= row_limits[1])
    return rows[keep], np.asarray(cols)[..., keep]


def path_pair_metrics(path1, path2):
    """(correlation, per-row RSS) of two tuple paths over shared rows
    (reference path.py:481)."""
    _, i1, i2 = np.intersect1d(path1[0], path2[0], return_indices=True)
    j1 = np.asarray(path1[1])[..., i1].ravel().astype(float)
    j2 = np.asarray(path2[1])[..., i2].ravel().astype(float)
    if len(j1) == 0:
        return 0.0, np.inf
    corr = np.corrcoef(j1, j2)[0, 1] if len(j1) > 1 else 1.0
    return corr, np.sum((j1 - j2) ** 2) / len(j1)


def compare_paths(path_list1, path_list2):
    """Pairwise (correlation, RSS) matrices (reference path.py:494)."""
    corr = np.empty((len(path_list1), len(path_list2)))
    rss = np.empty_like(corr)
    for i, p1 in enumerate(path_list1):
        for j, p2 in enumerate(path_list2):
            corr[i, j], rss[i, j] = path_pair_metrics(p1, p2)
    return corr, rss


def merge_paths(path_list1, path_list2, rss_thresh=1.0, sort=True):
    """Merge two path sets: matched pairs (RSS <= thresh) average their
    columns over shared rows; unmatched paths pass through. Returns
    (merged_paths, (labels1, labels2)) (reference path.py:519)."""
    _, rss = compare_paths(path_list1, path_list2)
    match = np.where(rss <= rss_thresh)
    merged = []
    labels = (np.zeros(len(path_list1), dtype=int),
              np.zeros(len(path_list2), dtype=int))
    for n, (i, j) in enumerate(zip(*match)):
        p1, p2 = path_list1[i], path_list2[j]
        rows, i1, i2 = np.intersect1d(p1[0], p2[0], return_indices=True)
        mean_cols = np.round(np.mean(
            [np.asarray(p1[1], dtype=float)[..., i1],
             np.asarray(p2[1], dtype=float)[..., i2]], axis=0)).astype(int)
        merged.append((rows, mean_cols))
        labels[0][i] = n
        labels[1][j] = n
    for side, (plist, midx) in enumerate(zip((path_list1, path_list2), match)):
        for k in sorted(set(range(len(plist))) - set(midx)):
            merged.append(plist[k])
            labels[side][k] = len(merged) - 1
    if sort and merged:
        order = np.argsort([np.mean(p[1]) for p in merged])
        remap = {old: new for new, old in enumerate(order)}
        merged = [merged[i] for i in order]
        labels = tuple(np.array([remap[v] for v in lab]) for lab in labels)
    return merged, labels


# ----------------------------------------------------------------------
# Path quantification (reference path.py:597-780)
# ----------------------------------------------------------------------
def find_bounding_troughs_2d(trough_mask, path):
    """Nearest trough column on each side of a 2-D tuple path, per row
    (reference path.py:597)."""
    from ..utils.array import nearest_index
    rows, cols = path
    left = np.empty_like(np.asarray(cols))
    right = np.empty_like(left)
    for i, (row, col) in enumerate(zip(rows, np.asarray(cols))):
        t_idx = np.where(trough_mask[row])[0]
        t_idx = np.unique(np.concatenate(
            [t_idx, [0, trough_mask.shape[-1] - 1]]))
        left[i] = t_idx[nearest_index(t_idx, col, -1)]
        right[i] = t_idx[nearest_index(t_idx, col, 1)]
    return left, right


def find_bounding_troughs(trough_mask, path, tidy=False, median_size=3,
                          sigma=1):
    """Bounding troughs for paths of any dimensionality (last axis tau,
    second-to-last the travel axis); optionally median/gaussian-tidied
    (reference path.py:614)."""
    from ..filters import iterative_gaussian_filter
    rows, cols = path
    cols = np.asarray(cols)
    if cols.ndim > 1:
        left = np.empty_like(cols)
        right = np.empty_like(cols)
        for idx in np.ndindex(*cols.shape[:-1]):
            left[idx], right[idx] = find_bounding_troughs_2d(
                np.asarray(trough_mask)[idx], (rows, cols[idx]))
    else:
        left, right = find_bounding_troughs_2d(trough_mask, path)
    if tidy:
        for raw in (left, right):
            med = ndimage.median_filter(raw, size=median_size)
            bad = np.abs(raw - med) > 5
            raw[bad] = med[bad]
            raw[...] = iterative_gaussian_filter(raw, sigma=sigma)
    return left, right


def get_path_tau(tau, paths, shape=None):
    """tau value along each path; as a (num_paths, *shape[:-1]) array with
    NaN for unreached rows when shape is given, else a ragged list
    (reference path.py:650)."""
    tau = np.asarray(tau)
    if shape is None:
        return [tau[np.asarray(p[1])] for p in paths]
    out = np.full((len(paths), *shape[:-1]), np.nan)
    for k, (rows, cols) in enumerate(paths):
        cols = np.asarray(cols)
        if cols.ndim > 1:
            out[k][..., rows] = tau[cols]
        else:
            out[k, rows] = tau[cols]
    return out


def integrate_paths(tau, f, paths, troughs=None, widths=None,
                    weight_multipliers=None, width_sigma=1,
                    constrain_sign=False, smooth=False, smooth_sigma=None):
    """Split a distribution map among traced paths and integrate each
    path's share over ln(tau): each path gets an RBF weight field centered
    on its track with width set by the bounding troughs (or fixed widths);
    weights are normalized across paths so mass is conserved. Returns
    (path_dist, path_sizes) (reference path.py:672)."""
    from ..filters import nonuniform_gaussian_filter1d
    f = np.asarray(f, dtype=float)
    tau = np.asarray(tau)
    if (troughs is None) == (widths is None):
        raise ValueError("Provide exactly one of troughs or widths")
    if weight_multipliers is None or np.isscalar(weight_multipliers) \
            or np.shape(weight_multipliers) == f.shape:
        weight_multipliers = [1 if weight_multipliers is None
                              else weight_multipliers] * len(paths)
    if widths is not None and np.isscalar(widths):
        widths = [widths] * len(paths)
    if smooth:
        if smooth_sigma is None:
            raise ValueError("smooth=True requires smooth_sigma")
        if np.isscalar(smooth_sigma):
            smooth_sigma = (smooth_sigma,) * (f.ndim - 1)

    path_weights = np.zeros((len(paths), *f.shape))
    for k, path in enumerate(paths):
        rows, cols = path
        mask = tuple_paths_to_mask(f.shape, [path]).astype(float)
        if smooth:
            mask = ndimage.gaussian_filter(mask, sigma=tuple(smooth_sigma) + (0,))
        f_path = mask * f * weight_multipliers[k]

        if troughs is not None:
            left, right = troughs[k]
            left = np.asarray(left, dtype=float)
            right = np.asarray(right, dtype=float)
            if smooth:
                left = ndimage.gaussian_filter(left, sigma=smooth_sigma)
                right = ndimage.gaussian_filter(right, sigma=smooth_sigma)
            right_r = np.zeros(f.shape[:-1])
            left_r = np.zeros(f.shape[:-1])
            right_r[..., rows] = right - cols
            left_r[..., rows] = cols - left
            path_widths = 2 * np.minimum(left_r, right_r).astype(float)
        else:
            path_widths = widths[k]
        if width_sigma is not None and not np.isscalar(path_widths):
            path_widths = ndimage.gaussian_filter(path_widths,
                                                  sigma=width_sigma)
        sigmas = np.broadcast_to(
            np.expand_dims(np.asarray(path_widths, dtype=float) / 2, -1),
            f.shape).copy()
        path_weights[k] = nonuniform_gaussian_filter1d(f_path, sigmas,
                                                       axis=-1, truncate=6)
        if constrain_sign:
            nz = f_path[f_path != 0]
            if len(nz):
                path_sign = np.sign(np.nanmedian(nz))
                path_weights[k][np.sign(f) != path_sign] = 0

    weight_sum = np.sum(path_weights, axis=0)[None]
    weight_sum[weight_sum == 0] = 1
    path_dist = (path_weights / weight_sum) * f[None]
    path_sizes = np.trapezoid(path_dist, x=np.log(tau), axis=-1)
    return path_dist, path_sizes


# ----------------------------------------------------------------------
# Coherent 3-D paths (reference path.py:104-292): one trajectory through a
# (slice, psi, tau) volume, with the per-slice columns tied to a shared
# slope that evolves as the path advances.
# ----------------------------------------------------------------------
def columns_from_slope(col, slope, num_slices, bounds):
    cols = np.round(col + slope * np.arange(num_slices)).astype(int)
    if bounds is not None:
        cols = np.clip(cols, bounds[0], bounds[1])
    return cols


def get_line_3d(a, row, cols):
    return np.array([a[i, row, cols[i]] for i in range(len(cols))])


def find_starting_lines_3d(ridge_prob, start_row, max_slope=3,
                           **find_peaks_kw):
    """Seed lines across slices: for each peak on the first slice's start
    row, pick the cross-slice slope maximizing the summed log probability
    (reference path.py:104)."""
    ridge_prob = np.asarray(ridge_prob)
    peaks, _ = signal.find_peaks(ridge_prob[0, start_row], **find_peaks_kw)
    num_slices = ridge_prob.shape[0]
    slopes = np.arange(-max_slope, max_slope + 0.1, 1.0 / num_slices)
    with np.errstate(divide="ignore"):
        log_prob = np.log(ridge_prob)
    lines = []
    for peak in peaks:
        lps = [np.sum(get_line_3d(
            log_prob, start_row,
            columns_from_slope(peak, s, num_slices,
                               (0, ridge_prob.shape[-1] - 1))))
            for s in slopes]
        best = slopes[int(np.argmax(lps))]
        lines.append(columns_from_slope(peak, best, num_slices,
                                        (0, ridge_prob.shape[-1] - 1)))
    return lines


def find_path_3d(energy, start_row, start_cols, end_row, *, offset=2,
                 offset_cost=0.1, momentum=0.1, slope_offset_cost=0.1,
                 slope_momentum=0.1, max_slope=3, max_energy=np.inf,
                 grad_strength=2, grad_sigma=2, bounds=None):
    """Coherent path through a (slice, psi, tau) volume: at each psi step the
    whole cross-slice line moves by one offset and may tilt by one slope
    increment, scored by summed energy + offset/momentum/slope costs
    (reference path.py:139). Returns ((rows, cols[num_slices, n]), cost)."""
    energy = np.nan_to_num(np.asarray(energy, dtype=float))
    num_slices = energy.shape[0]
    direction = int(np.sign(end_row - start_row)) or 1
    slope_inc = 1.0 / num_slices
    if bounds is None:
        bounds = (0, energy.shape[-1] - 1)
    if grad_strength > 0:
        tot_energy = np.stack([_valley_energy(energy[i], grad_strength,
                                              grad_sigma)
                               for i in range(num_slices)])
    else:
        tot_energy = energy

    n_steps = abs(int(end_row) - int(start_row))
    col_coords = np.empty((num_slices, n_steps + 1), dtype=int)
    start_cols = np.asarray(start_cols, dtype=int)
    col_coords[:, 0] = start_cols

    row = start_row
    cols = start_cols
    slope = float(start_cols[-1] - start_cols[0]) / num_slices
    prev_off = 0
    offsets = np.arange(-offset, offset + 1, dtype=int)
    off_costs = offset_cost * np.abs(offsets)
    end = int(end_row)
    tot_cost = 0.0
    for n in range(n_steps):
        slopes = np.arange(slope - 2 * slope_inc,
                           slope + 2 * slope_inc + 1e-10, slope_inc)
        slopes = slopes[np.abs(slopes) <= max_slope]
        best_by_slope = []
        for s in slopes:
            test_cols = columns_from_slope(cols[0], s, num_slices, bounds)
            valid = (np.min(test_cols) + offsets >= bounds[0]) & \
                    (np.max(test_cols) + offsets <= bounds[1])
            offs, ocost = offsets[valid], off_costs[valid]
            if len(offs) == 0:
                best_by_slope.append((np.inf, test_cols, 0))
                continue
            e = np.array([np.sum(get_line_3d(tot_energy, row + direction,
                                             test_cols + o)) for o in offs])
            e += momentum * np.abs(offs - prev_off) + ocost
            b = int(np.argmin(e))
            best_by_slope.append((e[b], test_cols + offs[b], offs[b]))
        slope_cost = np.abs(slopes - slope) * slope_offset_cost \
            + np.abs(slopes - slope) * slope_momentum
        total = np.array([b[0] for b in best_by_slope]) + slope_cost
        si = int(np.argmin(total))
        next_cols = best_by_slope[si][1]
        if np.min(get_line_3d(energy, row + direction, next_cols)) > max_energy:
            end = row
            col_coords = col_coords[:, :n + 1]
            break
        row += direction
        cols = next_cols
        slope = slopes[si]
        prev_off = best_by_slope[si][2]
        col_coords[:, n + 1] = cols
        tot_cost += total[si]
    rows = np.arange(start_row, end + direction, direction)
    return (rows, col_coords), tot_cost


def find_bounded_paths_3d(ridge_prob, start_row, end_row, min_prob=0,
                          max_slope=3, **kw):
    """Coherent 3-D paths from detected starting lines
    (reference path.py:240 find_paths_3d)."""
    find_peaks_kw = {k: kw.pop(k) for k in ("distance", "height", "prominence")
                     if k in kw}
    lines = find_starting_lines_3d(ridge_prob, start_row, max_slope=max_slope,
                                   **find_peaks_kw)
    energy = energy_from_prob(np.asarray(ridge_prob) + 1e-10)
    max_energy = np.inf if min_prob == 0 else -np.log(min_prob)
    paths, costs = [], []
    for line in lines:
        path, cost = find_path_3d(energy, start_row, line, end_row,
                                  max_slope=max_slope, max_energy=max_energy,
                                  **kw)
        paths.append(path)
        costs.append(cost)
    return paths, costs


def make_ridge_path_mask(ridge_prob, start_rows, end_rows, min_prob=0,
                         increment_labels=False, **kw):
    """Path mask over arbitrarily-grouped probability maps: trace each
    (psi, tau) slab and stamp its paths (reference path.py:292)."""
    ridge_prob = np.asarray(ridge_prob)
    mask = np.zeros(ridge_prob.shape,
                    dtype=int if increment_labels else bool)
    n_group = ridge_prob.ndim - 2
    for idx in np.ndindex(*ridge_prob.shape[:n_group]):
        slab = ridge_prob[idx]
        if np.all(np.isnan(slab)):
            continue
        paths, _ = find_bounded_paths_2d(slab, start_rows, end_rows,
                                         min_prob=min_prob, **kw)
        mask[idx] = tuple_paths_to_mask(slab.shape, paths,
                                        increment_labels=increment_labels)
    return mask


def plot_paths_and_troughs(paths, troughs, shape, slice_index=None,
                           slice_axis=None, ax=None):
    """Overlay path (red) and bounding-trough (blue) masks
    (reference path.py:819)."""
    import matplotlib.pyplot as plt
    path_mask = tuple_paths_to_mask(shape, paths, fill_nan=True)
    trough_paths = []
    for k, path in enumerate(paths):
        trough_paths += [(path[0], troughs[k][0]), (path[0], troughs[k][1])]
    trough_mask = tuple_paths_to_mask(shape, trough_paths, fill_nan=True)
    if slice_index is not None:
        path_mask = np.take(path_mask, slice_index, slice_axis)
        trough_mask = np.take(trough_mask, slice_index, slice_axis)
    if ax is None:
        _, ax = plt.subplots(figsize=(3, 3))
    ax.pcolormesh(path_mask, cmap="Reds", vmin=0, vmax=1)
    ax.pcolormesh(trough_mask, cmap="Blues", vmin=0, vmax=1)
    return ax


def smooth_paths(paths, sigma):
    """Smooth a list of paths (full-column or tuple form)
    (reference path.py:474)."""
    out = []
    for p in paths:
        if isinstance(p, tuple):
            rows, cols = p
            sm = np.round(ndimage.gaussian_filter1d(
                np.asarray(cols, dtype=float), sigma, axis=-1,
                mode="nearest")).astype(int)
            out.append((rows, sm))
        else:
            out.append(smooth_path(p, sigma))
    return out


# Reference-compatible alias: tuple-form paths with per-slice column tracks
# stamp into an N-D mask the same way (reference path.py:420)
paths_to_mask_3d = tuple_paths_to_mask
