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
