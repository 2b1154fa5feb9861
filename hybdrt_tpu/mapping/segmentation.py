"""Cluster segmentation of merged peak groups via a Potts-like interaction
model with simulated annealing (reference hybdrt/mapping/segmentation.py)."""
import numpy as np
from scipy import ndimage


def image_to_points(mask, values=None):
    """Boolean mask -> point cloud (N, ndim) with optional values."""
    idx = np.argwhere(np.asarray(mask))
    if values is None:
        return idx
    return idx, np.asarray(values)[tuple(idx.T)]


def points_to_image(points, shape, values=None):
    out = np.zeros(shape, dtype=float if values is not None else bool)
    points = np.asarray(points, dtype=int)
    if values is None:
        out[tuple(points.T)] = True
    else:
        out[tuple(points.T)] = values
    return out


def find_cluster_groups(mask, structure=None):
    """Connected components that may contain multiple merged clusters
    (reference segmentation.py:81)."""
    labels, count = ndimage.label(np.asarray(mask), structure=structure)
    return labels, count


def interaction_energy(points, assignments, centers, scale=1.0, repulsion=0.5):
    """Potts-like energy: distance to assigned center minus same-cluster
    cohesion, plus inter-center repulsion (reference segmentation.py:153)."""
    points = np.asarray(points, dtype=float)
    e = 0.0
    for k, center in enumerate(centers):
        members = points[assignments == k]
        if len(members) == 0:
            continue
        e += np.sum(np.sum((members - center) ** 2, axis=1)) / scale ** 2
    for i in range(len(centers)):
        for j in range(i + 1, len(centers)):
            d2 = np.sum((np.asarray(centers[i]) - np.asarray(centers[j])) ** 2)
            e += repulsion * scale ** 2 / (d2 + 1e-6)
    return e


def mc_anneal(points, n_clusters, n_iter=2000, t_start=1.0, t_end=0.01, scale=None,
              repulsion=0.5, rng=None):
    """Simulated-annealing cluster assignment (reference segmentation.py:224).

    Returns (assignments, centers)."""
    rng = np.random.default_rng(rng)
    points = np.asarray(points, dtype=float)
    n = len(points)
    if scale is None:
        scale = np.std(points) + 1e-6

    # Initialize by splitting along the principal axis (first right
    # singular vector of the centered cloud)
    if n > 1:
        centered = points - points.mean(0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        proj = centered @ vt[0]
    else:
        proj = np.zeros(n)
    order = np.argsort(proj)
    assignments = np.zeros(n, dtype=int)
    for k in range(n_clusters):
        assignments[order[k * n // n_clusters:(k + 1) * n // n_clusters]] = k

    def centers_of(a):
        return [points[a == k].mean(axis=0) if np.any(a == k)
                else points[rng.integers(n)] for k in range(n_clusters)]

    centers = centers_of(assignments)
    energy = interaction_energy(points, assignments, centers, scale, repulsion)
    temps = np.geomspace(t_start, t_end, n_iter)
    for t in temps:
        i = rng.integers(n)
        new_k = rng.integers(n_clusters)
        if new_k == assignments[i]:
            continue
        proposal = assignments.copy()
        proposal[i] = new_k
        new_centers = centers_of(proposal)
        new_energy = interaction_energy(points, proposal, new_centers, scale, repulsion)
        if new_energy < energy or rng.random() < np.exp((energy - new_energy) / (t * scale ** 2)):
            assignments, centers, energy = proposal, new_centers, new_energy
    return assignments, np.asarray(centers)


def segment_mask(mask, n_clusters, **anneal_kw):
    """Split a merged mask into n_clusters labeled regions."""
    points = image_to_points(mask)
    assignments, centers = mc_anneal(points, n_clusters, **anneal_kw)
    labels = np.zeros(np.asarray(mask).shape, dtype=int)
    labels[tuple(points.T)] = assignments + 1
    return labels, centers


# Reference-compatible alias (reference segmentation.py mc_optimize: the
# annealed Potts-model Monte Carlo optimization)
mc_optimize = mc_anneal
