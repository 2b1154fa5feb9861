"""Topological clustering of DRT peak clouds (reference hybdrt/mapping/tda.py).

The reference delegates to the external ``kmapper`` package; since the Mapper
algorithm itself is small (cover the lens range with overlapping intervals,
cluster each preimage bin, connect clusters that share members), it is
implemented here directly so the module has no dependency beyond networkx
and sklearn. The graph dict format ({'nodes': {name: member_indices},
'links': {name: [names]}}) matches kmapper's so downstream helpers keep the
reference semantics (reference tda.py:39-48).
"""
import itertools

import numpy as np
import networkx as nx


def image_to_cloud(img, dim_grids, thresh=None, index=None, include_intensity=True,
                   return_index=False):
    """Convert an intensity image on coordinate grids to a point cloud of the
    above-threshold (or indexed) pixels (reference tda.py:6-27)."""
    if len(dim_grids) != np.ndim(img):
        raise ValueError("dim_grids must match image dimensions")
    if index is None and thresh is None:
        raise ValueError("Either thresh or index must be provided")

    coord_mesh = np.meshgrid(*dim_grids, indexing="ij")
    if index is None:
        index = img > thresh

    values = [cm[index] for cm in coord_mesh]
    if include_intensity:
        values.append(img[index])
    cloud = np.stack(values, axis=0).T

    if return_index:
        return cloud, index
    return cloud


def cloud_to_image(cloud, index, fill_val=0):
    """Place per-point values back into image pixels (reference tda.py:30-36)."""
    img = np.full(index.shape, float(fill_val))
    img[index] = cloud
    return img


def _cluster_bin(points, eps=None, min_samples=2):
    """Cluster one preimage bin with DBSCAN; returns a list of index arrays
    (local indices into points). Noise points become singleton clusters so no
    data is silently dropped."""
    from sklearn.cluster import DBSCAN
    n = len(points)
    if n == 0:
        return []
    if n == 1:
        return [np.array([0])]
    if eps is None:
        # Median nearest-neighbor distance heuristic
        d = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
        d = d + np.eye(n) * np.inf
        eps = 2.0 * float(np.median(np.min(d, axis=1)))
        if not np.isfinite(eps) or eps <= 0:
            eps = 1.0
    labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points)
    clusters = [np.flatnonzero(labels == lab) for lab in np.unique(labels) if lab >= 0]
    clusters += [np.array([i]) for i in np.flatnonzero(labels == -1)]
    return clusters


def mapper_graph(cloud, lens=None, n_cubes=10, overlap=0.5, eps=None, min_samples=2):
    """Mapper graph of a point cloud.

    Parameters
    ----------
    cloud : (n, d) array of points (e.g. from image_to_cloud).
    lens : (n,) or (n, k) filter values; defaults to the first coordinate.
    n_cubes : intervals per lens dimension in the cover.
    overlap : fractional overlap between adjacent intervals (0 <= overlap < 1).
    eps, min_samples : DBSCAN parameters for per-bin clustering.

    Returns a kmapper-style dict: {'nodes': {name: member_index_array},
    'links': {name: [linked names]}} where members index rows of cloud.
    """
    cloud = np.asarray(cloud, dtype=float)
    n = len(cloud)
    if lens is None:
        lens = cloud[:, 0]
    lens = np.asarray(lens, dtype=float)
    if lens.ndim == 1:
        lens = lens[:, None]
    k = lens.shape[1]

    lo = lens.min(axis=0)
    hi = lens.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    width = span / n_cubes
    radius = width * (1 + overlap) / 2  # half-width of each (overlapping) cube

    nodes = {}
    for cube_idx in itertools.product(range(n_cubes), repeat=k):
        center = lo + (np.asarray(cube_idx) + 0.5) * width
        in_bin = np.all(np.abs(lens - center[None, :]) <= radius[None, :], axis=1)
        members = np.flatnonzero(in_bin)
        if len(members) == 0:
            continue
        for ci, cluster in enumerate(_cluster_bin(cloud[members], eps=eps,
                                                  min_samples=min_samples)):
            name = "cube" + "_".join(map(str, cube_idx)) + f"_cluster{ci}"
            nodes[name] = members[cluster]

    # Nerve: link nodes sharing at least one member
    links = {name: [] for name in nodes}
    names = list(nodes)
    sets = {name: set(nodes[name].tolist()) for name in names}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if sets[a] & sets[b]:
                links[a].append(b)

    return {"nodes": nodes, "links": links}


def to_nx(graph):
    """Convert a mapper graph dict to a networkx Graph (kmapper.adapter.to_nx
    analog, used by reference tda.py:44)."""
    g = nx.Graph()
    g.add_nodes_from(graph["nodes"])
    for a, bs in graph.get("links", {}).items():
        for b in bs:
            g.add_edge(a, b)
    return g


def component_members(graph, component_nodes):
    """Unique cloud indices covered by a set of graph nodes
    (reference tda.py:39-41)."""
    members = [graph["nodes"][node] for node in component_nodes]
    return np.unique(np.concatenate(members))


def connected_component_members(graph, nx_graph=None):
    """Cloud-index membership of each connected component
    (reference tda.py:44-48)."""
    if nx_graph is None:
        nx_graph = to_nx(graph)
    components = list(nx.connected_components(nx_graph))
    return [component_members(graph, nodes) for nodes in components]
