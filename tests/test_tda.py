"""Mapper-based topological clustering (hybdrt_tpu/mapping/tda.py;
reference hybdrt/mapping/tda.py via kmapper)."""
import numpy as np

from hybdrt_tpu.mapping import tda


def _two_blob_image():
    x = np.linspace(0, 1, 40)
    y = np.linspace(0, 1, 30)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    img = (np.exp(-((xx - 0.25) ** 2 + (yy - 0.3) ** 2) / 0.004)
           + np.exp(-((xx - 0.75) ** 2 + (yy - 0.7) ** 2) / 0.004))
    return img, [x, y]


def test_image_cloud_roundtrip():
    img, grids = _two_blob_image()
    cloud, index = tda.image_to_cloud(img, grids, thresh=0.2, return_index=True)
    assert cloud.shape[1] == 3  # x, y, intensity
    assert np.all(cloud[:, 2] > 0.2)
    img2 = tda.cloud_to_image(cloud[:, 2], index, fill_val=0)
    assert np.allclose(img2[index], img[index])
    assert np.all(img2[~index] == 0)


def test_image_to_cloud_validation():
    import pytest
    img, grids = _two_blob_image()
    with pytest.raises(ValueError):
        tda.image_to_cloud(img, grids[:1], thresh=0.2)
    with pytest.raises(ValueError):
        tda.image_to_cloud(img, grids)  # neither thresh nor index


def test_mapper_separates_components():
    img, grids = _two_blob_image()
    cloud = tda.image_to_cloud(img, grids, thresh=0.2, include_intensity=False)
    graph = tda.mapper_graph(cloud, lens=cloud[:, 0], n_cubes=8, overlap=0.5)
    assert len(graph["nodes"]) > 0
    comps = tda.connected_component_members(graph)
    # The two separated blobs form two connected components
    assert len(comps) == 2
    # Every cloud point is covered exactly by the union of components
    union = np.unique(np.concatenate(comps))
    assert len(union) == len(cloud)
    # Components are spatially coherent: each stays on one side in x
    means = sorted(float(np.mean(cloud[c, 0])) for c in comps)
    assert means[0] < 0.5 < means[1]


def test_component_members_dedup():
    graph = {"nodes": {"a": np.array([0, 1, 2]), "b": np.array([2, 3])},
             "links": {"a": ["b"], "b": []}}
    members = tda.component_members(graph, ["a", "b"])
    assert members.tolist() == [0, 1, 2, 3]
