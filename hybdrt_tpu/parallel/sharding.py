"""Device mesh helpers for batch-parallel DRT inversion.

The reference's only scale axis is a serial python loop over observations
(reference hybdrt/mapping/drtmd.py:303-319). Here the batch axis is sharded
over a jax.sharding.Mesh: data parallel over ICI within a slice, DCN across
hosts — XLA inserts the collectives.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = "obs"


def make_mesh(devices=None, axis_name=BATCH_AXIS):
    """1-D mesh over all (or given) devices for data-parallel batch fits."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name=BATCH_AXIS):
    """Shard the leading (observation) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def pad_batch(arr, mesh, axis_name=BATCH_AXIS):
    """Pad the leading axis to a multiple of the mesh size; returns
    (padded_array, original_size)."""
    n_dev = mesh.shape[axis_name]
    b = arr.shape[0]
    rem = (-b) % n_dev
    if rem:
        pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
        arr = np.pad(arr, pad_width, mode="edge")
    return arr, b


def shard_batch(arr, mesh, axis_name=BATCH_AXIS):
    """Device-put an array with the leading axis sharded over the mesh."""
    return jax.device_put(arr, batch_sharding(mesh, axis_name))
