"""Multi-dataset vector bookkeeping (reference hybdrt/utils/md.py):
helpers for concatenating per-observation data vectors and tracking the
boundaries for later splitting."""
import numpy as np


def get_data_tuple_item(data_tuple, index):
    if data_tuple is None:
        return None
    return data_tuple[index]


def concatenate_vectors(vector_list):
    """Concatenate per-observation vectors; returns (vector, start_indices)."""
    vecs = [np.atleast_1d(v) for v in vector_list if v is not None]
    lengths = [len(v) for v in vecs]
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if lengths else np.array([])
    return (np.concatenate(vecs) if vecs else np.array([])), starts.astype(int)


def split_vector(vector, start_indices):
    """Inverse of concatenate_vectors."""
    bounds = list(start_indices) + [len(vector)]
    return [np.asarray(vector)[bounds[i]:bounds[i + 1]] for i in range(len(start_indices))]


def pad_vectors(vector_list, fill_value=0.0, length=None):
    """Pad ragged vectors to a common length; returns (array, mask)."""
    vecs = [np.atleast_1d(v) for v in vector_list]
    if length is None:
        length = max(len(v) for v in vecs)
    out = np.full((len(vecs), length), fill_value, dtype=float)
    mask = np.zeros((len(vecs), length), dtype=bool)
    for i, v in enumerate(vecs):
        out[i, :len(v)] = v
        mask[i, :len(v)] = True
    return out, mask
