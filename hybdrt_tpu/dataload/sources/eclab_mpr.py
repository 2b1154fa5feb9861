"""Binary EC-Lab .mpr reading via the optional galvani package
(reference hybdrt/dataload/sources/eclab_mpr.py)."""
from pathlib import Path
from typing import Union

import numpy as np

from ...utils import units
from .eclab import process_fieldnames

try:
    from galvani.BioLogic import MPRfile
    _galvani_installed = True
except ImportError:
    _galvani_installed = False


def read_mpr(file: Union[str, Path], unscale: bool = False):
    """Read an EC-Lab .mpr file; optionally rescale all fields to base units."""
    if not _galvani_installed:
        raise ModuleNotFoundError(
            "The galvani package must be installed to read BioLogic .mpr files")
    mpr = MPRfile(str(Path(file)))
    if unscale:
        mpr.data = unscale_data(mpr.data)
    return mpr


def unscale_data(data: np.ndarray):
    """Rescale all fields of a structured array to base units (mV -> V, ...)."""
    fieldnames = list(data.dtype.fields.keys())
    prefixes, base_units, new_fieldnames = process_fieldnames(fieldnames)
    scaled = data.copy()
    for i, fieldname in enumerate(fieldnames):
        if prefixes[i] is not None:
            up = units.UnitPrefix(prefixes[i])
            scaled[fieldname] = up.scaled_to_raw(scaled[fieldname])
    scaled.dtype = np.dtype(dict(zip(new_fieldnames, data.dtype.fields.values())))
    return scaled
