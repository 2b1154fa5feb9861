"""Vendor -> standard column conversion (reference hybdrt/dataload/srcconvert.py)."""
import pandas as pd

from .core import FileSource
from .sources import eclab_txt, gamry, generic, relaxis, zplot


def get_module(source: FileSource):
    return {
        "GAMRY": gamry,
        "ECLAB": eclab_txt,
        "RELAXIS": relaxis,
        "ZPLOT": zplot,
        "GENERIC": generic,
    }.get(source.software)


def reader_kwarg_gen(source: FileSource):
    return get_module(source).get_read_kwargs


def standardize_z_data(data: pd.DataFrame, source: FileSource):
    module = get_module(source)
    data = data.rename(module.Z_HEADER_MAP, axis=1)
    if module.INVERT_Z_IM and "z_im" in list(data.columns):
        data["z_im"] *= -1
    return data


def standardize_chrono_data(data: pd.DataFrame, source: FileSource):
    module = get_module(source)
    return data.rename(module.CHRONO_HEADER_MAP, axis=1)
