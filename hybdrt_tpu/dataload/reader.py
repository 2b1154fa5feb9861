"""Typed file readers for EIS and chrono data (reference hybdrt/dataload/reader.py)."""
import warnings
from pathlib import Path
from typing import Optional, Tuple, Union

import pandas as pd

from .core import (FileSource, detect_file_source, detect_time_column,
                   extract_timestamp, get_extension, read_with_source)
from .datatypes import ChronoData, ZData
from .srcconvert import reader_kwarg_gen, standardize_chrono_data, standardize_z_data
from ..utils import units

FilePath = Union[str, Path]


def read_eis(file: FilePath, source: Optional[FileSource] = None, standardize=True,
             as_dataframe=False, with_timestamp=False, return_source=False,
             return_tuple=False):
    """Read an impedance file into ZData (or a DataFrame / (freq, z) tuple)."""
    if source is None:
        source = detect_file_source(file)
    convert = standardize and not as_dataframe
    df, source = _read_generic(file, source,
                               with_timestamp=(with_timestamp and not convert))
    if standardize:
        df = standardize_z_data(df, source=source)
    if not convert:
        data = df
    else:
        ts = extract_timestamp(file, source) if with_timestamp else None
        data = ZData.from_dataframe(df, timestamp=ts)
        if return_tuple:
            data = data.fx
    return (data, source) if return_source else data


def read_chrono(file: FilePath, source: Optional[FileSource] = None, standardize=True,
                as_dataframe=False, with_timestamp=False, return_source=False,
                return_tuple=False):
    """Read a chrono/IV file into ChronoData (or a DataFrame / (t, i, v) tuple)."""
    if source is None:
        source = detect_file_source(file)
    convert = standardize and not as_dataframe
    df, source = _read_generic(file, source,
                               with_timestamp=(with_timestamp and not convert))
    if standardize:
        df = standardize_chrono_data(df, source=source)
    if not convert:
        data = df
    else:
        ts = extract_timestamp(file, source) if with_timestamp else None
        data = ChronoData.from_dataframe(df, timestamp=ts)
        if return_tuple:
            data = data.tiv
    return (data, source) if return_source else data


def _read_generic(file: FilePath, source=None, with_timestamp=True,
                  **kwargs) -> Tuple[pd.DataFrame, FileSource]:
    if get_extension(file).lower() == "mpr":
        from .sources.eclab_mpr import read_mpr
        mpr = read_mpr(file, unscale=True)
        data = pd.DataFrame(mpr.data)
        source = FileSource.ECLAB_MPR
    else:
        txt, source = read_with_source(file, source)
        read_kw, unit_kw = reader_kwarg_gen(source)(txt, source)
        read_kw.update(kwargs)
        data = pd.read_csv(file, **read_kw)
        if unit_kw:
            data = unscale_data(data, unit_kw["unit_prefixes"], unit_kw["new_names"])

    if with_timestamp:
        timestamp = extract_timestamp(file, source)
        time_col = detect_time_column(list(data.columns), source)
        if timestamp is not None and time_col is not None:
            data["timestamp"] = pd.Timestamp(timestamp) \
                + pd.to_timedelta(data[time_col].astype(float), unit="s")
        else:
            warnings.warn(f"Could not load timestamps for file {file}")
    return data, source


def unscale_data(data: pd.DataFrame, prefixes, new_names):
    """Rescale all columns to base units and rename accordingly."""
    if len(prefixes) != len(new_names) or len(prefixes) != len(data.columns):
        raise ValueError("Number of columns, prefixes, and new_names must be equal")
    old_names = list(data.columns)
    scaled = data.copy()
    for i, prefix in enumerate(prefixes):
        if prefix is not None:
            up = units.UnitPrefix(prefix)
            scaled[old_names[i]] = up.scaled_to_raw(data[old_names[i]])
    return scaled.rename(dict(zip(old_names, new_names)), axis=1)
