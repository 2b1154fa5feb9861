"""Legacy file-loading API (reference hybdrt/fileload.py).

Thin compatibility layer over the typed ``hybdrt_tpu.dataload`` stack: the
reference's older functions returned DataFrames/tuples; these delegate to the
modern readers and convert.
"""
import numpy as np
import pandas as pd

from .dataload import reader as _reader
from .dataload.core import FileSource, detect_file_source, extract_timestamp


def get_file_source(file):
    """Detect the originating software of a data file."""
    return detect_file_source(file)


def get_timestamp(file):
    return extract_timestamp(file)


def check_source(source):
    """Validate a source identifier against the known vendor formats
    (reference fileload.py)."""
    known = [s.value for s in FileSource]
    if str(source) not in known:
        raise ValueError(f"Unrecognized data source {source}. "
                         f"Recognized sources: {', '.join(known)}")


def read_with_source(file, source=None):
    """Raw (unstandardized) DataFrame + detected source for a data file
    (reference fileload.py; deprecated there in favor of dataload)."""
    if source is None:
        source = detect_file_source(file)
    else:
        check_source(source)
        source = FileSource(str(source))
    return _reader._read_generic(file, source, with_timestamp=False)


def get_time_offset(df, df_ref):
    """Seconds between the first timestamps of two standardized DataFrames
    (reference fileload.py)."""
    return (df.loc[0, "timestamp"] - df_ref.loc[0, "timestamp"]).total_seconds()


def read_notes(file, parse=True):
    """The NOTES block of a Gamry DTA file, optionally parsed into a dict
    (reference fileload.py)."""
    import re
    txt = read_txt(file)
    start = txt.find("NOTES")
    if start == -1:
        return {} if parse else ""
    start += txt[start:].find("\n") + 2
    match = re.search(r"\n(?!\t)", txt[start:])
    notes = txt[start:start + match.start(0)] if match else txt[start:]
    if parse:
        pairs = [line.strip().split("\t", 1) for line in notes.split("\n")
                 if "\t" in line]
        return {k: v for k, v in pairs}
    return notes


def read_eis(file, source=None, return_tuple=False, warn=True):
    """Read an EIS file; returns a standardized DataFrame or a (freq, z) tuple."""
    zdata = _reader.read_eis(file, source=source)
    if return_tuple:
        return zdata.fx
    return zdata.as_dataframe()


def read_chrono(file, source=None, return_tuple=False, warn=True):
    """Read a chrono file; returns a standardized DataFrame or (t, i, v) tuple."""
    cdata = _reader.read_chrono(file, source=source)
    if return_tuple:
        return cdata.tiv
    return cdata.as_dataframe()


def get_eis_tuple(df, min_freq=None, max_freq=None):
    """(freq, z) tuple from a standardized EIS DataFrame (reference fileload.py:599)."""
    freq = df["freq"].values.copy()
    z = df["z_re"].values + 1j * df["z_im"].values
    if min_freq is not None:
        index = freq >= min_freq
        freq, z = freq[index], z[index]
    if max_freq is not None:
        index = freq <= max_freq
        freq, z = freq[index], z[index]
    return freq, z


def get_chrono_tuple(df, start_time=None, end_time=None):
    """(times, i, v) tuple from a standardized chrono DataFrame
    (reference fileload.py:620)."""
    times = df["time"].values.copy()
    i_signal = df["i"].values.copy()
    v_signal = df["v"].values.copy()
    if start_time is not None:
        index = times >= start_time
        times, i_signal, v_signal = times[index], i_signal[index], v_signal[index]
    if end_time is not None:
        index = times <= end_time
        times, i_signal, v_signal = times[index], i_signal[index], v_signal[index]
    return times, i_signal, v_signal


def get_hybrid_tuple(chrono_data, eis_data, min_freq=None, max_freq=None,
                     start_time=None, end_time=None):
    """Assemble the (times, i, v, freq, z) tuple for hybrid fits, with
    optional frequency/time windows (reference fileload.py:666)."""
    if isinstance(chrono_data, pd.DataFrame):
        chrono_tuple = get_chrono_tuple(chrono_data, start_time=start_time,
                                        end_time=end_time)
    else:
        chrono_tuple = chrono_data
    if isinstance(eis_data, pd.DataFrame):
        eis_tuple = get_eis_tuple(eis_data, min_freq=min_freq,
                                  max_freq=max_freq)
    else:
        eis_tuple = eis_data
    return (*chrono_tuple, *eis_tuple)


def concatenate_eis(dfs):
    """Concatenate standardized EIS DataFrames sorted by descending frequency."""
    df = pd.concat(dfs, ignore_index=True)
    return df.sort_values("freq", ascending=False).reset_index(drop=True)


def concatenate_chrono(dfs, shift_times=True):
    """Concatenate chrono DataFrames, optionally shifting times to be
    sequential across files."""
    out = []
    t_offset = 0.0
    for df in dfs:
        df = df.copy()
        if shift_times and out:
            dt = np.median(np.diff(df["time"].values)) if len(df) > 1 else 1.0
            df["time"] = df["time"] - df["time"].values[0] + t_offset + dt
        t_offset = df["time"].values[-1]
        out.append(df)
    return pd.concat(out, ignore_index=True)


# Reference-compatible aliases and conveniences (reference fileload.py)
concatenate_eis_data = concatenate_eis
concatenate_chrono_data = concatenate_chrono


def get_custom_file_time(file):
    """Epoch timestamp (float, UTC) from a pygamry-generated file's
    tab-separated DATE/TIME header lines, fractional seconds preserved
    (reference fileload.py:103-128)."""
    import calendar
    import time as _time
    txt = read_txt(file)

    def field(tag):
        start = txt.find(tag)
        if start < 0:
            raise ValueError(
                f"{file}: no {tag} header line — not a pygamry-format file?")
        end = txt.find("\n", start)
        line = txt[start:end if end >= 0 else len(txt)]
        parts = line.split("\t")
        if len(parts) < 3:
            raise ValueError(
                f"{file}: malformed {tag} header line {line!r} "
                f"(expected at least 3 tab-separated fields)")
        return parts[2]

    time_str, _, frac = field("TIME").partition(".")
    st = _time.strptime(field("DATE") + " " + time_str, "%m/%d/%Y %H:%M:%S")
    return float(calendar.timegm(st)) + float("0." + (frac or "0"))


def get_extension(file):
    """File extension without the dot (reference fileload.py)."""
    from pathlib import Path
    return Path(file).suffix.lstrip(".")


def read_txt(file):
    """Raw text of a data file (reference fileload.py read_txt)."""
    with open(file, "r", errors="replace") as f:
        return f.read()


def iv_from_eis(data):
    """DC current/voltage operating point from an EIS file or frame
    (reference fileload.py:703). A file path is read as the RAW vendor
    table (standardization strips the Idc/Vdc columns this needs)."""
    import pandas as pd
    if not isinstance(data, pd.DataFrame):
        data, _ = read_generic(data)
    cols = {c.lower(): c for c in data.columns}
    tcol = next((cols[c] for c in ("elapsed", "time", "t") if c in cols), None)
    i_col = cols.get("idc")
    v_col = cols.get("vdc")
    if i_col is None or v_col is None or tcol is None:
        raise ValueError("EIS data has no Time/Idc/Vdc columns")
    return data[tcol].values, data[i_col].values, data[v_col].values


def read_generic(file, source=None, **kwargs):
    """Raw table DataFrame + source for any supported vendor file
    (reference fileload.py read_generic; delegates to dataload)."""
    return _reader._read_generic(file, source, with_timestamp=False, **kwargs)


def read_mpr(file):
    """EC-Lab binary .mpr file as a DataFrame (reference fileload.py)."""
    import pandas as pd
    from .dataload.sources.eclab_mpr import read_mpr as _read_mpr
    return pd.DataFrame(_read_mpr(file, unscale=True).data)


def find_time_column(data, source=None):
    """Name of the elapsed-time column in a raw vendor DataFrame
    (reference fileload.py)."""
    candidates = ["Time", "T", "time", "time/s", "elapsed"]
    for c in candidates:
        if c in data.columns:
            return c
    raise ValueError(f"No time column found among {candidates}")


def append_timestamp(file, data, source=None, warn=True):
    """Add a point-by-point 'timestamp' column (file start + elapsed time)
    to a raw vendor DataFrame, in place (reference fileload.py)."""
    from datetime import timedelta
    dt = get_timestamp(file)
    col = find_time_column(data, source)
    data["timestamp"] = [dt + timedelta(seconds=float(t)) for t in data[col]]
    return data


def read_curve(file):
    """Generic CURVE table from a Gamry DTA file (reference fileload.py)."""
    import io
    import pandas as pd
    txt = read_txt(file)
    cidx = txt.find("CURVE\tTABLE")
    if cidx == -1:
        raise ValueError("No CURVE TABLE found in file")
    table = txt[cidx:]
    lines = table.split("\n")
    # Header and data rows are tab-indented: first field is empty
    header = [h for h in lines[1].split("\t") if h.strip()]
    data_txt = "\n".join(l for l in lines[3:] if l.strip())
    df = pd.read_csv(io.StringIO(data_txt), sep="\t", header=None,
                     names=["_lead"] + header, engine="python")
    return df.drop(columns=["_lead", "Pt"], errors="ignore")
