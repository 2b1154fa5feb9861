"""ZPlot ASCII parsing (reference hybdrt/dataload/sources/zplot.py)."""
from typing import Tuple

from ..core import FileSource


def get_read_kwargs(text: str, source: FileSource) -> Tuple[dict, dict]:
    data_index = text.find("End Comments")
    pretxt = text[:data_index]
    names = pretxt.splitlines()[-2].strip().split("\t")
    skiprows = len(pretxt.splitlines())
    read_kw = dict(sep="\t", skiprows=skiprows, header=None, names=names)
    return read_kw, {}


Z_HEADER_MAP = {"Freq(Hz)": "freq", "Z'(a)": "z_re", "Z''(b)": "z_im"}
CHRONO_HEADER_MAP = {}
INVERT_Z_IM = False
