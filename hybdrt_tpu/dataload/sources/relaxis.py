"""RelaxIS export parsing (reference hybdrt/dataload/sources/relaxis.py)."""
from typing import Tuple

from ..core import FileSource


def get_read_kwargs(text: str, source: FileSource) -> Tuple[dict, dict]:
    header_index = text.find("\nData: ")
    skiprows = len(text[:header_index].split("\n")) + 2
    header = text[header_index + 1:].split("\n")[0].split("\t")
    read_kw = dict(sep="\t", skiprows=skiprows, header=None, names=header)
    return read_kw, {}


Z_HEADER_MAP = {
    "Data: Frequency": "freq", "Data: Z'": "z_re", "Data: Z''": "z_im",
    "Data: |Z|": "z_mod", "Data: Theta (Z)": "z_phase",
}
CHRONO_HEADER_MAP = {}
INVERT_Z_IM = False
