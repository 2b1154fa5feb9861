"""EC-Lab ASCII parsing (reference hybdrt/dataload/sources/eclab_txt.py)."""
from typing import Tuple

from ..core import FileSource
from .eclab import process_fieldnames


def get_read_kwargs(text: str, source: FileSource) -> Tuple[dict, dict]:
    nh_str = "Nb header lines :"
    nh_index = text.find(nh_str)
    nh = int(text[nh_index + len(nh_str):].split("\n")[0].strip()) if nh_index > 0 else 0

    header_row = text.split("\n")[nh - 1]
    sep = "\t" if len(header_row.split("\t")) > 1 else ","
    names = header_row.split(sep)
    names = [n if n.strip() != "" else f"unnamed_{i}/au" for i, n in enumerate(names)]

    prefixes, base_units, new_names = process_fieldnames(names)

    read_kw = dict(sep=sep, skiprows=nh, names=names, encoding_errors="ignore")
    unit_kw = dict(base_units=base_units, unit_prefixes=prefixes, new_names=new_names)
    return read_kw, unit_kw


Z_HEADER_MAP = {
    "freq/Hz": "freq", "Re(Z)/Ohm": "z_re", "-Im(Z)/Ohm": "z_im",
    "|Z|/Ohm": "z_mod", "Phase(Z)/deg": "z_phase", "time/s": "time",
    "<I>/A": "i", "<Ewe>/V": "v", "I/A": "i", "Ewe/V": "v",
}

CHRONO_HEADER_MAP = {
    "time/s": "time", "<Ewe>/V": "v", "<I>/A": "i", "Ewe/V": "v", "I/A": "i",
}

# EC-Lab records -Im(Z); standard convention stores Im(Z)
INVERT_Z_IM = True
