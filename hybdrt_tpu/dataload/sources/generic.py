"""Generic delimited exports: plain .csv/.tsv files whose first line is a
self-describing header (e.g. EC-Lab Modulo Batt cycle exports).

The reference cannot load these through its readers — its csv fallback is
commented out (reference hybdrt/dataload/reader.py:268-274) and its webinar
processes such files manually with pandas. Here they go through the standard
read_eis / read_chrono path: the header is sniffed for the separator, and
columns with SI-prefixed unit suffixes (I/mA, ...) are rescaled to base
units exactly like EC-Lab ASCII files."""
from typing import Tuple

from ..core import FileSource
from .eclab import process_fieldnames


def get_read_kwargs(text: str, source: FileSource) -> Tuple[dict, dict]:
    header_row = text.partition("\n")[0]
    sep = "\t" if len(header_row.split("\t")) > 1 else ","
    names = [n.strip() for n in header_row.split(sep)]
    names = [n if n != "" else f"unnamed_{i}/au" for i, n in enumerate(names)]
    prefixes, base_units, new_names = process_fieldnames(names)
    read_kw = dict(sep=sep, skiprows=1, names=names, encoding_errors="ignore")
    unit_kw = dict(base_units=base_units, unit_prefixes=prefixes,
                   new_names=new_names)
    return read_kw, unit_kw


Z_HEADER_MAP = {
    "freq/Hz": "freq", "Frequency/Hz": "freq",
    "Re(Z)/Ohm": "z_re", "-Im(Z)/Ohm": "z_im",
    "|Z|/Ohm": "z_mod", "Phase(Z)/deg": "z_phase", "time/s": "time",
    "<I>/A": "i", "<Ewe>/V": "v", "I/A": "i", "Ewe/V": "v",
}

CHRONO_HEADER_MAP = {
    "time/s": "time", "<Ewe>/V": "v", "<I>/A": "i", "Ewe/V": "v", "I/A": "i",
}

# Column convention follows EC-Lab (-Im(Z) recorded); standard stores Im(Z)
INVERT_Z_IM = True
