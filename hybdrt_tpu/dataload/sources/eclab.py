"""EC-Lab fieldname/unit parsing shared by txt and mpr sources
(reference hybdrt/dataload/sources/eclab.py)."""
from typing import List, Union

from ...utils import units


def split_fieldname(fieldname: str):
    """Split 'voltage/mV' -> ('voltage', 'mV'); no unit -> (name, None)."""
    index = fieldname[::-1].find("/")
    if index == -1:
        return fieldname, None
    index = -(index + 1)
    return fieldname[:index], fieldname[index + 1:]


def split_unit(unit: Union[str, None]):
    if unit is None:
        return None, None
    if len(unit) > 1 and unit[0] in units.ALL_PREFIXES:
        return unit[0], unit[1:]
    return None, unit


def process_fieldnames(fieldnames: List[str]):
    """Return (prefixes, base_units, renamed fieldnames with base units)."""
    names, unit_list = zip(*[split_fieldname(f) for f in fieldnames])
    prefixes, base_units = zip(*[split_unit(u) for u in unit_list])
    new_names = [f"{n}/{b}" for n, b in zip(names, base_units)]
    return list(prefixes), list(base_units), new_names
