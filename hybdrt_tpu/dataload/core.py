"""Vendor file-source registry: detection and header-metadata extraction.

Table-driven redesign of the reference's if-chain logic (reference
hybdrt/dataload/core.py): each supported instrument format is described by a
single ``_SourceSpec`` row — extensions, first-line header tag, timestamp
regex/format, and time-column names — and every public function is a generic
lookup over the registry. Adding a vendor means adding one row.
"""
import re
from dataclasses import dataclass, field
from datetime import datetime
from enum import StrEnum, auto
from pathlib import Path
from typing import List, Optional, Tuple, Union

FilePath = Union[str, Path]


class FileSource(StrEnum):
    GAMRY_DTA = auto()
    ZPLOT = auto()
    ECLAB_TXT = auto()
    ECLAB_MPR = auto()
    ECLAB_MPT = auto()
    RELAXIS = auto()
    GENERIC = auto()
    CUSTOM = auto()

    @property
    def software(self):
        return self.name.split("_")[0]


@dataclass(frozen=True)
class _SourceSpec:
    """Everything the loader needs to know about one vendor format."""
    source: FileSource
    extensions: Tuple[str, ...] = ()
    header_tag: Optional[str] = None      # expected first line (or first word)
    match_first_word: bool = False        # tag carries a version suffix
    # Timestamp: each regex contributes one captured group; the joined groups
    # are parsed with timestamp_fmt
    timestamp_res: Tuple[str, ...] = ()
    timestamp_fmt: Optional[str] = None
    time_columns: Tuple[str, ...] = ()    # candidate data time columns (lowercased)


_REGISTRY: Tuple[_SourceSpec, ...] = (
    _SourceSpec(
        FileSource.GAMRY_DTA,
        extensions=("dta",),
        header_tag="EXPLAIN",
        timestamp_res=(r"DATE\t[^\t\n]*\t([^\t\n]+)", r"TIME\t[^\t\n]*\t([^\t\n]+)"),
        timestamp_fmt="%m/%d/%Y %H:%M:%S.%f",
        time_columns=("time", "t"),
    ),
    _SourceSpec(
        FileSource.ZPLOT,
        extensions=("z",),
        header_tag="ZPLOT2 ASCII",
        timestamp_res=(r"Date\s+(\S+)", r"Time\s+(\S+)"),
        timestamp_fmt="%m-%d-%Y %H:%M:%S",
    ),
    _SourceSpec(
        FileSource.ECLAB_TXT,
        header_tag="EC-Lab ASCII FILE",
        timestamp_res=(r"Acquisition started on :\s*([^\n]+)",),
        timestamp_fmt="%m/%d/%Y %H:%M:%S.%f",
        time_columns=("time/s",),
    ),
    _SourceSpec(FileSource.ECLAB_MPR, extensions=("mpr",)),
    _SourceSpec(FileSource.ECLAB_MPT, extensions=("mpt",)),
    _SourceSpec(FileSource.RELAXIS, header_tag="RelaxIS", match_first_word=True),
    # Plain delimited exports with a self-describing header row (e.g. EC-Lab
    # Modulo Batt csv); the reference has no reader for these
    _SourceSpec(FileSource.GENERIC, extensions=("csv", "tsv"),
                time_columns=("time/s", "time")),
)

_SPEC_BY_SOURCE = {spec.source: spec for spec in _REGISTRY}
# Kept as public names for compatibility with the reference API surface
EXT_SOURCE_MAP = {ext: spec.source for spec in _REGISTRY for ext in spec.extensions}
HEADER_SOURCE_MAP = {spec.header_tag: spec.source
                     for spec in _REGISTRY if spec.header_tag}


# ------------------------------------------------------------------
# File reading / source detection
# ------------------------------------------------------------------
def get_extension(file: FilePath) -> str:
    suffix = Path(file).suffix
    if not suffix:
        raise ValueError(f"No extension found for file: {file}")
    return suffix[1:]


def read_txt(file: FilePath) -> str:
    for encoding in (None, "latin1"):
        try:
            return Path(file).read_text(encoding=encoding)
        except UnicodeDecodeError:
            continue
    raise UnicodeDecodeError("latin1", b"", 0, 1, f"Could not decode {file}")


def detect_source_from_ext(file: FilePath) -> Optional[FileSource]:
    return EXT_SOURCE_MAP.get(get_extension(file).lower())


def detect_source_from_text(text: str) -> Optional[FileSource]:
    header = text.partition("\n")[0]
    for spec in _REGISTRY:
        if spec.header_tag is None:
            continue
        candidate = header.split(" ")[0] if spec.match_first_word else header
        tag = (spec.header_tag.split(" ")[0] if spec.match_first_word
               else spec.header_tag)
        if candidate == tag:
            return spec.source
    return None


def detect_file_source(file: FilePath) -> FileSource:
    source = detect_source_from_ext(file) or detect_source_from_text(read_txt(file))
    if source is None:
        raise ValueError(f"Could not detect source for {file}")
    return source


def read_with_source(file: FilePath, source: Optional[FileSource] = None):
    """Read once, detect once."""
    text = read_txt(file)
    if source is None:
        source = detect_source_from_ext(file) or detect_source_from_text(text)
    return text, source


# ------------------------------------------------------------------
# Header metadata
# ------------------------------------------------------------------
def get_line(text: str, pattern: str) -> str:
    """First line of ``text`` containing ``pattern``."""
    start = text.find(pattern)
    return text[start:].partition("\n")[0]


def detect_time_column(columns: List[str], source) -> Optional[str]:
    spec = _SPEC_BY_SOURCE.get(source)
    candidates = spec.time_columns if spec else ()
    if source is None or source == FileSource.GAMRY_DTA:
        candidates = _SPEC_BY_SOURCE[FileSource.GAMRY_DTA].time_columns
    lower = [c.lower() for c in columns]
    for cand in candidates:
        if cand in lower:
            return columns[lower.index(cand)]
        if cand in columns:
            return cand
    # EC-Lab declares its column name exactly
    if source == FileSource.ECLAB_TXT:
        return "time/s"
    return None


def extract_timestamp(file: FilePath,
                      source: Optional[FileSource] = None) -> Optional[datetime]:
    """Experiment start time from the file header (None if the format does
    not carry one)."""
    if get_extension(file).lower() == "mpr":
        from .sources.eclab_mpr import read_mpr
        return read_mpr(file).timestamp
    text, source = read_with_source(file, source)
    spec = _SPEC_BY_SOURCE.get(source)
    if spec is None or not spec.timestamp_res:
        return None
    pieces = []
    for pattern in spec.timestamp_res:
        m = re.search(pattern, text)
        if m is None:
            return None
        pieces.append(m.group(1).strip())
    stamp = " ".join(pieces)
    try:
        return datetime.strptime(stamp, spec.timestamp_fmt)
    except ValueError:
        # Vendors emit times with or without fractional seconds
        alt = spec.timestamp_fmt.replace(".%f", "") if ".%f" in spec.timestamp_fmt \
            else spec.timestamp_fmt.replace("%S", "%S.%f")
        return datetime.strptime(stamp, alt)
