"""File-source detection and timestamp extraction
(reference hybdrt/dataload/core.py)."""
from datetime import datetime
from enum import StrEnum, auto
from pathlib import Path
from typing import List, Optional, Union

FilePath = Union[str, Path]


class FileSource(StrEnum):
    GAMRY_DTA = auto()
    ZPLOT = auto()
    ECLAB_TXT = auto()
    ECLAB_MPR = auto()
    ECLAB_MPT = auto()
    RELAXIS = auto()
    CUSTOM = auto()

    @property
    def software(self):
        return self.name.split("_")[0]


EXT_SOURCE_MAP = {
    "dta": FileSource.GAMRY_DTA,
    "mpr": FileSource.ECLAB_MPR,
    "mpt": FileSource.ECLAB_MPT,
    "z": FileSource.ZPLOT,
}

HEADER_SOURCE_MAP = {
    "EXPLAIN": FileSource.GAMRY_DTA,
    "EC-Lab ASCII FILE": FileSource.ECLAB_TXT,
    "ZPLOT2 ASCII": FileSource.ZPLOT,
    "RelaxIS": FileSource.RELAXIS,
}


def get_extension(file: FilePath) -> str:
    parts = Path(file).name.split(".")
    if len(parts) == 1:
        raise ValueError(f"No extension found for file: {file}")
    return parts[-1]


def read_txt(file: FilePath) -> str:
    try:
        with open(file, "r") as f:
            return f.read()
    except UnicodeDecodeError:
        with open(file, "r", encoding="latin1") as f:
            return f.read()


def detect_source_from_ext(file: FilePath) -> Optional[FileSource]:
    return EXT_SOURCE_MAP.get(get_extension(file).lower())


def detect_source_from_text(text: str) -> Optional[FileSource]:
    header = text.split("\n")[0]
    source = HEADER_SOURCE_MAP.get(header)
    if source is None:
        # Version numbers may vary (e.g. "RelaxIS 3.0") — match first word
        word = header.split(" ")[0]
        source = {k.split(" ")[0]: v for k, v in HEADER_SOURCE_MAP.items()}.get(word)
    return source


def detect_file_source(file: FilePath) -> Optional[FileSource]:
    source = detect_source_from_ext(file)
    if source is None:
        source = detect_source_from_text(read_txt(file))
    if source is None:
        raise ValueError(f"Could not detect source for {file}")
    return source


def read_with_source(file: FilePath, source: Optional[FileSource] = None):
    text = read_txt(file)
    if source is None:
        source = detect_source_from_ext(file)
        if source is None:
            source = detect_source_from_text(text)
    return text, source


def get_line(text: str, pattern: str) -> str:
    start = text.find(pattern)
    end = text[start:].find("\n") + start
    return text[start:end]


def detect_time_column(columns: List[str], source) -> Optional[str]:
    if source == FileSource.GAMRY_DTA or source is None:
        lower = [c.lower() for c in columns]
        for cand in ("time", "t"):
            if cand in lower:
                return columns[lower.index(cand)]
        return None
    if source == FileSource.ECLAB_TXT:
        return "time/s"
    return None


def extract_timestamp(file: FilePath, source: Optional[FileSource] = None):
    """Experiment start timestamp from the file header."""
    if get_extension(file).lower() == "mpr":
        from .sources.eclab_mpr import read_mpr
        return read_mpr(file).timestamp
    txt, source = read_with_source(file, source)
    if source == FileSource.GAMRY_DTA:
        date = get_line(txt, "DATE").split("\t")[2]
        time_txt = get_line(txt, "TIME").split("\t")[2]
        return datetime.strptime(f"{date} {time_txt}", "%m/%d/%Y %H:%M:%S.%f")
    if source == FileSource.ZPLOT:
        date = get_line(txt, "Date").split()[1]
        time_txt = get_line(txt, "Time").split()[1]
        return datetime.strptime(f"{date} {time_txt}", "%m-%d-%Y %H:%M:%S")
    if source == FileSource.ECLAB_TXT:
        find_str = "Acquisition started on :"
        index = txt.find(find_str) + len(find_str)
        timestr = txt[index:].splitlines()[0].strip()
        return datetime.strptime(timestr, "%m/%d/%Y %H:%M:%S.%f")
    return None
