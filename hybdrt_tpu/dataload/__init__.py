from .reader import read_eis, read_chrono
from .datatypes import ZData, YData, ChronoData
from .core import FileSource, detect_file_source, extract_timestamp

__all__ = ["read_eis", "read_chrono", "ZData", "YData", "ChronoData", "FileSource",
           "detect_file_source", "extract_timestamp"]
