from . import array, chrono, eis, stats, validation

__all__ = ["array", "chrono", "eis", "stats", "validation"]
