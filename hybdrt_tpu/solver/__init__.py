from . import hypers, qphb, fitcore

__all__ = ["hypers", "qphb", "fitcore"]
