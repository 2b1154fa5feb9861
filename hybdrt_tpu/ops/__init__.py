from . import basis, lookup, mat1d, phasance, qp

__all__ = ["basis", "lookup", "mat1d", "phasance", "qp"]
