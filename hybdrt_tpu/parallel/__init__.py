from . import batch, sharding
from .batch import BatchedEISFitter

__all__ = ["batch", "sharding", "BatchedEISFitter"]
