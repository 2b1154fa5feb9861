from . import batch, ragged, sharding
from .batch import BatchedEISFitter, BatchedHybridFitter, BatchFitResult
from .ragged import BatchedRaggedFitter, RaggedFitResult

__all__ = ["batch", "ragged", "sharding", "BatchedEISFitter",
           "BatchedHybridFitter", "BatchFitResult", "BatchedRaggedFitter",
           "RaggedFitResult"]
