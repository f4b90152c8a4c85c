from .gather import batch_gather, shadow_gather, shadow_gather_labels
from .masking import (
    EPS,
    INF,
    masked_softmax,
    masked_mean,
    masked_max,
    boundary_mask,
)

__all__ = [
    "batch_gather",
    "shadow_gather",
    "shadow_gather_labels",
    "EPS",
    "INF",
    "masked_softmax",
    "masked_mean",
    "masked_max",
    "boundary_mask",
]
