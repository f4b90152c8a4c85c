from .segmentation import cross_entropy
from .contrast import ContrastConfig, subscene_labels, cbl_stage_loss, cbl_loss

__all__ = [
    "cross_entropy",
    "ContrastConfig",
    "subscene_labels",
    "cbl_stage_loss",
    "cbl_loss",
]
