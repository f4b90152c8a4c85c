from .blocks import (
    PointTransformerLayer,
    PointTransformerBlock,
    TransitionDown,
    TransitionUp,
    MLPTower,
)
from .pointtransformer import PointTransformerSeg, ModelOutput

__all__ = [
    "PointTransformerLayer",
    "PointTransformerBlock",
    "TransitionDown",
    "TransitionUp",
    "MLPTower",
    "PointTransformerSeg",
    "ModelOutput",
]
