from .metrics import (
    confusion_matrix,
    metrics_from_confusion,
    AverageMeter,
)

__all__ = ["confusion_matrix", "metrics_from_confusion", "AverageMeter"]
