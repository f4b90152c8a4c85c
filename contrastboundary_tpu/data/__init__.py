from .pipeline import voxelize, prepare_crop, pad_to_fixed_size
from .transforms import (
    Compose,
    random_rotate,
    random_scale,
    random_flip,
    random_jitter,
    random_shift,
    chromatic_auto_contrast,
    chromatic_translation,
    chromatic_jitter,
    hue_saturation_translation,
    random_drop_color,
    default_train_transform,
)
from .s3dis import S3DIS_NAMES, S3DISDataset, SyntheticSceneDataset, make_batch_iterator

__all__ = [
    "voxelize",
    "prepare_crop",
    "pad_to_fixed_size",
    "Compose",
    "random_rotate",
    "random_scale",
    "random_flip",
    "random_jitter",
    "random_shift",
    "chromatic_auto_contrast",
    "chromatic_translation",
    "chromatic_jitter",
    "hue_saturation_translation",
    "random_drop_color",
    "default_train_transform",
    "S3DIS_NAMES",
    "S3DISDataset",
    "SyntheticSceneDataset",
    "make_batch_iterator",
]
