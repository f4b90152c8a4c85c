from .knn import knn, pairwise_sqdist
from .sampling import fps, bucket_fps, serialized_order, morton_code
from .interpolate import interpolate, nearest_interpolate, interpolation_weights
from .voxel import voxel_grid_subsample, voxelize_indices
from .pyramid import PyramidSpec, Pyramid, build_pyramid

__all__ = [
    "knn",
    "pairwise_sqdist",
    "fps",
    "bucket_fps",
    "serialized_order",
    "morton_code",
    "interpolate",
    "nearest_interpolate",
    "interpolation_weights",
    "voxel_grid_subsample",
    "voxelize_indices",
    "PyramidSpec",
    "Pyramid",
    "build_pyramid",
]
