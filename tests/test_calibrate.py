"""Static-cap calibration (data/calibrate.py) — the reference's
calibrate_batches/calibrate_neighbors criterion on fabricated clouds."""
import numpy as np

from contrastboundary_tpu.data.calibrate import (
    calibrate_crop_points,
    calibrate_neighborhood_limits,
)


def _clouds(n=3, pts=4000, extent=4.0, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.rand(pts, 3).astype(np.float32) * extent for _ in range(n)]


def test_neighborhood_limits_match_density():
    clouds = _clouds()
    radii = [0.2, 0.4]
    limits = calibrate_neighborhood_limits(
        clouds, radii, voxel_sizes=[0.0, 0.1], keep_ratio=0.8
    )
    assert len(limits) == 2
    # uniform density ~62.5 pts/m3: expected counts ~ rho * 4/3 pi r^3
    # (boundary effects push the percentile below the interior mean)
    exp0 = 62.5 * 4 / 3 * np.pi * 0.2**3
    assert 0.3 * exp0 < limits[0] < 3 * exp0
    # a larger radius on a coarser level still yields a finite cap
    assert 1 <= limits[1] <= 256
    # monotone in keep_ratio
    lo = calibrate_neighborhood_limits(
        clouds, radii, voxel_sizes=[0.0, 0.1], keep_ratio=0.5
    )
    assert all(a <= b for a, b in zip(lo, limits))


def test_crop_points_power_of_two_and_scales_with_radius():
    clouds = _clouds()
    small = calibrate_crop_points(clouds, in_radius=0.5, voxel_size=0.05)
    large = calibrate_crop_points(clouds, in_radius=1.5, voxel_size=0.05)
    for v in (small, large):
        assert v & (v - 1) == 0  # power of two
    assert large > small


def test_calibrate_cli_mode(tmp_path):
    from contrastboundary_tpu.main import build_dataset, calibrate
    from contrastboundary_tpu.config import load_config

    cfg = load_config(
        "synthetic_tiny", "data.num_rooms:2;data.points_per_room:20000"
    )
    msgs = []

    class L:
        def info(self, m):
            msgs.append(m)

    n = calibrate(cfg, L(), max_clouds=2)
    assert n & (n - 1) == 0
    assert any("n_points" in m for m in msgs)
