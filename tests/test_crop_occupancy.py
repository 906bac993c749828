import jax
import numpy as np
import pytest

import oracle
from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG, PipelineConfig
from pointcloud_obstacle_processing_tpu.ops.filters import passthrough_mask, crop_box_mask
from pointcloud_obstacle_processing_tpu.ops.occupancy import (
    crop_and_seed,
    grid_cell_index,
    grid_cell_xy,
    mark_obstacles,
)
from pointcloud_obstacle_processing_tpu.utils.scene import make_scene


CFG = REFERENCE_YAML_CONFIG.replace(max_points=8192)


def _random_cloud(rng, n=2000, nan_frac=0.02):
    pts = rng.uniform([-1, -1, -1], [5.5, 4.5, 1.0], size=(n, 3)).astype(np.float32)
    nan_idx = rng.random(n) < nan_frac
    pts[nan_idx, 0] = np.nan
    return pts


def test_crop_mask_matches_oracle(rng):
    pts = _random_cloud(rng)
    got = np.asarray(crop_box_mask(pts, CFG))
    want = oracle.crop_mask(pts, CFG)
    np.testing.assert_array_equal(got, want)


def test_passthrough_mask():
    pts = np.array([[0, 0, -0.6], [0, 0, 0.0], [0, 0, 0.25], [0, 0, 0.3]], np.float32)
    m = np.asarray(passthrough_mask(pts, "z", -0.5, 0.25))
    np.testing.assert_array_equal(m, [False, True, True, False])


def test_grid_cells_match_cpp_while_loops(rng):
    pts = rng.uniform(
        [CFG.x_min, CFG.y_min, CFG.z_min], [CFG.x_max, CFG.y_max, CFG.z_max], (3000, 3)
    ).astype(np.float32)
    got = np.asarray(grid_cell_index(pts, CFG))
    want = oracle.grid_cell_index(pts, CFG)
    np.testing.assert_array_equal(got, want)


def test_grid_cells_boundary_values():
    # exact block-boundary coordinates exercise the ceil-minus-one quirk
    b = CFG.block_size
    pts = np.array(
        [
            [CFG.x_max, CFG.y_min, 0.0],  # row 0, col 0
            [CFG.x_max - b, CFG.y_min + b, 0.0],
            [CFG.x_min, CFG.y_max, 0.0],
        ],
        np.float32,
    )
    got_col, got_row = (np.asarray(a) for a in grid_cell_xy(pts, CFG))
    for i, p in enumerate(pts):
        col, row = oracle.grid_cell_xy_scalar(
            np.float32(p[1]), np.float32(p[0]),
            np.float32(CFG.y_min), np.float32(CFG.x_max), np.float32(CFG.block_size),
        )
        assert (got_col[i], got_row[i]) == (col, row), p


def test_crop_and_seed_matches_oracle(rng):
    scene = make_scene(seed=3)
    pts = scene.points[:6000]
    cloud = Cloud.pad_to(pts, 8192)
    res = jax.jit(lambda c: crop_and_seed(c, CFG))(cloud)

    kept, counts, row_avgs, grid = oracle.crop_and_seed(pts, CFG)
    assert int(res.cloud.count()) == len(kept)
    np.testing.assert_array_equal(np.asarray(res.counts), counts)
    np.testing.assert_array_equal(np.asarray(res.row_averages), row_avgs)
    np.testing.assert_array_equal(np.asarray(res.hole_grid), grid)


def test_crater_cells_detected_as_holes():
    scene = make_scene(seed=7)
    cloud = Cloud.pad_to(scene.points, 131072)
    res = jax.jit(lambda c: crop_and_seed(c, REFERENCE_YAML_CONFIG))(cloud)
    hole = np.asarray(res.hole_grid) == 100
    # the crater center cell must be flagged as a hole
    for c in scene.crater_centers:
        col = int(np.ceil((c[1] - REFERENCE_YAML_CONFIG.y_min) / REFERENCE_YAML_CONFIG.block_size) - 1)
        row = int(np.ceil((REFERENCE_YAML_CONFIG.x_max - c[0]) / REFERENCE_YAML_CONFIG.block_size) - 1)
        assert hole[row, col], (row, col)


def test_mark_obstacles():
    pts = np.array([[1.0, 1.0, 0.1], [2.0, 2.0, 0.1]], np.float32)
    cloud = Cloud.pad_to(pts, 8)
    grid = np.zeros((CFG.grid_height, CFG.grid_width), np.int8)
    out = np.asarray(mark_obstacles(grid, cloud, CFG))
    idx = oracle.grid_cell_index(pts, CFG)
    flat = out.reshape(-1)
    assert all(flat[i] == 100 for i in idx)
    assert flat.sum() == 200
