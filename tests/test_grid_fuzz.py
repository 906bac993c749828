"""Fuzz the grid-cell math against the literal C++ while-loop port across
random crop boxes and block sizes (the most quirk-laden parity surface:
obstacle_detection.cpp:134-157 argument swap + ceil-minus-one boundaries)."""

import numpy as np
import pytest

import oracle
from pointcloud_obstacle_processing_tpu import PipelineConfig
from pointcloud_obstacle_processing_tpu.ops.occupancy import grid_cell_index


@pytest.mark.parametrize("seed", range(6))
def test_grid_cells_random_configs(seed):
    rng = np.random.default_rng(seed)
    x_min = float(rng.uniform(-3, 2))
    x_max = x_min + float(rng.uniform(0.5, 6))
    y_min = float(rng.uniform(-3, 2))
    y_max = y_min + float(rng.uniform(0.5, 6))
    block = float(rng.choice([0.0375, 0.05, 0.11, 0.15, 0.33]))
    cfg = PipelineConfig(
        x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
        z_min=-1.0, z_max=1.0, block_size=block,
    )
    pts = np.stack(
        [
            rng.uniform(x_min, x_max, 800),
            rng.uniform(y_min, y_max, 800),
            rng.uniform(-1, 1, 800),
        ],
        axis=1,
    ).astype(np.float32)
    # mix in exact block-boundary coordinates (the ceil-minus-one edge)
    k = rng.integers(0, 20, 50)
    pts[:50, 0] = (np.float32(x_max) - k * np.float32(block)).astype(np.float32)
    pts[:50, 1] = (np.float32(y_min) + k * np.float32(block)).astype(np.float32)

    got = np.asarray(grid_cell_index(pts, cfg))
    want = oracle.grid_cell_index(pts, cfg)
    np.testing.assert_array_equal(got, want)
