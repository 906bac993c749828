"""Occupancy grid seeding, hole (crater) detection, and obstacle marking.

Rebuilds ``build_initial_occupancy_grid_dataset``
(obstacle_detection.cpp:175-269) and the end-of-pipeline obstacle marking
loop (cpp:823-832) as fused vector ops:

reference                               TPU-native
--------------------------------------  ---------------------------------
per-point while-loop cell search         closed-form int cell math
  (get_occupancy_grid_x_y, cpp:134-150)
per-point histogram increment loop       one scatter-add
row-average loops (cpp:226-234)          row-sum reduce + floor div
hole-marking loop (cpp:241-268)          elementwise compare

The reference's cell search is O(grid-dim) *per point* (two while loops that
step one block at a time).  Its result is closed-form:

  col(y) = max(0, ceil((y - y_min)/block) - 1)     # cpp:139-143
  row(x) = max(0, ceil((x_max - x)/block) - 1)     # cpp:144-148

(the loop counts strict inequalities, hence the ceil-minus-one rather than a
plain floor; they differ only at exact block boundaries).  Note the argument
swap at the call site (cpp:203): grid *columns* come from world y and *rows*
from world x, with rows counted downward from x_max.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..types import Cloud
from .filters import crop_box_mask

__all__ = ["grid_cell_xy", "grid_cell_index", "crop_and_seed", "mark_obstacles", "CropSeedResult"]


def grid_cell_xy(points: jax.Array, config: PipelineConfig) -> tuple[jax.Array, jax.Array]:
    """World (x, y) -> (col, row) occupancy cells.

    Bit-exact vectorization of get_occupancy_grid_x_y (obstacle_detection.
    cpp:134-150).  The closed form ``ceil((v - lo)/b) - 1`` lands within one
    cell of the C++ incremental search but can differ at exact float32 block
    boundaries (division rounds differently than the loop's multiply-add
    comparisons), so a few fix-up steps re-evaluate the loop's own f32
    conditions around the candidate:

      col: while (y_min + (c+1)*b < y) c++     (cpp:139-142)
      row: while (x_max - (c+1)*b > x) c++     (cpp:144-147)
    """
    b = jnp.float32(config.block_size)
    y = points[..., 1]
    x = points[..., 0]
    y_min = jnp.float32(config.y_min)
    x_max = jnp.float32(config.x_max)

    col = jnp.maximum(0, jnp.ceil((y - y_min) / b) - 1).astype(jnp.int32)
    row = jnp.maximum(0, jnp.ceil((x_max - x) / b) - 1).astype(jnp.int32)

    for _ in range(2):  # advance while the loop condition still holds
        cf = col.astype(jnp.float32)
        col = jnp.where(y_min + (cf + 1.0) * b < y, col + 1, col)
        rf = row.astype(jnp.float32)
        row = jnp.where(x_max - (rf + 1.0) * b > x, row + 1, row)
    for _ in range(2):  # retreat while the previous step's condition fails
        cf = col.astype(jnp.float32)
        col = jnp.where((col > 0) & ~(y_min + cf * b < y), col - 1, col)
        rf = row.astype(jnp.float32)
        row = jnp.where((row > 0) & ~(x_max - rf * b > x), row - 1, row)
    return col, row


def grid_cell_index(points: jax.Array, config: PipelineConfig) -> jax.Array:
    """Flat row-major cell index (get_occupancy_grid_location, cpp:153-157)."""
    col, row = grid_cell_xy(points, config)
    return row * config.grid_width + col


class CropSeedResult(NamedTuple):
    cloud: Cloud  # same buffer, mask restricted to in-crop finite points
    counts: jax.Array  # [H, W] int32 per-cell point histogram
    row_averages: jax.Array  # [H] int32 (long-long floor division, cpp:233)
    hole_grid: jax.Array  # [H, W] int8: 100 where crater detected, else 0


def crop_and_seed(cloud: Cloud, config: PipelineConfig) -> CropSeedResult:
    """Fused crop + histogram + row-average + hole detection (cpp:175-269).

    Faithful details:
    * a point whose flat index lands outside the grid is excluded from the
      histogram but kept in the output cloud (cpp:205-214);
    * row averages use integer (floor) division by grid_width (cpp:233);
    * a cell is a hole iff ``count < row_avg * (1 - dev_percent)`` with the
      float product on the right (cpp:258) — cells in point-free rows have
      row_avg 0 and are never holes.
    """
    H, W = config.grid_height, config.grid_width
    in_box = cloud.valid & crop_box_mask(cloud.points, config)
    col, row = grid_cell_xy(cloud.points, config)

    # MXU one-hot outer product instead of a scatter-add: the grid index is
    # naturally separable (rows from x, cols from y), so the histogram is
    # exactly onehot(row)^T @ onehot(col) — one [H,N]x[N,W] matmul, exact in
    # f32 accumulation, ~50x faster than TPU's serialized scatter.  A row or
    # col outside the grid yields a zero one-hot row — identical to the
    # reference's skip-on-OOB-index (cpp:205-206), which also never counts
    # such a point.
    from .mxu_histogram import histogram2d_mxu

    counts = histogram2d_mxu(row, col, in_box, H, W)

    row_averages = (jnp.sum(counts, axis=1) // W).astype(jnp.int32)
    threshold = row_averages.astype(jnp.float32) * jnp.float32(1.0 - config.dev_percent)
    hole = counts.astype(jnp.float32) < threshold[:, None]
    hole_grid = jnp.where(hole, jnp.int8(100), jnp.int8(0))

    return CropSeedResult(
        cloud=Cloud(points=cloud.points, valid=in_box),
        counts=counts,
        row_averages=row_averages,
        hole_grid=hole_grid,
    )


def mark_obstacles(grid: jax.Array, cloud: Cloud, config: PipelineConfig) -> jax.Array:
    """Mark every remaining (non-plane) point's cell occupied=100 (cpp:823-832).

    The reference performs this write *without* a bounds check (unlike the
    histogram path) — an out-of-grid index is undefined behavior in the C++.
    We drop out-of-range writes instead.

    Implementation: the write set is "cells with >= 1 non-plane point", i.e.
    an occupancy histogram — computed as the same MXU one-hot matmul as the
    seeding histogram instead of a serialized scatter (~3 ms per 131k
    updates on v5e).  The flat index is re-split as (idx//W, idx%W) so a
    col >= W write wraps into the next row exactly like the C++ flat
    ``grid[idx]`` access.
    """
    from .mxu_histogram import histogram2d_mxu

    index = grid_cell_index(cloud.points, config)
    # channel-wise isfinite: an ``all(isfinite(points), axis=-1)`` over the
    # [N, 3] stack forces XLA to materialize the channel-minor array the
    # voxel tail keeps fused as three [N] vectors (scripts/
    # tpu_experiments41/42.py); identical boolean result per row.
    finite = (
        jnp.isfinite(cloud.points[:, 0])
        & jnp.isfinite(cloud.points[:, 1])
        & jnp.isfinite(cloud.points[:, 2])
    )
    ok = (
        cloud.valid
        & finite
        & (index >= 0)
        & (index < config.grid_size)
    )
    row = index // config.grid_width
    col = index % config.grid_width
    hit = histogram2d_mxu(row, col, ok, config.grid_height, config.grid_width) > 0
    return jnp.where(hit, jnp.int8(100), jnp.asarray(grid))
