"""Sensor-shadow casting onto the occupancy grid.

Obstacles occlude the depth camera's view of the ground behind them; the
reference paints those unknown regions into the grid with ``grid_opacity``.
Three reference functions are rebuilt here as one vmapped-over-clusters op:

* handle_shadow_casting (obstacle_detection.cpp:584-672): per cluster,
  transform its points world->sensor, find the axis extremes, compute the
  shadow start/end grid cells, then sweep ``ceil(width/block)+3`` parallel
  lines shifted one column at a time (cpp:650-669).
* calculate_shadow_cast (cpp:540-582): the trig —
  ``a = min_pt.z; b = |min_pt.x|; c = hypot(a,b); e = |max_x| - |min_pt.x|
  + 0.04; d = tan(asin(a/c))*e + 0.25`` — scales the normalized view ray
  through the lowest cluster point by ``d`` and maps the end point back to a
  world grid cell.
* traceShadow (cpp:467-538): a Bresenham-style rasterizer writing each
  line's cells (and each cell's +1 neighbor) with ``grid_opacity``,
  steep/shallow branches, bounds-guarded writes.

TPU-native design: per-cluster extremes are masked reduces shared across a
vmap over cluster slots; the line sweep is a static ``shadow_max_lines``
bound with activity masks; and rasterization is **dense** — the line
equation is evaluated for every (line, grid cell) pair and OR-reduced over
lines, a fused [M*L, H, W] elementwise pass on the VPU.  No scatter (a
materialized per-step write-index scatter costs ~10ms on TPU; this runs in
~0.1ms) and no sequential step loop.  All writes store the same
``grid_opacity`` value, so write order is immaterial.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import PipelineConfig
from ..types import Cloud, ClusterSet
from .transforms import RigidTransform

__all__ = ["cast_shadows", "ShadowResult"]

_INF = jnp.float32(jnp.inf)


class ShadowResult(NamedTuple):
    grid: jax.Array  # [H, W] int8 with shadow cells painted
    overflow: jax.Array  # [] bool: a cluster needed more than shadow_max_lines


def _grid_cell_colrow(x, y, config: PipelineConfig):
    """get_occupancy_grid_x_y for scalar-ish arrays (cpp:134-150):
    col from world y, row from world x (the call-site argument swap).
    Shares the bit-exact boundary fix-up with ops.occupancy."""
    from .occupancy import grid_cell_xy

    return grid_cell_xy(jnp.stack([x, y, jnp.zeros_like(x)], axis=-1), config)


def cast_shadows(
    grid: jax.Array,
    cloud: Cloud,
    clusters: ClusterSet,
    world_from_sensor: RigidTransform,
    config: PipelineConfig,
) -> ShadowResult:
    """Paint every cluster's shadow onto ``grid`` (int8 [H, W]).

    ``overflow`` flags any cluster whose sweep needed more than the static
    ``shadow_max_lines`` bound (a cluster wider than ``(L-3)*block_size`` in
    the sensor frame) — the extra lines are dropped relative to the
    reference's unbounded loop (cpp:653), so callers can observe the
    truncation (StageStats.shadow_overflow) instead of silently losing
    shadow coverage.
    """
    H, W = config.grid_height, config.grid_width
    M = clusters.sizes.shape[0]
    L = config.shadow_max_lines

    # world -> sensor once for the whole buffer (cpp:592-604 does it per
    # cluster on copied points; here it's one shared rotate+add).
    spts = world_from_sensor.inverse().apply(cloud.points)

    pc = clusters.point_cluster  # [C] slot id or -1
    slot_ids = lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]

    def per_cluster(m):
        mask = (pc == m) & cloud.valid
        mx = jnp.where(mask, spts[:, 0], _INF)
        my = jnp.where(mask, spts[:, 1], _INF)
        i_min = jnp.argmin(mx)
        vmin = spts[i_min]  # vertical_axis_min_pt (cpp:608,616)
        vmax = jnp.max(jnp.where(mask, spts[:, 0], -_INF))
        hmin = jnp.min(my)
        hmax = jnp.max(jnp.where(mask, spts[:, 1], -_INF))
        width = jnp.abs(hmax - hmin)  # cpp:627

        # calculate_shadow_cast trig (cpp:543-548)
        a = vmin[2]
        bb = jnp.abs(vmin[0])
        c = jnp.sqrt(a * a + bb * bb)
        e = jnp.abs(vmax) - jnp.abs(vmin[0]) + jnp.float32(0.04)
        D = jnp.arcsin(a / jnp.maximum(c, 1e-20))
        d = jnp.tan(D) * e + jnp.float32(0.25)

        v_len = jnp.maximum(jnp.linalg.norm(vmin), 1e-20)
        end_sensor = vmin + vmin / v_len * d  # cpp:558-566
        end_world = world_from_sensor.apply(end_sensor)  # cpp:570-578
        start_world = world_from_sensor.apply(vmin)  # cpp:638-642

        e_col, e_row = _grid_cell_colrow(end_world[0], end_world[1], config)
        s_col, s_row = _grid_cell_colrow(start_world[0], start_world[1], config)

        shift = jnp.ceil((width / jnp.float32(config.block_size)) / 2.0).astype(jnp.int32)
        n_lines = jnp.ceil(width / jnp.float32(config.block_size)).astype(jnp.int32) + 3

        active = clusters.valid[m] & (jnp.sum(mask.astype(jnp.int32)) >= 2)  # cpp:586
        return (
            s_col + shift,
            s_row,
            e_col + shift,
            e_row,
            n_lines,
            active,
        )

    s_col, s_row, e_col, e_row, n_lines_raw, active = jax.vmap(per_cluster)(slot_ids)
    overflow = jnp.any(active & (n_lines_raw > L))
    n_lines = jnp.minimum(n_lines_raw, L)

    # ---- line sweep: line i shifts both columns by -i (cpp:653-669) --------
    line_ids = lax.broadcasted_iota(jnp.int32, (M, L), 1)
    lx0 = s_col[:, None] - line_ids  # v1.x
    ly0 = jnp.broadcast_to(s_row[:, None], (M, L))  # v1.y
    lx1 = e_col[:, None] - line_ids  # v2.x
    ly1 = jnp.broadcast_to(e_row[:, None], (M, L))
    line_on = active[:, None] & (line_ids < n_lines[:, None])

    # ---- traceShadow (cpp:467-538), vectorized over [M, L] lines -----------
    x0, y0, x1, y1 = lx0, ly0, lx1, ly1
    steep = jnp.abs(y1 - y0) > jnp.abs(x1 - x0)
    x0, y0 = jnp.where(steep, y0, x0), jnp.where(steep, x0, y0)
    x1, y1 = jnp.where(steep, y1, x1), jnp.where(steep, x1, y1)
    back = x0 > x1
    x0, x1 = jnp.where(back, x1, x0), jnp.where(back, x0, x1)
    y0, y1 = jnp.where(back, y1, y0), jnp.where(back, y0, y1)

    dx = (x1 - x0).astype(jnp.float32)
    dy = (y1 - y0).astype(jnp.float32)
    gradient = jnp.where(dx == 0.0, jnp.float32(1.0), dy / jnp.where(dx == 0.0, 1.0, dx))

    # Dense rasterization: instead of materializing per-step write indices
    # and scattering (a ~1M-element scatter: ~10ms on TPU), evaluate the
    # line equation for every (line, grid-cell) pair and OR-reduce over
    # lines — a [M*L, H, W] fused elementwise reduce the VPU eats in ~0.1ms.
    #
    # Deviations from the literal C++ (both documented, both C++ bugs):
    # * ``intersectY`` is evaluated closed-form (y0 + gradient*s) instead of
    #   the float32 += accumulation — identical except ~1-ulp boundary cells;
    # * writes that would wrap across a row via the flat ``idx+1`` increment
    #   (cpp:509, :531) or land out-of-grid via flat-index wraparound are
    #   dropped instead of wrapping.
    nl = x0.size  # M*L lines
    fx0 = x0.reshape(nl, 1, 1).astype(jnp.float32)
    y0f = y0.reshape(nl, 1, 1).astype(jnp.float32)
    ix0 = x0.reshape(nl, 1, 1)
    ix1 = x1.reshape(nl, 1, 1)
    g = gradient.reshape(nl, 1, 1)
    stp = steep.reshape(nl, 1, 1)
    on = line_on.reshape(nl, 1, 1)

    rows = lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

    # steep: iterate s over rows; cells (r, fy(r)) and (r, fy(r)+1)
    fy_r = jnp.floor(y0f + g * (rows.astype(jnp.float32) - fx0)).astype(jnp.int32)
    steep_hit = (
        (rows >= ix0) & (rows <= ix1) & ((fy_r == cols) | (fy_r == cols - 1))
    )

    # shallow: iterate s over cols; cells (fy(c), c) and (fy(c), c+1)
    fy_c = jnp.floor(y0f + g * (cols.astype(jnp.float32) - fx0)).astype(jnp.int32)
    shallow_hit = ((cols >= ix0) & (cols <= ix1) & (fy_c == rows)) | (
        (cols - 1 >= ix0) & (cols - 1 <= ix1)
        & (jnp.floor(y0f + g * (cols.astype(jnp.float32) - 1.0 - fx0)).astype(jnp.int32) == rows)
    )

    hit = jnp.any(on & jnp.where(stp, steep_hit, shallow_hit), axis=0)
    out = jnp.where(hit, jnp.int8(config.grid_opacity), jnp.asarray(grid))
    return ShadowResult(grid=out, overflow=overflow)
