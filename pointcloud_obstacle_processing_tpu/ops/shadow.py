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
vmap over cluster slots, and the whole ``n_lines``-line sweep is rasterized
in **closed form per cluster**: all lines of one sweep share their
steep/back classification and gradient (the shift moves both endpoints by
the same integer), so the union of the swept lines' cells collapses to an
O(1)-per-cell test — no per-line axis at all ([M, H, W] instead of
[M*L, H, W]), and crucially NO static line bound: the sweep is exact for
arbitrarily wide clusters, matching the reference's unbounded loop
(cpp:653) with zero truncation.  Derivation per branch (u = the rasterizer's
iteration variable; line i shifts both endpoints' columns by -i):

* steep (iterate rows): line i writes cells (r, fy(r)-i) and (r, fy(r)-i+1)
  for r in the row span, fy(r) = floor(y0 + g*(r - x0)) — the integer shift
  commutes with floor, so the sweep union is the column band
  ``fy(r)-(n-1) <= c <= fy(r)+1``.
* shallow (iterate cols): line i evaluated at column c equals the
  unshifted line at u = c+i (the shift cancels inside ``y0 + g*(u - x0)``
  bitwise — u-x0 is an exact integer difference), so with the +1-cell
  writes the union over i in [0, n) is ``exists u in
  [max(x0, c-1), min(x1, c+n-1)]: fy(u) == r`` — and fy is monotone in u
  with per-step increments <= |g| <= 1, so that is exactly
  ``min(fy(u_lo), fy(u_hi)) <= r <= max(fy(u_lo), fy(u_hi))``.

All writes store the same ``grid_opacity`` value, so write order is
immaterial and the union is the exact final grid.
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

    The sweep width ``ceil(width/block)+3`` is a traced per-cluster value
    with NO static bound — the closed-form union rasterization (module
    docstring) covers arbitrarily many lines at O(H*W) per cluster, exactly
    like the reference's unbounded loop (cpp:650-669)."""
    H, W = config.grid_height, config.grid_width
    M = clusters.sizes.shape[0]

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

    s_col, s_row, e_col, e_row, n_lines, active = jax.vmap(per_cluster)(slot_ids)

    # ---- traceShadow (cpp:467-538) sweep union, closed form per cluster ----
    # All lines of a sweep share steep/back/gradient: shifting both endpoint
    # columns by -i changes neither dx nor dy.
    x0, y0, x1, y1 = s_col, s_row, e_col, e_row  # line 0 (i = 0), [M] each
    steep = jnp.abs(y1 - y0) > jnp.abs(x1 - x0)
    x0, y0 = jnp.where(steep, y0, x0), jnp.where(steep, x0, y0)
    x1, y1 = jnp.where(steep, y1, x1), jnp.where(steep, x1, y1)
    back = x0 > x1
    x0, x1 = jnp.where(back, x1, x0), jnp.where(back, x0, x1)
    y0, y1 = jnp.where(back, y1, y0), jnp.where(back, y0, y1)

    dx = (x1 - x0).astype(jnp.float32)
    dy = (y1 - y0).astype(jnp.float32)
    gradient = jnp.where(dx == 0.0, jnp.float32(1.0), dy / jnp.where(dx == 0.0, 1.0, dx))

    # Deviations from the literal C++ (both documented, both C++ bugs):
    # * ``intersectY`` is evaluated closed-form (y0 + gradient*s) instead of
    #   the float32 += accumulation — identical except ~1-ulp boundary cells
    #   (for steep sweeps the -i endpoint shift is applied after the floor
    #   rather than inside the sum: same ~1-ulp class);
    # * writes that would wrap across a row via the flat ``idx+1`` increment
    #   (cpp:509, :531) or land out-of-grid via flat-index wraparound are
    #   dropped instead of wrapping.
    fx0 = x0.reshape(M, 1, 1).astype(jnp.float32)
    y0f = y0.reshape(M, 1, 1).astype(jnp.float32)
    ix0 = x0.reshape(M, 1, 1)
    ix1 = x1.reshape(M, 1, 1)
    g = gradient.reshape(M, 1, 1)
    stp = steep.reshape(M, 1, 1)
    n = n_lines.reshape(M, 1, 1)
    on = active.reshape(M, 1, 1)

    rows = lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

    # steep: iterate s over rows; line i writes (r, fy(r)-i) and (r, fy(r)-i+1)
    # for i in [0, n)  =>  column band [fy(r)-(n-1), fy(r)+1]
    fy_r = jnp.floor(y0f + g * (rows.astype(jnp.float32) - fx0)).astype(jnp.int32)
    steep_hit = (
        (rows >= ix0) & (rows <= ix1)
        & (cols >= fy_r - (n - 1)) & (cols <= fy_r + 1)
    )

    # shallow: iterate s over cols; line i evaluated at column c equals the
    # unshifted line at u = c+i, and the +1-cell write adds u = c-1+i, so
    # the sweep union per cell is "exists u in [max(x0, c-1), min(x1, c+n-1)]
    # with fy(u) == r".  fy is monotone with per-integer-step increments
    # <= |g| <= 1 (shallow), so the attained set is every integer between
    # the endpoint values.
    u_lo = jnp.maximum(ix0, cols - 1)
    u_hi = jnp.minimum(ix1, cols + (n - 1))
    fy_lo = jnp.floor(y0f + g * (u_lo.astype(jnp.float32) - fx0)).astype(jnp.int32)
    fy_hi = jnp.floor(y0f + g * (u_hi.astype(jnp.float32) - fx0)).astype(jnp.int32)
    shallow_hit = (
        (u_lo <= u_hi)
        & (rows >= jnp.minimum(fy_lo, fy_hi))
        & (rows <= jnp.maximum(fy_lo, fy_hi))
    )

    hit = jnp.any(on & jnp.where(stp, steep_hit, shallow_hit), axis=0)
    out = jnp.where(hit, jnp.int8(config.grid_opacity), jnp.asarray(grid))
    return ShadowResult(grid=out)
