"""VoxelGrid downsampling (pcl::VoxelGrid equivalent).

The reference delegates to ``pcl::VoxelGrid`` with a cubic leaf
(downsample_cloud, obstacle_detection.cpp:271-296; leaf size
``downsample_size`` = 0.015, params.yaml:16).  Semantics to match
(SURVEY.md §2.2): points are binned into leaf-size cubes with
``ijk = floor(coord / leaf)`` on *absolute* coordinates, and the output is
one point per occupied voxel at the **centroid** (mean) of its members.

TPU-native design — no hash tables, no host round-trips:

1. per-point integer voxel coords ``(ix, iy, iz)``; invalid points get
   INT32_MAX sentinels so they sort to the tail,
2. one multi-key ``lax.sort`` over the padded buffer (keys: ix, iy, iz;
   payload: point coords + validity),
3. voxel boundaries ("heads") where any key changes; compact segment ids by
   cumulative sum of heads,
4. per-voxel sums via scatter-add on the compact ids straight into the
   fixed-capacity output (sorted ids = cheap scatter; and unlike prefix-sum
   differencing, no cancellation error),
5. centroids = sums / counts, valid for the first ``min(num_voxels,
   max_voxels)`` slots, in ascending (ix, iy, iz) order — deterministic,
   the same spirit as PCL's packed-leaf-index ordering.

The intermediate (key, sum, count) form is exposed as ``voxel_partials`` /
``merge_voxel_partials`` so point-sharded multi-chip execution can voxelize
local shards independently, all_gather the small partial tables, and merge —
the cross-shard reduction the reference never needed (single process) but a
100M-point accumulation window does (SURVEY.md §2.3 rebuild plan).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud

__all__ = [
    "voxel_downsample",
    "voxel_partials",
    "merge_voxel_partials",
    "VoxelResult",
    "VoxelPartials",
]

_I32_MAX = jnp.iinfo(jnp.int32).max


class VoxelResult(NamedTuple):
    cloud: Cloud  # [max_voxels] centroids, key-sorted
    num_voxels: jax.Array  # [] int32: true number of occupied voxels
    overflow: jax.Array  # [] bool: num_voxels > max_voxels (extras dropped)


class VoxelPartials(NamedTuple):
    """Per-voxel partial sums, key-sorted, padded to a fixed capacity."""

    keys: jax.Array  # [cap, 3] int32 voxel coords (INT32_MAX = empty slot)
    sums: jax.Array  # [cap, 3] float32 coordinate sums
    counts: jax.Array  # [cap] float32 member counts (0 = empty)
    num_voxels: jax.Array  # [] int32
    overflow: jax.Array  # [] bool


def _reduce_sorted_keys(
    kx, ky, kz, sums, counts, capacity: int
) -> VoxelPartials:
    """Segment-reduce (sums, counts) over key-sorted rows into ``capacity``
    compact slots.  Inputs must be sorted by (kx, ky, kz) with INT32_MAX
    sentinel keys for invalid rows; ``counts > 0`` marks real rows."""
    n = kx.shape[0]
    real = counts > 0.0
    first = jnp.zeros((n,), bool).at[0].set(True)
    changed = (
        first
        | (kx != jnp.roll(kx, 1))
        | (ky != jnp.roll(ky, 1))
        | (kz != jnp.roll(kz, 1))
    )
    head = changed & real
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    num = jnp.sum(head.astype(jnp.int32))

    ids = jnp.where(real, seg_id, capacity)  # OOB -> dropped
    out_sums = jnp.zeros((capacity, 3), jnp.float32).at[ids].add(sums, mode="drop")
    out_counts = jnp.zeros((capacity,), jnp.float32).at[ids].add(counts, mode="drop")
    out_keys = jnp.full((capacity, 3), _I32_MAX, jnp.int32)
    head_ids = jnp.where(head, seg_id, capacity)
    out_keys = out_keys.at[head_ids].set(
        jnp.stack([kx, ky, kz], axis=-1), mode="drop"
    )

    slot = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    valid = slot < jnp.minimum(num, capacity)
    return VoxelPartials(
        keys=jnp.where(valid[:, None], out_keys, _I32_MAX),
        sums=jnp.where(valid[:, None], out_sums, 0.0),
        counts=jnp.where(valid, out_counts, 0.0),
        num_voxels=num,
        overflow=num > capacity,
    )


def voxel_partials(cloud: Cloud, leaf_size: float, capacity: int) -> VoxelPartials:
    """Bin points into voxels and return per-voxel (key, sum, count)."""
    pts = cloud.points
    valid = cloud.valid & jnp.all(jnp.isfinite(pts), axis=-1)

    ijk = jnp.floor(pts / jnp.float32(leaf_size)).astype(jnp.int32)
    kx = jnp.where(valid, ijk[:, 0], _I32_MAX)
    ky = jnp.where(valid, ijk[:, 1], _I32_MAX)
    kz = jnp.where(valid, ijk[:, 2], _I32_MAX)

    kx, ky, kz, sx, sy, sz, sv = lax.sort(
        (kx, ky, kz, pts[:, 0], pts[:, 1], pts[:, 2], valid.astype(jnp.float32)),
        num_keys=3,
        is_stable=False,
    )
    sorted_pts = jnp.stack([sx, sy, sz], axis=-1) * sv[:, None]
    return _reduce_sorted_keys(kx, ky, kz, sorted_pts, sv, capacity)


def merge_voxel_partials(partials: VoxelPartials, capacity: int) -> VoxelPartials:
    """Merge concatenated partial tables (e.g. all_gather'ed shards)."""
    kx, ky, kz, sx, sy, sz, cnt = lax.sort(
        (
            partials.keys[:, 0],
            partials.keys[:, 1],
            partials.keys[:, 2],
            partials.sums[:, 0],
            partials.sums[:, 1],
            partials.sums[:, 2],
            partials.counts,
        ),
        num_keys=3,
        is_stable=False,
    )
    return _reduce_sorted_keys(kx, ky, kz, jnp.stack([sx, sy, sz], -1), cnt, capacity)


def finalize_voxels(partials: VoxelPartials) -> VoxelResult:
    """Partials -> centroid cloud."""
    slot = lax.broadcasted_iota(jnp.int32, (partials.counts.shape[0], 1), 0)[:, 0]
    valid = slot < jnp.minimum(partials.num_voxels, partials.counts.shape[0])
    centroids = partials.sums / jnp.maximum(partials.counts, 1.0)[:, None]
    return VoxelResult(
        cloud=Cloud(points=centroids, valid=valid),
        num_voxels=partials.num_voxels,
        overflow=partials.overflow,
    )


def voxel_downsample(cloud: Cloud, leaf_size: float, max_voxels: int) -> VoxelResult:
    """Downsample to per-voxel centroids.  See module docstring."""
    return finalize_voxels(voxel_partials(cloud, leaf_size, max_voxels))
