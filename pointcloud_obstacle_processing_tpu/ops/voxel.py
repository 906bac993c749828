"""VoxelGrid downsampling (pcl::VoxelGrid equivalent).

The reference delegates to ``pcl::VoxelGrid`` with a cubic leaf
(downsample_cloud, obstacle_detection.cpp:271-296; leaf size
``downsample_size`` = 0.015, params.yaml:16).  Semantics to match
(SURVEY.md §2.2): points are binned into leaf-size cubes with
``ijk = floor(coord / leaf)`` on *absolute* coordinates, and the output is
one point per occupied voxel at the **centroid** (mean) of its members.

TPU-native design — no hash tables, no scatter on the hot path:

1. per-point integer voxel coords ``(ix, iy, iz)``; invalid points get
   INT32_MAX sentinels so they sort to the tail,
2. one multi-key ``lax.sort`` over the padded buffer (keys: ix, iy, iz;
   payload: point coords + validity),
3. voxel boundaries ("heads") where any key changes,
4. per-voxel sums via *prefix-sum differencing* (cumsum + gather at voxel
   boundaries) instead of segment scatter-add — sorts and cumsums map far
   better onto the VPU than random-access scatters (SURVEY.md §7 hard
   part (d)),
5. compaction of the first ``max_voxels`` voxels (key-sorted order) into a
   fixed-capacity output cloud.

Output ordering is ascending (ix, iy, iz) — deterministic, same spirit as
PCL's leaf-index ordering (PCL sorts by a packed leaf index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud

__all__ = ["voxel_downsample", "VoxelResult"]

_I32_MAX = jnp.iinfo(jnp.int32).max


class VoxelResult(NamedTuple):
    cloud: Cloud  # [max_voxels] centroids, key-sorted
    num_voxels: jax.Array  # [] int32: true number of occupied voxels
    overflow: jax.Array  # [] bool: num_voxels > max_voxels (extras dropped)


def voxel_downsample(cloud: Cloud, leaf_size: float, max_voxels: int) -> VoxelResult:
    """Downsample to per-voxel centroids.  See module docstring."""
    pts = cloud.points
    n = cloud.capacity
    valid = cloud.valid & jnp.all(jnp.isfinite(pts), axis=-1)

    ijk = jnp.floor(pts / jnp.float32(leaf_size)).astype(jnp.int32)
    kx = jnp.where(valid, ijk[:, 0], _I32_MAX)
    ky = jnp.where(valid, ijk[:, 1], _I32_MAX)
    kz = jnp.where(valid, ijk[:, 2], _I32_MAX)

    # One sort, three keys, payload = coords + validity.
    kx, ky, kz, sx, sy, sz, sv = lax.sort(
        (kx, ky, kz, pts[:, 0], pts[:, 1], pts[:, 2], valid.astype(jnp.float32)),
        num_keys=3,
        is_stable=False,
    )

    first = jnp.zeros((n,), bool).at[0].set(True)
    changed = (
        first
        | (kx != jnp.roll(kx, 1))
        | (ky != jnp.roll(ky, 1))
        | (kz != jnp.roll(kz, 1))
    )
    valid_sorted = sv > 0.5
    head = changed & valid_sorted
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1  # compact voxel id per point
    num_voxels = jnp.sum(head.astype(jnp.int32))

    # Per-voxel sums by scatter-add over the compact sorted segment ids.
    # (A prefix-sum-differencing variant loses ~1e-3 of precision to
    # cancellation over long prefixes — enough to flip centroids across voxel
    # boundaries — so direct segment sums it is.)
    ids = jnp.where(valid_sorted, seg_id, max_voxels)  # OOB id -> dropped
    sorted_pts = jnp.stack([sx, sy, sz], axis=-1)
    sums = jnp.zeros((max_voxels, 3), jnp.float32).at[ids].add(sorted_pts, mode="drop")
    counts = jnp.zeros((max_voxels,), jnp.float32).at[ids].add(
        valid_sorted.astype(jnp.float32), mode="drop"
    )

    out_valid = lax.broadcasted_iota(jnp.int32, (max_voxels, 1), 0)[:, 0] < jnp.minimum(
        num_voxels, max_voxels
    )
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]

    return VoxelResult(
        cloud=Cloud(points=centroids, valid=out_valid),
        num_voxels=num_voxels,
        overflow=num_voxels > max_voxels,
    )
