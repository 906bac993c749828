"""Core pytree data types.

The reference moves data between stages as dynamically-sized PCL containers
(``pcl::PointCloud``, ``pcl::PointIndices``, ``nav_msgs::OccupancyGrid`` —
obstacle_detection.cpp:78, :793, :838) and publishes results on ROS topics
with generated message types (msg/PointWithRad.msg, msg/PointIndicesArray.msg).

On TPU every shape is static, so each container becomes a fixed-capacity
padded array plus a validity mask / count.  All types are registered pytrees
(flax.struct) so they flow through jit/vmap/shard_map unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "Cloud",
    "OccupancyGrid",
    "PointWithRad",
    "PointIndicesArray",
    "ClusterSet",
    "PlaneModel",
    "StageStats",
    "PipelineResult",
]


class Cloud(struct.PyTreeNode):
    """Fixed-capacity point cloud: padded points + validity mask.

    Equivalent of ``pcl::PointCloud<pcl::PointXYZ>``.  ``points[i]`` is only
    meaningful where ``valid[i]``; padding lanes hold arbitrary finite values.
    """

    points: jax.Array  # [N, 3] float32
    valid: jax.Array  # [N] bool

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @classmethod
    def from_points(cls, points, valid=None) -> "Cloud":
        points = jnp.asarray(points, jnp.float32)
        if valid is None:
            valid = jnp.ones(points.shape[:-1], dtype=bool)
        return cls(points=points, valid=jnp.asarray(valid, bool))

    @classmethod
    def pad_to(cls, points, capacity: int) -> "Cloud":
        """Host-side helper: pad a concrete [n,3] array up to capacity."""
        points = jnp.asarray(points, jnp.float32)
        n = points.shape[0]
        if n > capacity:
            raise ValueError(f"cloud of {n} points exceeds capacity {capacity}")
        pad = jnp.zeros((capacity - n, 3), jnp.float32)
        valid = jnp.arange(capacity) < n
        return cls(points=jnp.concatenate([points, pad], axis=0), valid=valid)

    def masked_points(self, fill: float = jnp.nan):
        """Points with padding lanes replaced by `fill` (host/debug use)."""
        return jnp.where(self.valid[..., None], self.points, fill)


class OccupancyGrid(struct.PyTreeNode):
    """``nav_msgs::OccupancyGrid`` equivalent (obstacle_detection.cpp:838-852).

    ``data`` is row-major [H, W] int8 with the same cell values the reference
    writes: 0 free, 100 occupied (hole or obstacle), ``grid_opacity`` for
    shadow cells.  Resolution/origin metadata is static config; the reference
    hardcodes origin orientation (0,0,0.707,0.707) and position
    (x_max, 0, 0) at cpp:844-850 — carried as plain aux fields.
    """

    data: jax.Array  # [H, W] int8
    resolution: float = struct.field(pytree_node=False, default=0.0)
    origin_position: tuple = struct.field(pytree_node=False, default=(0.0, 0.0, 0.0))
    origin_orientation_xyzw: tuple = struct.field(
        pytree_node=False, default=(0.0, 0.0, 0.707, 0.707)
    )

    @property
    def height(self) -> int:
        return self.data.shape[-2]

    @property
    def width(self) -> int:
        return self.data.shape[-1]


class PointWithRad(struct.PyTreeNode):
    """msg/PointWithRad.msg: ``float32 x, y, z, r`` — a cluster centroid plus
    bounding radius.  Stored batched as an [..., 4] array."""

    xyzr: jax.Array  # [..., 4] float32

    @property
    def xyz(self):
        return self.xyzr[..., :3]

    @property
    def r(self):
        return self.xyzr[..., 3]


class PointIndicesArray(struct.PyTreeNode):
    """msg/PointIndicesArray.msg: ``PointWithRad[] points``.

    Fixed capacity [MAX_CLUSTERS, 4] + per-slot validity.  This is the
    reference's dormant ``centroids`` topic payload (obstacle_detection.cpp:
    74, :810, :1009), first-class here.
    """

    points: PointWithRad  # .xyzr: [M, 4]
    valid: jax.Array  # [M] bool

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @property
    def capacity(self) -> int:
        return self.points.xyzr.shape[-2]


class ClusterSet(struct.PyTreeNode):
    """Euclidean clustering result over a fixed-capacity cloud.

    Equivalent of ``std::vector<pcl::PointIndices>``
    (obstacle_detection.cpp:793): instead of ragged index vectors we carry a
    per-point cluster id (``-1`` = unclustered / padding), plus per-cluster
    slot metadata sorted by size descending (PCL sorts clusters by size,
    pcl::extractEuclideanClusters tail sort — mirrored here).
    """

    point_cluster: jax.Array  # [N] int32, compact cluster slot id or -1
    sizes: jax.Array  # [M] int32, per-slot point counts (0 = empty slot)
    valid: jax.Array  # [M] bool, slot passes the [min,max] size gate
    num_clusters: jax.Array  # [] int32


class PlaneModel(struct.PyTreeNode):
    """``pcl::ModelCoefficients`` for up to ``max_planes`` extracted planes.

    ``coeffs[k] = (nx, ny, nz, d)`` with unit normal; plane eq n·p + d = 0
    (matches pcl::SampleConsensusModelPlane's 4-coefficient form).
    """

    coeffs: jax.Array  # [K, 4] float32
    valid: jax.Array  # [K] bool
    num_planes: jax.Array  # [] int32


class StageStats(struct.PyTreeNode):
    """Structured per-stage observability (SURVEY.md §5).

    The reference logs stage input/output sizes (obstacle_detection.cpp:706,
    :735, :747) and per-stage wall-clock (:872-925).  Counts are computed
    on-device; timing is the host harness's job (utils/timing.py).
    """

    accumulated_points: jax.Array  # [] int32: valid points in
    cropped_points: jax.Array  # after NaN/bounds rejection
    voxel_points: jax.Array  # after VoxelGrid downsample (clamped to capacity)
    inlier_points: jax.Array  # after statistical outlier removal
    nonplane_points: jax.Array  # after RANSAC plane removal
    num_planes: jax.Array  # planes extracted
    num_clusters: jax.Array  # clusters passing the size gate
    # Capacity-truncation observability: every fixed-shape truncation in the
    # pipeline raises exactly one of these flags (docs/PARITY.md deviation
    # list rule).  The shadow sweep has no flag because it has no bound —
    # the closed-form rasterizer covers arbitrary widths (ops/shadow.py).
    voxel_overflow: jax.Array  # bool: occupied voxels > max_voxels (extras dropped)
    cluster_overflow: jax.Array  # bool: non-plane pts > cluster_capacity
    # bool: the banded cluster sweep's x-envelope window was exceeded
    # (edges dropped, clusters may split); always False with the full sweep
    cluster_band_overflow: jax.Array
    # bool: the multi-plane loop hit the static max_planes bound while the
    # reference's unbounded loop (cpp:379-387) would have kept extracting
    # (> plane_min_remaining_frac of points still unsegmented, last round
    # found a plane)
    planes_truncated: jax.Array
    # bool: cluster label propagation hit cluster_max_iters with changes
    # still pending — labels are not at the fixpoint (clusters may
    # split); raise cluster_max_iters
    cluster_unconverged: jax.Array


class PipelineResult(struct.PyTreeNode):
    """Everything the reference publishes, as one pytree.

    Topic map (obstacle_detection.cpp:1004-1011):
      occupancy_grid  -> .grid
      centroids       -> .centroids  (PointIndicesArray of PointWithRad)
      euc_clusters    -> .obstacle_cloud + .clusters.point_cluster
      voxel_grid / statistical_outliers / planar_cloud / indices_cloud /
      cloud_f         -> intermediate clouds (populated when
                         config.publish_point_clouds, else zero-size stubs)
    """

    grid: OccupancyGrid
    centroids: PointIndicesArray
    clusters: ClusterSet
    obstacle_cloud: Cloud  # non-plane points (reference's planar_cloud_y end state)
    planes: PlaneModel
    stats: StageStats
    # optional per-stage debug clouds (the publish_point_clouds surface)
    voxel_cloud: Cloud | None = None
    outlier_filtered_cloud: Cloud | None = None
    plane_cloud: Cloud | None = None  # union of all extracted plane inliers
    last_plane_cloud: Cloud | None = None  # the reference's indices_cloud payload
    # full (uncompacted) non-plane cloud — the reference's planar_cloud/cloud_f
    # payload (cpp:401-426): unlike obstacle_cloud it is never truncated to
    # cluster_capacity, so debug topics see every surviving point.
    nonplane_cloud: Cloud | None = None
