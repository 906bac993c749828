"""The scan→obstacles pipeline: one pure, jit-compiled function.

This is the TPU-native equivalent of the reference's ``cloud_cb`` full pass
(obstacle_detection.cpp:699-927) — the L2 orchestrator of SURVEY.md §1.
Stage order is the reference's exactly:

1. crop + occupancy histogram + crater/hole detection   (cpp:727-731)
2. VoxelGrid downsample                                 (cpp:740)
3. statistical outlier removal                          (cpp:751)
4. iterative RANSAC perpendicular-plane removal         (cpp:778)
5. euclidean cluster extraction                         (cpp:796)
6. per-cluster shadow casting onto the grid             (cpp:817-821)
7. mark remaining non-plane points occupied             (cpp:823-832)
8. occupancy grid + centroid (PointWithRad) outputs     (cpp:838-852, dormant
   centroids path :806-814 made first-class)

Where the reference moves data between PCL containers through heap copies
and publishes intermediates over TCPROS, here every stage passes fixed-shape
device arrays to the next inside a single XLA program: zero host round-trips
between scan upload and result download (SURVEY.md §3 "where control crosses
boundaries").

Batching: ``process_scan`` is vmap-safe — see parallel/sharding.py for the
multi-scan / multi-chip layers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .ops.cluster import cluster_centroids, euclidean_cluster
from .ops.compaction import compact
from .ops.occupancy import crop_and_seed, mark_obstacles
from .ops.outliers import remove_statistical_outliers
from .ops.ransac import segment_planes
from .ops.shadow import cast_shadows
from .ops.transforms import RigidTransform
from .ops.voxel import voxel_downsample
from .types import Cloud, OccupancyGrid, PipelineResult, StageStats

__all__ = ["process_scan", "process_frames", "jit_pipeline"]


def process_scan(
    cloud: Cloud,
    key: jax.Array,
    config: PipelineConfig,
    world_from_sensor: RigidTransform | None = None,
) -> PipelineResult:
    """Full pipeline over one accumulated, world-frame cloud.

    Args:
      cloud: padded [max_points] world-frame cloud (the reference's
        ``passthrough_input_cloud`` accumulator state, cpp:78, :697).
      key: PRNG key driving RANSAC hypothesis sampling (explicit determinism
        the reference's rand()-driven PCL never had).
      config: static pipeline configuration (compile-time constants).
      world_from_sensor: sensor pose used for shadow geometry (the
        reference's tf ``world <- kinect2_link`` lookups, cpp:570, :592).
        Defaults to identity.
    """
    if world_from_sensor is None:
        world_from_sensor = RigidTransform.identity()

    n_in = cloud.count()

    # 1. crop + histogram + hole detection
    seed = crop_and_seed(cloud, config)
    cropped = seed.cloud

    # 2. VoxelGrid downsample (the reference reads but never consults
    #    downsample_input_data, cpp:943; we honor it: when disabled the
    #    cropped cloud is compacted straight into the voxel-capacity buffer)
    if config.downsample_input_data:
        bounds = (
            (config.x_min, config.y_min, config.z_min),
            (config.x_max, config.y_max, config.z_max),
        )  # cropped points are in-box: enables the packed single-key sort
        vox = voxel_downsample(
            cropped, config.downsample_leaf_size, config.max_voxels, bounds,
            config.voxel_sum_precision, config.voxel_binning, config.voxel_order,
            config.voxel_payload_packing,
        )
        voxel_cloud = vox.cloud
        n_voxels = vox.num_voxels
        voxel_overflow = vox.overflow
    else:
        comp0 = compact(cropped, config.max_voxels)
        voxel_cloud = comp0.cloud
        n_voxels = comp0.count
        voxel_overflow = comp0.overflow

    return _post_voxel(
        voxel_cloud,
        n_voxels,
        seed.hole_grid,
        n_in,
        cropped.count(),
        key,
        config,
        world_from_sensor,
        voxel_overflow=voxel_overflow,
    )


def _post_voxel(
    voxel_cloud: Cloud,
    n_voxels: jax.Array,
    hole_grid: jax.Array,
    n_in: jax.Array,
    n_cropped: jax.Array,
    key: jax.Array,
    config: PipelineConfig,
    world_from_sensor: RigidTransform,
    voxel_overflow: jax.Array | None = None,
    shard_axis: str | None = None,
    num_shards: int = 1,
    point_sharded: bool = False,
) -> PipelineResult:
    """Stages 3-8, shared between the single-chip path and the point-sharded
    multi-chip path (which voxelizes shards locally, all-gathers the partial
    voxel tables, and enters here with the merged, replicated cloud).

    ``shard_axis``/``num_shards`` (set only by the point-sharded path):
    the two O(N*W) stages — the banded kNN (stage 3) and the cluster
    sweeps (stage 5) — split their query tiles across the mesh axis and
    all_gather the per-row results, which is bitwise identical to running
    them replicated (each tile's program and operands are unchanged; see
    ops/outliers.py::knn_mean_distances and ops/cluster.py).  The cheap
    O(N) stages (RANSAC at ~4% of the fullscale window, compaction,
    centroids, shadows, grid marking) stay replicated: distributing them
    would trade collective latency for work no chip feels."""
    if voxel_overflow is None:
        voxel_overflow = n_voxels > config.max_voxels
    # 3. statistical outlier removal.  The "banded" engine needs the
    # voxel-lattice ordering that only voxel_downsample guarantees; with
    # downsampling disabled the cloud is scan-ordered => full-width approx.
    backend = config.knn_backend
    if backend in ("banded", "banded_approx") and not config.downsample_input_data:
        backend = "approx"
    # The dead-tile lax.cond skip is for single UNBATCHED programs only:
    # dp_sp_pipeline vmaps the per-shard body (even at local batch 1),
    # where the batched cond lowers to a both-branches select — the
    # measured 2x hazard (config.knn_skip_dead_tiles notes).  That vmap
    # wraps the WHOLE point-sharded body, so the skip must stay off on
    # that path even when shard_post_voxel=False leaves shard_axis=None
    # (ADVICE r4 #4 — ``point_sharded`` covers both postures).  Skipping
    # is output-identical by design, so forcing it off changes nothing
    # but the work.
    outl = remove_statistical_outliers(
        voxel_cloud,
        config.statistical_outlier_mean_k,
        config.statistical_outlier_std_dev_thresh,
        backend=backend,
        band=config.knn_band,
        row_tile=config.knn_row_tile,
        skip_dead_tiles=config.knn_skip_dead_tiles
        and shard_axis is None
        and not point_sharded,
        shard_axis=shard_axis,
        num_shards=num_shards,
    )

    # 4. multi-plane RANSAC removal
    seg = segment_planes(outl.cloud, key, config)

    # 5. euclidean clustering over the compacted non-plane cloud
    comp = compact(seg.nonplane_cloud, config.cluster_capacity)
    clus = euclidean_cluster(
        comp.cloud,
        config.euc_cluster_tolerance,
        config.euc_min_cluster_size,
        config.euc_max_cluster_size,
        config.max_clusters,
        config.cluster_max_iters,
        band_window=config.cluster_band_window,
        shard_axis=shard_axis,
        num_shards=num_shards,
    )

    # centroids + radii (dormant reference API, first-class here)
    centroids = cluster_centroids(comp.cloud, clus.clusters)

    # 6. shadows over the hole grid, 7. obstacle marking (reference order:
    #    holes first, shadows may overwrite, obstacles overwrite last)
    shadows = cast_shadows(
        hole_grid, comp.cloud, clus.clusters, world_from_sensor, config
    )
    grid_data = mark_obstacles(shadows.grid, seg.nonplane_cloud, config)

    grid = OccupancyGrid(
        data=grid_data,
        resolution=config.block_size,
        origin_position=(config.x_max, 0.0, 0.0),  # cpp:848-850
        origin_orientation_xyzw=(0.0, 0.0, 0.707, 0.707),  # cpp:844-847
    )

    stats = StageStats(
        accumulated_points=n_in,
        cropped_points=n_cropped,
        voxel_points=jnp.minimum(n_voxels, config.max_voxels),
        inlier_points=outl.cloud.count(),
        nonplane_points=seg.nonplane_cloud.count(),
        num_planes=seg.planes.num_planes,
        num_clusters=clus.clusters.num_clusters,
        voxel_overflow=voxel_overflow,
        cluster_overflow=comp.overflow,
        cluster_band_overflow=clus.band_overflow,
        planes_truncated=seg.truncated,
        cluster_unconverged=clus.unconverged,
    )

    debug = {}
    if config.publish_point_clouds:
        debug = dict(
            voxel_cloud=voxel_cloud,
            outlier_filtered_cloud=outl.cloud,
            plane_cloud=Cloud(points=outl.cloud.points, valid=seg.plane_union),
            # the reference publishes only the LAST extracted plane on
            # indices_cloud (each loop iteration overwrites it, cpp:393)
            last_plane_cloud=Cloud(points=outl.cloud.points, valid=seg.last_plane),
            # uncompacted non-plane cloud: the reference's planar_cloud /
            # cloud_f payload — never truncated to cluster_capacity
            nonplane_cloud=seg.nonplane_cloud,
        )

    return PipelineResult(
        grid=grid,
        centroids=centroids,
        clusters=clus.clusters,
        obstacle_cloud=comp.cloud,
        planes=seg.planes,
        stats=stats,
        **debug,
    )


def process_frames(
    frames: jax.Array,
    frame_valid: jax.Array,
    key: jax.Array,
    config: PipelineConfig,
    world_from_sensor_per_frame: RigidTransform,
    shadow_sensor_pose: RigidTransform | None = None,
) -> PipelineResult:
    """Accumulate sensor-frame scans into a world cloud, then process.

    Device-side equivalent of the reference's accumulation path
    (cpp:691-698): each of the A frames is transformed by its own stamped
    sensor pose and concatenated.  ``frames``: [A, F, 3]; ``frame_valid``:
    [A, F]; ``world_from_sensor_per_frame``: batched RigidTransform with
    leading axis A.  A*F must equal config.max_points.
    """
    A, F, _ = frames.shape
    if A * F != config.max_points:
        raise ValueError(f"A*F={A*F} != config.max_points={config.max_points}")
    world_pts = jax.vmap(lambda tf, p: tf.apply(p))(world_from_sensor_per_frame, frames)
    cloud = Cloud(
        points=world_pts.reshape(A * F, 3), valid=frame_valid.reshape(A * F)
    )
    if shadow_sensor_pose is None:
        shadow_sensor_pose = jax.tree_util.tree_map(
            lambda x: x[-1], world_from_sensor_per_frame
        )  # the reference uses the latest tf lookup for shadow geometry
    return process_scan(cloud, key, config, shadow_sensor_pose)


def jit_pipeline(config: PipelineConfig):
    """One compiled artifact per config (shapes/thresholds are static)."""
    return jax.jit(partial(process_scan, config=config))
