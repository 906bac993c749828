"""Cumulative-prefix stage profile of the batched pipeline (FLAGSHIP, TPU).

Per-stage marginal cost via CHAINED PREFIX programs: prefix k runs stages
1..k, reduced to an on-device scalar; each program is timed as the
marginal of a 4-chain vs a 1-chain (data-dependent loop carries, so XLA
cannot elide iterations), which subtracts dispatch/RPC exactly.  Stage k's
cost = prefix_k - prefix_{k-1}.  This is the honest version of the old
block_until_ready harness: through the axon tunnel block_until_ready is
NOT a fence and every dispatch+fetch is a ~26 ms RPC (CLAUDE.md).

The prefix discipline charges each stage for the fusion context it
actually runs in — unlike stage-alone timings, which miss work that XLA
hoists between stages (e.g. the RANSAC valid-first permutation that the
round-3 log found hiding OUTSIDE the profiled stage jits).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
from pointcloud_obstacle_processing_tpu.ops.cluster import (
    cluster_centroids,
    euclidean_cluster,
)
from pointcloud_obstacle_processing_tpu.ops.compaction import compact
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed, mark_obstacles
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = FLAGSHIP_CONFIG
B = 32
spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
pts = np.zeros((B, cfg.max_points, 3), np.float32)
valid = np.zeros((B, cfg.max_points), bool)
scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(8)]
for i in range(B):
    p = scenes[i % 8]
    pts[i, : len(p)] = p
    valid[i, : len(p)] = True
clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
keys = jax.random.split(jax.random.PRNGKey(0), B)
bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
tfid = RigidTransform.identity()


def scalarize(x):
    return jnp.sum(x.astype(jnp.float32)) if x.dtype != jnp.float32 else jnp.sum(x)


def stage_prefix(k):
    """Stages 1..k of process_scan, reduced to one scalar."""

    def run(cloud, key):
        seed = crop_and_seed(cloud, cfg)
        if k == 1:
            return scalarize(seed.hole_grid) + scalarize(seed.cloud.points)
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )
        if k == 2:
            return scalarize(vox.cloud.points) + scalarize(vox.num_voxels)
        outl = remove_statistical_outliers(
            vox.cloud, cfg.statistical_outlier_mean_k,
            cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            band=cfg.knn_band, row_tile=cfg.knn_row_tile,
                skip_dead_tiles=cfg.knn_skip_dead_tiles,
        )
        if k == 3:
            return scalarize(outl.cloud.points) + scalarize(outl.cloud.valid)
        seg = segment_planes(outl.cloud, key, cfg)
        if k == 4:
            return scalarize(seg.nonplane_cloud.points) + scalarize(
                seg.nonplane_cloud.valid
            )
        comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
        if k == 5:
            return scalarize(comp.cloud.points) + scalarize(comp.count)
        clus = euclidean_cluster(
            comp.cloud, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            band_window=cfg.cluster_band_window,
        )
        if k == 6:
            return scalarize(clus.clusters.point_cluster)
        cent = cluster_centroids(comp.cloud, clus.clusters)
        if k == 7:
            return scalarize(cent.points.xyzr) + scalarize(clus.clusters.point_cluster)
        shadows = cast_shadows(seed.hole_grid, comp.cloud, clus.clusters, tfid, cfg)
        if k == 8:
            return scalarize(shadows.grid) + scalarize(cent.points.xyzr)
        grid = mark_obstacles(shadows.grid, seg.nonplane_cloud, cfg)
        return scalarize(grid) + scalarize(cent.points.xyzr)

    return run


NAMES = [
    "crop+seed", "voxel", "outlier", "ransac", "compact", "cluster",
    "centroids", "shadows", "mark+grid",
]


def chained(fn, m):
    def run(c, k):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return jnp.sum(jax.vmap(fn, in_axes=(0, 0))(cc, k)), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def timed(fn, *args, iters=4):
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(fn):
    f1, f4 = chained(fn, 1), chained(fn, 4)
    t1 = timed(f1, clouds, keys)
    t4 = timed(f4, clouds, keys)
    if t4 <= t1:  # tunnel hiccup: remeasure once
        t1 = timed(f1, clouds, keys)
        t4 = timed(f4, clouds, keys)
    return (t4 - t1) / 3.0


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}; "
          f"B={B}, capacity {cfg.max_points}, voxels {cfg.max_voxels}, "
          f"cluster cap {cfg.cluster_capacity}", flush=True)
    prev = 0.0
    for k in range(1, 10):
        t = marginal(stage_prefix(k))
        print(
            f"prefix 1..{k} ({NAMES[k-1]:>10}): {t*1e3:7.2f} ms/batch "
            f"(+{(t-prev)*1e3:6.2f} = {(t-prev)/B*1e3:6.3f} ms/scan)",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
