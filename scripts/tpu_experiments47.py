"""Round-3 perf experiments, part 38: fullscale-window prefix profile.

The authentic reference configuration (params.yaml leaf 0.015 over a
2M-point accumulation window) runs at 45.1 ms/window on v5e.  The
flagship's stage economics do not transfer (one window, not a batch of
32; C=16384 keeps scatter cluster hooks; knn_band=1792) — this measures
where the window actually spends its time, with the same chained-prefix
marginal discipline as scripts/profile_prefix.py (prefix k = stages 1..k
reduced to a scalar; marginal of a 3-chain vs 1-chain subtracts RPC).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
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

cfg = REFERENCE_FULLSCALE_CONFIG
bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
tfid = RigidTransform.identity()


def build_window():
    # identical construction to bench.py's fullscale window
    fspec = SceneSpec(
        n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000
    )
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(8)
    ]
    fpts = np.concatenate(parts)[: cfg.max_points]
    fcloud_np = np.zeros((cfg.max_points, 3), np.float32)
    fcloud_np[: len(fpts)] = fpts
    fvalid = np.zeros(cfg.max_points, bool)
    fvalid[: len(fpts)] = True
    return Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))


def scalarize(x):
    return jnp.sum(x.astype(jnp.float32)) if x.dtype != jnp.float32 else jnp.sum(x)


def stage_prefix(k):
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
            return fn(cc, k), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    dev = jax.devices()[0]
    print(
        f"device: {dev.platform} {dev.device_kind}; capacity {cfg.max_points}, "
        f"voxels {cfg.max_voxels}, cluster cap {cfg.cluster_capacity}, "
        f"band_window {cfg.cluster_band_window}, knn_band {cfg.knn_band}",
        flush=True,
    )
    cloud = build_window()
    key = jax.random.PRNGKey(0)

    prev = 0.0
    for k in range(1, 10):
        f1 = chained(stage_prefix(k), 1)
        f3 = chained(stage_prefix(k), 3)
        np.asarray(f1(cloud, key)); np.asarray(f3(cloud, key))  # compile
        ts1, ts3 = [], []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f1(cloud, key))
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f3(cloud, key))
            ts3.append(time.perf_counter() - t0)
        marg = (min(ts3) - min(ts1)) / 2.0
        print(
            f"prefix 1..{k} ({NAMES[k-1]:>10}): {marg*1e3:8.2f} ms/window "
            f"(+{(marg-prev)*1e3:7.2f})",
            flush=True,
        )
        prev = marg


if __name__ == "__main__":
    main()
