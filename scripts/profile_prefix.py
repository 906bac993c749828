"""Cumulative-prefix profile of the batched pipeline (batch 8, TPU)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.ops.cluster import cluster_centroids, euclidean_cluster
from pointcloud_obstacle_processing_tpu.ops.compaction import compact
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed, mark_obstacles
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = REFERENCE_YAML_CONFIG.replace(
    max_points=131072, max_voxels=16384, cluster_capacity=4096,
    max_clusters=64, downsample_leaf_size=0.04,
)
B = 8
spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
pts = np.zeros((B, cfg.max_points, 3), np.float32)
valid = np.zeros((B, cfg.max_points), bool)
for i in range(B):
    p = make_scene(seed=i, spec=spec).points[: cfg.max_points]
    pts[i, : len(p)] = p
    valid[i, : len(p)] = True
clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
keys = jax.random.split(jax.random.PRNGKey(0), B)
bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
tfid = RigidTransform.identity()


def t_min(f, *a, n=10):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def stage(c, k, upto):
    seed = crop_and_seed(c, cfg)
    if upto == 1:
        return seed.hole_grid
    vox = voxel_downsample(
        seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
        cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
    )
    if upto == 2:
        return vox.cloud.points
    outl = remove_statistical_outliers(vox.cloud, 15, 4.0)
    if upto == 3:
        return outl.cloud.valid
    seg = segment_planes(outl.cloud, k, cfg)
    if upto == 4:
        return seg.nonplane_cloud.valid
    comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
    if upto == 5:
        return comp.cloud.points
    clus = euclidean_cluster(comp.cloud, 0.4, 5, 20000, cfg.max_clusters, cfg.cluster_max_iters)
    if upto == 6:
        return clus.clusters.point_cluster
    cents = cluster_centroids(comp.cloud, clus.clusters)
    g = cast_shadows(seed.hole_grid, comp.cloud, clus.clusters, tfid, cfg).grid
    g = mark_obstacles(g, seg.nonplane_cloud, cfg)
    return g, cents.points.xyzr


names = ["crop", "+voxel", "+outlier", "+ransac", "+compact", "+cluster", "+shadow/mark"]
prev = 0.0
for i, name in enumerate(names, start=1):
    f = jax.jit(jax.vmap(lambda c, k, u=i: stage(c, k, u)))
    t = t_min(f, clouds, keys)
    print(f"{name:>14}: cum {t*1e3:8.2f} ms  delta {(t-prev)*1e3:8.2f} ms", flush=True)
    prev = t
