"""Amortized per-stage device timing.

Each stage is run R times inside ONE jitted lax.scan with a data dependence
between iterations (a tiny carry-derived perturbation of the input) so XLA
cannot hoist loop-invariant work; total time / R isolates true device time
from the per-dispatch tunnel overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
from pointcloud_obstacle_processing_tpu.ops.compaction import compact
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.pipeline import process_scan
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

R = int(sys.argv[1]) if len(sys.argv) > 1 else 8

cfg = REFERENCE_YAML_CONFIG.replace(
    max_points=131072,
    max_voxels=16384,
    cluster_capacity=4096,
    max_clusters=64,
    downsample_leaf_size=0.04,
)

scene = make_scene(seed=0, spec=SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500))
p = scene.points[: cfg.max_points]
cloud = Cloud.pad_to(p, cfg.max_points)
key = jax.random.PRNGKey(0)


def amortized(fn, cloud_in, extra=None, reps=R):
    """Run fn(cloud) reps times with a carry-induced perturbation."""

    def step(carry, i):
        pert, acc = carry
        c = Cloud(points=cloud_in.points + pert, valid=cloud_in.valid)
        out = fn(c, i) if extra else fn(c)
        s = jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32))
        pert = (s * 0.0 + 1e-7 * (i.astype(jnp.float32) % 2.0))[None]
        return (pert * jnp.ones((1, 3)), acc + s), None

    def run():
        init = (jnp.zeros((1, 3)), jnp.float32(0.0))
        (pert, acc), _ = lax.scan(step, init, jnp.arange(reps))
        return acc

    j = jax.jit(run)
    jax.block_until_ready(j())
    t0 = time.perf_counter()
    jax.block_until_ready(j())
    t1 = time.perf_counter()
    return (t1 - t0) / reps


def show(name, t):
    print(f"{name:>34}: {t*1e3:9.3f} ms")


import os

if os.environ.get("PROFILE_FULL"):  # scan-wrapped full pipeline: slow compile
    t_full = amortized(lambda c: process_scan(c, key, cfg), cloud)
    show("FULL pipeline", t_full)

t = amortized(lambda c: crop_and_seed(c, cfg), cloud)
show("crop+seed (131k)", t)

seeded = jax.jit(lambda c: crop_and_seed(c, cfg))(cloud)
t = amortized(lambda c: voxel_downsample(c, cfg.downsample_leaf_size, cfg.max_voxels), seeded.cloud)
show("voxel downsample (131k->16k)", t)

vox = jax.jit(lambda c: voxel_downsample(c, cfg.downsample_leaf_size, cfg.max_voxels))(seeded.cloud)
t = amortized(
    lambda c: remove_statistical_outliers(
        c, cfg.statistical_outlier_mean_k, cfg.statistical_outlier_std_dev_thresh
    ),
    vox.cloud,
)
show("stat outlier removal (16k)", t)

outl = jax.jit(
    lambda c: remove_statistical_outliers(
        c, cfg.statistical_outlier_mean_k, cfg.statistical_outlier_std_dev_thresh
    )
)(vox.cloud)
t = amortized(lambda c, i: segment_planes(c, jax.random.fold_in(key, i), cfg), outl.cloud, extra=True)
show("plane segmentation (16k)", t)

seg = jax.jit(lambda c: segment_planes(c, key, cfg))(outl.cloud)
comp = jax.jit(lambda c: compact(c, cfg.cluster_capacity))(seg.nonplane_cloud)
t = amortized(
    lambda c: euclidean_cluster(
        c, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
        cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
    ),
    comp.cloud,
)
show("euclidean clustering (4k)", t)

t = amortized(lambda c: compact(c, cfg.cluster_capacity), seg.nonplane_cloud)
show("compaction (16k->4k)", t)
