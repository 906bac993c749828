"""Round-3 perf experiments, part 41: fullscale FULL-pipeline stage profile.

The bench reports the fullscale (0.015-leaf, 2M-point window) pipeline at
~30 ms/window but only measures the total.  This script runs the chained
3-vs-1 prefix-marginal protocol (scripts/profile_prefix.py's discipline)
over ALL eight stages at the fullscale shape, so the next optimization
target is picked from measurements, not guesses.

Prefixes (pipeline.py stage order):
  p1 crop+seed  p2 +voxel  p3 +outlier  p4 +ransac  p5 +compact+cluster
  p6 +centroids p7 +shadows p8 +mark (full pipeline)
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


def build_window():
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
    x = jnp.asarray(x)
    return jnp.sum(x.astype(jnp.float32))


def prefix_fn(k):
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    tfid = RigidTransform.identity()
    key = jax.random.PRNGKey(0)

    def run(cloud):
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
            return scalarize(outl.mean_distances) + scalarize(outl.cloud.valid)
        seg = segment_planes(outl.cloud, key, cfg)
        if k == 4:
            return scalarize(seg.nonplane_cloud.valid) + scalarize(
                seg.planes.num_planes
            )
        comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
        clus = euclidean_cluster(
            comp.cloud, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            band_window=cfg.cluster_band_window,
        )
        if k == 5:
            return scalarize(clus.clusters.num_clusters) + scalarize(
                clus.clusters.point_cluster
            )
        cent = cluster_centroids(comp.cloud, clus.clusters)
        if k == 6:
            return scalarize(cent.points.xyzr)
        shadows = cast_shadows(seed.hole_grid, comp.cloud, clus.clusters, tfid, cfg)
        if k == 7:
            return scalarize(shadows.grid)
        grid_data = mark_obstacles(shadows.grid, seg.nonplane_cloud, cfg)
        return scalarize(grid_data)

    return run


def chained(fn, m):
    def run(c):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return fn(cc), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    cloud = build_window()

    progs = {}
    for k in range(1, 9):
        f1 = chained(prefix_fn(k), 1)
        f4 = chained(prefix_fn(k), 4)
        v = float(np.asarray(f1(cloud)))
        np.asarray(f4(cloud))
        progs[k] = (f1, f4)
        print(f"compiled p{k}: scalar={v:.6e}", flush=True)

    margs = {k: [] for k in progs}
    for rnd in range(3):
        for k, (f1, f4) in progs.items():
            ts1, ts4 = [], []
            for _ in range(2):
                t0 = time.perf_counter(); np.asarray(f1(cloud))
                ts1.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f4(cloud))
                ts4.append(time.perf_counter() - t0)
            marg = (min(ts4) - min(ts1)) / 3.0
            margs[k].append(marg)
            print(f"round {rnd} p{k}: {marg*1e3:7.2f} ms/window", flush=True)

    print("\nstage table (median prefix marginals):", flush=True)
    names = ["crop+seed", "voxel", "outlier", "ransac", "compact+cluster",
             "centroids", "shadows", "mark"]
    prev = 0.0
    for k in range(1, 9):
        med = sorted(margs[k])[1]
        print(f"  p{k} {names[k-1]:16s} prefix {med*1e3:7.2f} ms  "
              f"stage {(med-prev)*1e3:7.2f} ms", flush=True)
        prev = med


if __name__ == "__main__":
    main()
