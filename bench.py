"""Benchmark driver: scans/sec/chip on the BASELINE.json configs.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
and a per-stage breakdown (the reference's timing-table equivalent,
obstacle_detection.cpp:913-925) on stderr.

The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is
measured against the BASELINE.json north-star target of 1000 full
scans/sec/chip on 100k-point clouds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene
    from pointcloud_obstacle_processing_tpu.utils.timing import StageTimer, time_fn

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = REFERENCE_YAML_CONFIG.replace(
        max_points=131072,
        max_voxels=16384,
        cluster_capacity=4096,
        max_clusters=64,
        downsample_leaf_size=0.04,
    )

    # ---- 100k-point scan batch --------------------------------------------
    B = 8
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    n_pts = 0
    for i in range(B):
        p = make_scene(seed=i, spec=spec).points[: cfg.max_points]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
        n_pts += len(p)
    log(f"scan batch: {B} scans, avg {n_pts // B} pts/scan, capacity {cfg.max_points}")

    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    batched = jax.jit(jax.vmap(lambda c, k: process_scan(c, k, cfg)))
    t0 = time.perf_counter()
    out = batched(clouds, keys)
    jax.block_until_ready(out)
    log(f"compile+first batch: {time.perf_counter() - t0:.2f}s")

    # throughput (steady state, full pipeline, batch of B scans)
    t_batch = time_fn(batched, clouds, keys, iters=20, warmup=3)
    scans_per_sec = B / t_batch

    # p50 single-scan latency
    single = jax.jit(lambda c, k: process_scan(c, k, cfg))
    c0 = jax.tree_util.tree_map(lambda x: x[0], clouds)
    t_single = time_fn(single, c0, keys[0], iters=20, warmup=3)

    # ---- per-stage table (reference cpp:913-925 equivalent) ----------------
    timer = StageTimer()
    seed_fn = jax.jit(lambda c: crop_and_seed(c, cfg))
    timer.measure("occupancy grid creation", seed_fn, c0)
    seeded = seed_fn(c0)
    vox_fn = jax.jit(
        lambda c: voxel_downsample(c, cfg.downsample_leaf_size, cfg.max_voxels)
    )
    timer.measure("downsampling", vox_fn, seeded.cloud)
    vox = vox_fn(seeded.cloud)
    out_fn = jax.jit(
        lambda c: remove_statistical_outliers(
            c, cfg.statistical_outlier_mean_k, cfg.statistical_outlier_std_dev_thresh
        )
    )
    timer.measure("statistical outlier removal", out_fn, vox.cloud)
    outl = out_fn(vox.cloud)
    seg_fn = jax.jit(lambda c, k: segment_planes(c, k, cfg))
    timer.measure("plane segmentation", seg_fn, outl.cloud, keys[0])
    seg = seg_fn(outl.cloud, keys[0])
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact

    comp = jax.jit(lambda c: compact(c, cfg.cluster_capacity))(seg.nonplane_cloud)
    clus_fn = jax.jit(
        lambda c: euclidean_cluster(
            c,
            cfg.euc_cluster_tolerance,
            cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size,
            cfg.max_clusters,
            cfg.cluster_max_iters,
        )
    )
    timer.measure("euclidian clustering", clus_fn, comp.cloud)
    log(timer.table())

    stats = jax.tree_util.tree_map(lambda x: np.asarray(x), out.stats)
    log(
        "stage counts (scan 0): "
        + ", ".join(
            f"{k}={np.asarray(getattr(out.stats, k))[0]}"
            for k in (
                "accumulated_points",
                "cropped_points",
                "voxel_points",
                "inlier_points",
                "nonplane_points",
                "num_planes",
                "num_clusters",
            )
        )
    )
    log(
        f"throughput: {scans_per_sec:.1f} scans/sec/chip "
        f"(batch {B}, {t_batch*1e3:.2f} ms/batch); "
        f"p50 single-scan latency: {t_single*1e3:.2f} ms"
    )

    print(
        json.dumps(
            {
                "metric": "scans/sec/chip (100k-pt full pipeline)",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 1000.0, 4),
                "p50_latency_ms": round(t_single * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
