"""Benchmark driver: scans/sec/chip on the BASELINE.json configs.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
and a per-stage breakdown (the reference's timing-table equivalent,
obstacle_detection.cpp:913-925) on stderr.

Measurement notes: on the axon-tunneled TPU, ``block_until_ready`` is not a
reliable fence and host transfers run ~50 MB/s, so every timed function is
reduced to a scalar on device and synced by fetching that scalar — timings
contain compute only.

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


def _timed(fn, *args, iters=5):
    """Min wall-clock of fn(*args) where fn returns a small array."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene
    from pointcloud_obstacle_processing_tpu.utils.timing import StageTimer

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
    B = 32
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    n_pts = 0
    uniq = min(B, 8)  # 8 distinct scenes, tiled
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(uniq)]
    for i in range(B):
        p = scenes[i % uniq]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
        n_pts += len(p)
    log(f"scan batch: {B} scans, avg {n_pts // B} pts/scan, capacity {cfg.max_points}")

    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    pipe = jax.vmap(lambda c, k: process_scan(c, k, cfg))

    @jax.jit
    def batched_scalar(c, k):
        r = pipe(c, k)
        # tiny result: forces the whole pipeline, transfers ~4 bytes
        return jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(r.clusters.num_clusters)

    t0 = time.perf_counter()
    np.asarray(batched_scalar(clouds, keys))
    log(f"compile+first batch: {time.perf_counter() - t0:.2f}s")

    t_batch = _timed(batched_scalar, clouds, keys, iters=6)
    scans_per_sec = B / t_batch

    # p50 single-scan latency (scalarized output as well)
    @jax.jit
    def single_scalar(c, k):
        r = process_scan(c, k, cfg)
        return jnp.sum(r.grid.data.astype(jnp.int32))

    c0 = jax.tree_util.tree_map(lambda x: x[0], clouds)
    lat = []
    np.asarray(single_scalar(c0, keys[0]))
    for _ in range(11):
        t0 = time.perf_counter()
        np.asarray(single_scalar(c0, keys[0]))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    t_single = lat[len(lat) // 2]

    # ---- per-stage table (reference cpp:913-925 equivalent) ----------------
    # each stage timed batched with a scalar reduction; deltas are honest.
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    def s_crop(c):
        r = jax.vmap(lambda cc: crop_and_seed(cc, cfg))(c)
        return jnp.sum(r.counts)

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)

    def s_vox(c):
        r = jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )(c)
        return jnp.sum(r.cloud.points)

    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )
    )(seeded.cloud)

    def s_out(c):
        r = jax.vmap(
            lambda cc: remove_statistical_outliers(
                cc, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            )
        )(c)
        return jnp.sum(r.cloud.valid)

    outl = jax.jit(
        jax.vmap(
            lambda cc: remove_statistical_outliers(
                cc, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            )
        )
    )(vox.cloud)

    def s_seg(c, k):
        r = jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg))(c, k)
        return jnp.sum(r.nonplane_cloud.valid)

    seg = jax.jit(jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg)))(outl.cloud, keys)
    comp = jax.jit(jax.vmap(lambda cc: compact(cc, cfg.cluster_capacity)))(seg.nonplane_cloud)

    def s_clus(c):
        r = jax.vmap(
            lambda cc: euclidean_cluster(
                cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )(c)
        return jnp.sum(r.clusters.sizes)

    timer = StageTimer()
    t_crop = _timed(jax.jit(s_crop), clouds) / B
    t_vox = _timed(jax.jit(s_vox), seeded.cloud) / B
    t_out = _timed(jax.jit(s_out), vox.cloud) / B
    t_seg = _timed(jax.jit(s_seg), outl.cloud, keys) / B
    t_clus = _timed(jax.jit(s_clus), comp.cloud) / B
    timer.record("occupancy grid creation", t_crop)
    timer.record("downsampling", t_vox)
    timer.record("statistical outlier removal", t_out)
    timer.record("plane segmentation", t_seg)
    timer.record("euclidian clustering", t_clus)
    log(timer.table())

    # BASELINE.json config throughputs (#1 crop+voxel, #2 ransac+outlier,
    # #3 cluster extraction, #4 full pipeline, #5 batched stream)
    baseline_configs = {
        "1_crop_voxel_scans_per_s": round(1.0 / (t_crop + t_vox), 1),
        "2_outlier_ransac_scans_per_s": round(1.0 / (t_out + t_seg), 1),
        "3_cluster_extraction_scans_per_s": round(1.0 / t_clus, 1),
        "4_full_pipeline_p50_latency_ms": None,  # filled below
        "5_batched_stream_scans_per_s": None,
    }

    result = jax.jit(pipe)(clouds, keys)
    log(
        "stage counts (scan 0): "
        + ", ".join(
            f"{k}={np.asarray(getattr(result.stats, k))[0]}"
            for k in (
                "accumulated_points", "cropped_points", "voxel_points",
                "inlier_points", "nonplane_points", "num_planes", "num_clusters",
            )
        )
    )
    log(
        f"throughput: {scans_per_sec:.1f} scans/sec/chip "
        f"(batch {B}, {t_batch*1e3:.2f} ms/batch); "
        f"p50 single-scan latency: {t_single*1e3:.2f} ms"
    )

    baseline_configs["4_full_pipeline_p50_latency_ms"] = round(t_single * 1e3, 3)
    baseline_configs["5_batched_stream_scans_per_s"] = round(scans_per_sec, 2)

    print(
        json.dumps(
            {
                "metric": "scans/sec/chip (100k-pt full pipeline)",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 1000.0, 4),
                "p50_latency_ms": round(t_single * 1e3, 3),
                "configs": baseline_configs,
            }
        )
    )


if __name__ == "__main__":
    main()
