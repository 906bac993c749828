"""Speed-of-light table: achieved vs hardware bound per stage (FULLSCALE).

Derives docs/PERFORMANCE.md's consolidated floor table (VERDICT r4 next
#4): for every stage of the authentic 0.015-leaf fullscale window, the
chained prefix marginal (the honest achieved cost — profile_prefix.py
protocol) against the VPU/MXU/HBM lower bound computed by
utils/bounds.py from the same config + measured occupancies.  Run on the
TPU; prints a markdown table.

The bound model and its per-stage formulas are documented in
pointcloud_obstacle_processing_tpu/utils/bounds.py.  Fractions near 1 =
at the floor; larger fractions are annotated with the structural reason
where one is known (sequential run-reduce grid, sort comparator passes).
"""

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
from pointcloud_obstacle_processing_tpu.utils.bounds import (
    LATENCY_CLASS,
    stage_bounds,
)

cfg = REFERENCE_FULLSCALE_CONFIG
bounds_box = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
tfid = RigidTransform.identity()

# the bench's fullscale window (shared construction: identical workload
# to bench.py and the merge A/B scripts)
from pointcloud_obstacle_processing_tpu.utils.scene import make_fullscale_window

pts, valid = make_fullscale_window(cfg.max_points)
cloud = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
key = jax.random.PRNGKey(0)


def scalarize(x):
    return jnp.sum(x.astype(jnp.float32)) if x.dtype != jnp.float32 else jnp.sum(x)


def stage_prefix(k):
    def run(c, kk):
        seed = crop_and_seed(c, cfg)
        if k == 1:
            return scalarize(seed.hole_grid) + scalarize(seed.cloud.points)
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds_box,
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
        seg = segment_planes(outl.cloud, kk, cfg)
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
        shadows = cast_shadows(seed.hole_grid, comp.cloud, clus.clusters, tfid, cfg)
        grid = mark_obstacles(shadows.grid, seg.nonplane_cloud, cfg)
        return scalarize(grid) + scalarize(cent.points.xyzr)

    return run


# prefix index -> (stage name in the bounds table, structural note)
STAGES = [
    (1, "crop+seed", ""),
    (2, "voxel", "sort comparator passes ~2x the traffic model; "
        "run-reduce is a sequential grid (latency, not BW)"),
    (3, "outlier", ""),
    (4, "ransac", ""),
    (5, "compact", ""),
    (6, "cluster", ""),
    (7, "glue", ""),
]


def chained(fn, m):
    def run(c, k):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return fn(cc, k), None

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
    t1 = timed(f1, cloud, key)
    t4 = timed(f4, cloud, key)
    if t4 <= t1:
        t1 = timed(f1, cloud, key)
        t4 = timed(f4, cloud, key)
    return (t4 - t1) / 3.0


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # probe the tunnel
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}; "
          f"window {int(valid.sum())} pts, leaf {cfg.downsample_leaf_size}",
          flush=True)

    # occupancies for the bound model, from one real run
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan

    r = jax.jit(lambda c, k: process_scan(c, k, cfg))(cloud, key)
    n_valid = int(np.asarray(r.stats.accumulated_points))
    n_voxels = int(np.asarray(r.stats.voxel_points))
    n_rows = min(int(np.asarray(r.stats.nonplane_points)), cfg.cluster_capacity)
    print(f"occupancies: valid={n_valid} voxels={n_voxels} cluster_rows={n_rows}",
          flush=True)

    sb = stage_bounds(cfg, n_valid, n_voxels, n_rows)

    prev = 0.0
    rows_out = []
    for k, name, note in STAGES:
        t = marginal(stage_prefix(k))
        ach = max(t - prev, 0.0)
        prev = t
        bound_s, limiter, formula = sb[name]
        frac = ach / bound_s if bound_s > 0 else float("inf")
        rows_out.append((name, ach, bound_s, limiter, frac, formula, note))
        print(f"prefix 1..{k} ({name:>10}): cum {t*1e3:7.2f} ms "
              f"(marginal {ach*1e3:6.2f}; bound {bound_s*1e3:6.3f} {limiter}; "
              f"{frac:5.1f}x)", flush=True)

    print("\n| stage | achieved ms | bound ms | limiter | x of bound | model |")
    print("|---|---|---|---|---|---|")
    for name, ach, b, lim, frac, formula, note in rows_out:
        n = f" ({note})" if note else ""
        shown = "<noise" if ach < 2e-4 and name in LATENCY_CLASS else f"{frac:.1f}x"
        print(f"| {name} | {ach*1e3:.2f} | {b*1e3:.3f} | {lim} | "
              f"{shown} | {formula}{n} |")
    # worst-stage drift signal: only stages with a meaningful bound and
    # above-noise achieved cost (utils/bounds.py LATENCY_CLASS notes)
    candidates = [r for r in rows_out if r[0] not in LATENCY_CLASS]
    worst = max(candidates, key=lambda r: r[4])
    print(f"\nworst stage vs bound: {worst[0]} at {worst[4]:.1f}x", flush=True)


if __name__ == "__main__":
    main()
