"""Round-3 perf experiments, part 10: full-pipeline cumulative prefixes.

exp18 decomposed the voxel stage; this measures the WHOLE process_scan as
cumulative prefixes at FLAGSHIP_CONFIG, batch 32, chained marginals — to
find the non-stage glue ("rest") the per-stage table misses.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=3):
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
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.cluster import (
        cluster_centroids,
        euclidean_cluster,
    )
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import (
        crop_and_seed,
        mark_obstacles,
    )
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
    from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

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

    def leafsum(x):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(x)
            if hasattr(l, "dtype")
        )

    def stage_prefix(upto: int):
        def one(cloud, key):
            acc = 0.0
            seed = crop_and_seed(cloud, cfg)
            if upto == 0:
                return leafsum(seed)
            vox = voxel_downsample(
                seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            )
            if upto == 1:
                return leafsum(vox) + leafsum(seed.hole_grid)
            outl = remove_statistical_outliers(
                vox.cloud, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh,
                backend=cfg.knn_backend, band=cfg.knn_band,
                row_tile=cfg.knn_row_tile,
            )
            if upto == 2:
                return leafsum(outl.cloud.valid) + leafsum(seed.hole_grid)
            seg = segment_planes(outl.cloud, key, cfg)
            if upto == 3:
                return leafsum(seg.nonplane_cloud.valid) + leafsum(seed.hole_grid)
            comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
            if upto == 4:
                return leafsum(comp.cloud) + leafsum(seed.hole_grid)
            clus = euclidean_cluster(
                comp.cloud, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
                band_window=cfg.cluster_band_window,
            )
            if upto == 5:
                return leafsum(clus.clusters.sizes) + leafsum(seed.hole_grid)
            cent = cluster_centroids(comp.cloud, clus.clusters)
            if upto == 6:
                return leafsum(cent) + leafsum(seed.hole_grid)
            sh = cast_shadows(seed.hole_grid, comp.cloud, clus.clusters, tfid, cfg)
            if upto == 7:
                return leafsum(sh.grid) + leafsum(cent)
            grid = mark_obstacles(sh.grid, seg.nonplane_cloud, cfg)
            return leafsum(grid) + leafsum(cent)

        return one

    def chained(fn, m):
        def run(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jnp.sum(jax.vmap(fn)(cc, k)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn):
        fa, fb = chained(fn, 1), chained(fn, 4)
        ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
        if tb <= ta:
            ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
        return (tb - ta) / 3.0

    names = [
        "crop_and_seed", "+ voxel", "+ outlier", "+ ransac", "+ compact",
        "+ cluster", "+ centroids", "+ shadows", "+ mark (grid done)",
    ]
    prev = 0.0
    for i, name in enumerate(names):
        t = marg(stage_prefix(i))
        log(
            f"{name:22s}: {t*1e3:7.2f} ms/batch (+{(t-prev)*1e3:6.2f}) "
            f"({t/B*1e3:.3f} ms/scan)"
        )
        prev = t

    def full(cloud, key):
        r = process_scan(cloud, key, cfg)
        return jnp.sum(r.grid.data.astype(jnp.int32)).astype(jnp.float32) + jnp.sum(
            r.clusters.num_clusters
        )

    t = marg(full)
    log(f"{'full process_scan':22s}: {t*1e3:7.2f} ms/batch (+{(t-prev)*1e3:6.2f})")


if __name__ == "__main__":
    main()
