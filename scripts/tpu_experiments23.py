"""Round-3 perf experiments, part 14: isolate the non-voxel stages.

After the stacked run-reduce (voxel 0.66 ms/scan) the prefix profile
(tpu_experiments21.py) shows ransac 4.2, cent/shadow/mark 4.1, outlier
5.0, crop 1.3 ms/batch.  Time each stage ALONE on realistic pipeline
intermediates (chained scalar-fetch marginals) to find the next lever,
and split cent/shadow/mark into its three ops.
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

    # materialize pipeline intermediates once
    @jax.jit
    @jax.vmap
    def upto_voxel(c):
        seed = crop_and_seed(c, cfg)
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
        )
        return seed.hole_grid, vox.cloud

    hole_grid, vcloud = upto_voxel(clouds)

    @jax.jit
    @jax.vmap
    def upto_seg(c, k):
        outl = remove_statistical_outliers(
            c, cfg.statistical_outlier_mean_k,
            cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            band=cfg.knn_band, row_tile=cfg.knn_row_tile,
        )
        seg = segment_planes(outl.cloud, k, cfg)
        comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
        clus = euclidean_cluster(
            comp.cloud, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            band_window=cfg.cluster_band_window,
        )
        return outl.cloud, seg.nonplane_cloud, comp.cloud, clus.clusters

    ocloud, npcloud, ccloud, clusters = upto_seg(vcloud, keys)

    def chain2(fn, m):
        """Chain m iterations; fn(a, b) with b perturbed by carry."""

        def run(a, b):
            def body(carry, _):
                return fn(a, b + 0.0 * carry), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, a, b):
        fa, fb = chain2(fn, 1), chain2(fn, 4)
        ta, tb = timed(fa, a, b), timed(fb, a, b)
        if tb <= ta:
            ta, tb = timed(fa, a, b), timed(fb, a, b)
        return (tb - ta) / 3.0

    # --- segment_planes alone on the outlier-filtered cloud ------------------
    def seg_scalar(v, p):
        seg = jax.vmap(lambda p1, v1, k1: segment_planes(
            Cloud(points=p1, valid=v1), k1, cfg
        ))(p, v, keys)
        return (
            jnp.sum(seg.nonplane_cloud.valid.astype(jnp.float32))
            + jnp.sum(seg.planes.coeffs)
        )

    t = marg(seg_scalar, ocloud.valid, ocloud.points)
    log(f"ransac alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- outlier alone ---------------------------------------------------------
    def outl_scalar(v, p):
        o = jax.vmap(lambda p1, v1: remove_statistical_outliers(
            Cloud(points=p1, valid=v1), cfg.statistical_outlier_mean_k,
            cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            band=cfg.knn_band, row_tile=cfg.knn_row_tile,
        ))(p, v)
        return jnp.sum(o.cloud.valid.astype(jnp.float32))

    t = marg(outl_scalar, vcloud.valid, vcloud.points)
    log(f"outlier alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- cluster_centroids alone ----------------------------------------------
    def cent_scalar(cl, p):
        c = jax.vmap(lambda p1, v1, cl1: cluster_centroids(
            Cloud(points=p1, valid=v1), cl1
        ))(p, ccloud.valid, cl)
        return jnp.sum(c.points.xyzr)

    t = marg(cent_scalar, clusters, ccloud.points)
    log(f"centroids alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- cast_shadows alone ------------------------------------------------------
    def shadow_scalar(cl, p):
        g = jax.vmap(lambda hg, p1, v1, cl1: cast_shadows(
            hg, Cloud(points=p1, valid=v1), cl1, tfid, cfg
        ).grid)(hole_grid, p, ccloud.valid, cl)
        return jnp.sum(g.astype(jnp.float32))

    t = marg(shadow_scalar, clusters, ccloud.points)
    log(f"shadows alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- mark_obstacles alone ----------------------------------------------------
    def mark_scalar(v, p):
        g = jax.vmap(lambda hg, p1, v1: mark_obstacles(
            hg, Cloud(points=p1, valid=v1), cfg
        ))(hole_grid, p, v)
        return jnp.sum(g.astype(jnp.float32))

    t = marg(mark_scalar, npcloud.valid, npcloud.points)
    log(f"mark alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- crop_and_seed alone -----------------------------------------------------
    def crop_scalar(v, p):
        s = jax.vmap(lambda p1, v1: crop_and_seed(Cloud(points=p1, valid=v1), cfg))(
            p, v
        )
        return (
            jnp.sum(s.hole_grid.astype(jnp.float32))
            + jnp.sum(s.cloud.points)
            + jnp.sum(s.cloud.valid.astype(jnp.float32))
        )

    t = marg(crop_scalar, clouds.valid, clouds.points)
    log(f"crop alone (full outputs): {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- compact alone -------------------------------------------------------------
    def comp_scalar(v, p):
        c = jax.vmap(lambda p1, v1: compact(
            Cloud(points=p1, valid=v1), cfg.cluster_capacity
        ))(p, v)
        return jnp.sum(c.cloud.points) + jnp.sum(c.count.astype(jnp.float32))

    t = marg(comp_scalar, npcloud.valid, npcloud.points)
    log(f"compact alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- cluster alone ----------------------------------------------------------------
    def clus_scalar(v, p):
        cl = jax.vmap(lambda p1, v1: euclidean_cluster(
            Cloud(points=p1, valid=v1), cfg.euc_cluster_tolerance,
            cfg.euc_min_cluster_size, cfg.euc_max_cluster_size,
            cfg.max_clusters, cfg.cluster_max_iters,
            band_window=cfg.cluster_band_window,
        ))(p, v)
        return jnp.sum(cl.clusters.point_cluster.astype(jnp.float32))

    t = marg(clus_scalar, ccloud.valid, ccloud.points)
    log(f"cluster alone: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    main()
