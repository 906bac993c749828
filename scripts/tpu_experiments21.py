"""Round-3 perf experiments, part 12: post-fused-kernel stage profile.

With the fused run-reduce landed (621 scans/s baseline + fused kernel),
re-profile where the 1.6 ms/scan actually goes:

A. cumulative-prefix STAGE MARGINALS at the flagship shape with the
   scalar-fetch chained discipline (the old profile_prefix.py uses
   block_until_ready, which is not a fence through the tunnel);
B. runreduce window-size (group) sweep + sort-alone cost isolation —
   how much of the voxel stage is the lax.sort vs the fused pass.
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

    # ---- A. prefix marginals ------------------------------------------------
    def prefix(cloud, key, upto: int):
        seed = crop_and_seed(cloud, cfg)
        if upto == 1:
            return jnp.sum(seed.hole_grid.astype(jnp.float32)) + seed.cloud.count()
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
        )
        if upto == 2:
            return jnp.sum(vox.cloud.points) + vox.num_voxels.astype(jnp.float32)
        outl = remove_statistical_outliers(
            vox.cloud, cfg.statistical_outlier_mean_k,
            cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            band=cfg.knn_band, row_tile=cfg.knn_row_tile,
        )
        if upto == 3:
            return outl.cloud.count().astype(jnp.float32)
        seg = segment_planes(outl.cloud, key, cfg)
        if upto == 4:
            return seg.nonplane_cloud.count().astype(jnp.float32)
        comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
        if upto == 5:
            return jnp.sum(comp.cloud.points) + comp.count.astype(jnp.float32)
        clus = euclidean_cluster(
            comp.cloud, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            band_window=cfg.cluster_band_window,
        )
        if upto == 6:
            return clus.clusters.num_clusters.astype(jnp.float32)
        cents = cluster_centroids(comp.cloud, clus.clusters)
        g = cast_shadows(seed.hole_grid, comp.cloud, clus.clusters, tfid, cfg).grid
        g = mark_obstacles(g, seg.nonplane_cloud, cfg)
        return jnp.sum(g.astype(jnp.float32)) + jnp.sum(cents.points.xyzr)

    def chained(upto: int, m: int):
        def run(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                s = jnp.sum(jax.vmap(lambda c1, k1: prefix(c1, k1, upto))(cc, k))
                return s.astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(upto: int):
        fa, fb = chained(upto, 1), chained(upto, 4)
        ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
        if tb <= ta:
            ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
        return (tb - ta) / 3.0

    names = ["crop", "+voxel", "+outlier", "+ransac", "+compact", "+cluster",
             "+cent/shadow/mark"]
    prev = 0.0
    for i, name in enumerate(names, start=1):
        t = marg(i)
        log(f"{name:>18}: cum {t*1e3:7.2f} ms/batch  delta {(t-prev)*1e3:7.2f} "
            f"({(t-prev)/B*1e3:6.3f} ms/scan)")
        prev = t

    # ---- B. sort vs fused-reduce split + group sweep ------------------------
    from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
        sorted_run_reduce,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec

    imin, dims = _pack_spec(bounds, cfg.downsample_leaf_size)
    K = dims[0] * dims[1] * dims[2]
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels

    def sorted_inputs(cloud):
        p = cloud.points
        v = cloud.valid & jnp.all(jnp.isfinite(p), axis=-1)
        ijk = jnp.floor(p / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(v, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0).astype(
                jnp.float32
            )
            * jnp.float32(leaf)
        )
        off0 = jnp.where(v[None, :], p.T - corner0, 0.0)
        return lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud
    skey, sox, soy, soz = jax.jit(jax.vmap(sorted_inputs))(vcloud)
    soffs = jnp.stack([sox, soy, soz], axis=1)  # [B, 3, N]

    def chain_arr(fn, m):
        """Chain m iterations where fn consumes (arr + 0*carry)."""

        def run(a, b):
            def body(carry, _):
                return fn(a, b + 0.0 * carry), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg2(fn, a, b):
        fa, fb = chain_arr(fn, 1), chain_arr(fn, 4)
        ta, tb = timed(fa, a, b), timed(fb, a, b)
        if tb <= ta:
            ta, tb = timed(fa, a, b), timed(fb, a, b)
        return (tb - ta) / 3.0

    # sort alone (chained on points)
    def sort_scalar(v, p):
        c = Cloud(points=p, valid=v)
        out = jax.vmap(sorted_inputs)(c)
        return jnp.sum(out[0]).astype(jnp.float32) + jnp.sum(out[1])

    t_sort = marg2(sort_scalar, vcloud.valid, vcloud.points)
    log(f"sort alone: {t_sort*1e3:.2f} ms/batch ({t_sort/B*1e3:.3f} ms/scan)")

    # fused reduce alone (chained on offsets; keys static)
    for group in (4, 8, 16, 32):

        def red_scalar(k, o, g=group):
            vals, num = jax.vmap(
                lambda k1, o1: sorted_run_reduce(k1, o1, K, capacity, group=g)
            )(k, o)
            return jnp.sum(vals) + jnp.sum(num).astype(jnp.float32)

        t = marg2(red_scalar, skey, soffs)
        log(f"fused reduce group={group:2d}: {t*1e3:.2f} ms/batch "
            f"({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    main()
