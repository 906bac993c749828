"""Round-3 perf experiments, part 3: where does the honest config spend?

a. per-stage marginals at the honest flagship (24576 voxels, cluster 1024)
b. knn_row_tile 128/256/512 under the sortnet selector
c. banded distance computation alone (selection lower bound)
d. compaction group 8/16/32 at the 131072-row voxel table
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=4):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make_chained, args, a=1, b=5):
    fa, fb = make_chained(a), make_chained(b)
    ta, tb = timed(fa, *args), timed(fb, *args)
    if tb <= ta:
        ta, tb = timed(fa, *args), timed(fb, *args)
    return (tb - ta) / (b - a)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed, mark_obstacles
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
    from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((128, 128))
    np.asarray(jnp.sum(x @ x))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG.replace(max_voxels=24576, cluster_capacity=1024)
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

    def chain(make_body):
        def mk(m):
            def chained(*args):
                def body(carry, _):
                    return make_body(carry, *args), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return mk

    # staged inputs
    seeded = jax.jit(jax.vmap(lambda c: crop_and_seed(c, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda c: voxel_downsample(
                c, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )
    )(seeded.cloud)
    outl = jax.jit(
        jax.vmap(
            lambda c: remove_statistical_outliers(
                c, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend="banded",
                band=cfg.knn_band, row_tile=cfg.knn_row_tile,
            )
        )
    )(vox.cloud)
    seg = jax.jit(jax.vmap(lambda c, k: segment_planes(c, k, cfg)))(outl.cloud, keys)
    comp = jax.jit(jax.vmap(lambda c: compact(c, cfg.cluster_capacity)))(seg.nonplane_cloud)

    # ---- a. per-stage marginals -------------------------------------------
    def s_crop(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = jax.vmap(lambda x: crop_and_seed(x, cfg))(cc)
        return jnp.sum(r.counts).astype(jnp.float32)

    def s_vox(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = jax.vmap(
            lambda x: voxel_downsample(
                x, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )(cc)
        return jnp.sum(r.cloud.points).astype(jnp.float32)

    def s_out(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = jax.vmap(
            lambda x: remove_statistical_outliers(
                x, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend="banded",
                band=cfg.knn_band, row_tile=cfg.knn_row_tile,
            )
        )(cc)
        return jnp.sum(r.cloud.valid).astype(jnp.float32)

    def s_seg(carry, c, k):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = jax.vmap(lambda a, b: segment_planes(a, b, cfg))(cc, k)
        return jnp.sum(r.nonplane_cloud.valid).astype(jnp.float32)

    def s_clus(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = jax.vmap(
            lambda x: euclidean_cluster(
                x, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )(cc)
        return jnp.sum(r.clusters.sizes).astype(jnp.float32)

    for name, body, args in (
        ("crop", s_crop, (clouds,)),
        ("voxel", s_vox, (seeded.cloud,)),
        ("outlier", s_out, (vox.cloud,)),
        ("ransac", s_seg, (outl.cloud, keys)),
        ("cluster", s_clus, (comp.cloud,)),
    ):
        t = marginal(chain(body), args)
        log(f"stage[{name}]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # ---- b. knn_row_tile sweep --------------------------------------------
    for rt in (128, 256, 512):
        def s_out_rt(carry, c, rt=rt):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            r = jax.vmap(
                lambda x: remove_statistical_outliers(
                    x, cfg.statistical_outlier_mean_k,
                    cfg.statistical_outlier_std_dev_thresh, backend="banded",
                    band=cfg.knn_band, row_tile=rt,
                )
            )(cc)
            return jnp.sum(r.cloud.valid).astype(jnp.float32)

        t = marginal(chain(s_out_rt), (vox.cloud,))
        log(f"outlier[row_tile={rt}]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # ---- c. distance lower bound ------------------------------------------
    from pointcloud_obstacle_processing_tpu.ops import outliers as O

    def s_dist(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)

        def one(cl):
            old = O._sortnet_mean
            O._sortnet_mean = lambda planes, k, big: jnp.min(
                jnp.stack([jnp.min(p, axis=-1) for p in planes]), axis=0
            )
            try:
                d = O.knn_mean_distances(
                    cl, cfg.statistical_outlier_mean_k, cfg.knn_row_tile,
                    "banded", cfg.knn_band,
                )
            finally:
                O._sortnet_mean = old
            return jnp.sum(d)

        return jnp.sum(jax.vmap(one)(cc)).astype(jnp.float32)

    t = marginal(chain(s_dist), (vox.cloud,))
    log(f"outlier[distances+min only]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # ---- d. compaction group sweep ----------------------------------------
    from pointcloud_obstacle_processing_tpu.ops import voxel as V
    from pointcloud_obstacle_processing_tpu.ops import pallas_compaction as PC

    for grp in (8, 16, 32):
        orig = PC.compact_and_gather_exact

        def patched(bins, occ2d, capacity, use_pallas=None, group=16,
                    interpret=False, _g=grp):
            return orig(bins, occ2d, capacity, use_pallas, _g, interpret)

        PC.compact_and_gather_exact = patched
        V.compact_and_gather_exact = patched  # voxel imported it into its ns?
        try:
            t = marginal(chain(s_vox), (seeded.cloud,))
        finally:
            PC.compact_and_gather_exact = orig
            V.compact_and_gather_exact = orig
        log(f"voxel[group={grp}]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    sys.exit(main())
