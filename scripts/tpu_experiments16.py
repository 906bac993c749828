"""Round-3 perf experiments, part 7: close the fullscale e2e gap.

exp15's stages sum to ~45 ms/window but exp14 measured 150 ms e2e.
Measure the pieces exp15 skipped — crop_and_seed at 2M points, the
nonplane->cluster_capacity compaction, shadows+mark+centroids — plus a
fresh e2e, and the voxel stage at an adaptive compaction group.
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


def marginal(make_chained, args, a=1, b=3):
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
    from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
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

    dev = jax.devices()[0]
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    fcfg = REFERENCE_FULLSCALE_CONFIG
    fspec = SceneSpec(n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000)
    parts = [make_scene(seed=100 + i, spec=fspec).points for i in range(8)]
    fpts = np.concatenate(parts)[: fcfg.max_points]
    fbuf = np.zeros((fcfg.max_points, 3), np.float32)
    fbuf[: len(fpts)] = fpts
    fvalid = np.zeros(fcfg.max_points, bool)
    fvalid[: len(fpts)] = True
    fcloud = Cloud(points=jnp.asarray(fbuf), valid=jnp.asarray(fvalid))
    key = jax.random.PRNGKey(0)
    bounds = ((fcfg.x_min, fcfg.y_min, fcfg.z_min), (fcfg.x_max, fcfg.y_max, fcfg.z_max))

    def chain(make_body):
        def mk(m):
            def chained(*args):
                def body(carry, _):
                    return make_body(carry, *args), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return mk

    seeded = jax.jit(lambda c: crop_and_seed(c, fcfg))(fcloud)
    vox = jax.jit(
        lambda c: voxel_downsample(
            c, fcfg.downsample_leaf_size, fcfg.max_voxels, bounds,
            fcfg.voxel_sum_precision,
        )
    )(seeded.cloud)
    outl = jax.jit(
        lambda c: remove_statistical_outliers(
            c, fcfg.statistical_outlier_mean_k,
            fcfg.statistical_outlier_std_dev_thresh, backend="banded",
            band=fcfg.knn_band, row_tile=fcfg.knn_row_tile,
        )
    )(vox.cloud)
    seg = jax.jit(lambda c, k: segment_planes(c, k, fcfg))(outl.cloud, key)
    comp = jax.jit(lambda c: compact(c, fcfg.cluster_capacity))(seg.nonplane_cloud)
    clus = jax.jit(
        lambda c: euclidean_cluster(
            c, fcfg.euc_cluster_tolerance, fcfg.euc_min_cluster_size,
            fcfg.euc_max_cluster_size, fcfg.max_clusters, fcfg.cluster_max_iters,
        )
    )(comp.cloud)
    tfid = RigidTransform.identity()

    # ---- pieces exp15 skipped ---------------------------------------------
    def s_crop(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = crop_and_seed(cc, fcfg)
        return jnp.sum(r.counts).astype(jnp.float32)

    t = marginal(chain(s_crop), (fcloud,))
    log(f"fullscale crop_and_seed: {t*1e3:.1f} ms/window")

    def s_compact(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = compact(cc, fcfg.cluster_capacity)
        return jnp.sum(r.cloud.points).astype(jnp.float32)

    t = marginal(chain(s_compact), (seg.nonplane_cloud,))
    log(f"fullscale compact(nonplane->16384): {t*1e3:.1f} ms/window")

    def s_shadow_mark(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        g = cast_shadows(seeded.hole_grid, comp.cloud, clus.clusters, tfid, fcfg).grid
        g = mark_obstacles(g, cc, fcfg)
        cent = cluster_centroids(comp.cloud, clus.clusters)
        return (
            jnp.sum(g.astype(jnp.int32)) + jnp.sum(cent.points.xyzr)
        ).astype(jnp.float32)

    t = marginal(chain(s_shadow_mark), (seg.nonplane_cloud,))
    log(f"fullscale shadows+mark+centroids: {t*1e3:.1f} ms/window")

    # ---- fresh e2e ---------------------------------------------------------
    def f_chain(m):
        def chained(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                r = process_scan(cc, k, fcfg)
                return jnp.sum(r.grid.data.astype(jnp.int32)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    f1, f3 = f_chain(1), f_chain(3)
    t1 = timed(f1, fcloud, key, iters=3)
    t3 = timed(f3, fcloud, key, iters=3)
    if t3 <= t1:
        t1, t3 = timed(f1, fcloud, key, iters=3), timed(f3, fcloud, key, iters=3)
    log(f"fullscale e2e: {((t3 - t1) / 2)*1e3:.1f} ms/window "
        f"(t1={t1*1e3:.0f} t3={t3*1e3:.0f})")


if __name__ == "__main__":
    sys.exit(main())
