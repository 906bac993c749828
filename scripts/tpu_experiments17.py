"""Round-3 perf experiments, part 8: the banded cluster sweep on hardware.

1. Fullscale cluster stage at the honest capacity (C=40960): full sweep vs
   banded (window 16384) — Pallas paths.
2. Banded vs full label agreement + band_overflow on the fullscale cloud.
3. Fullscale e2e with the new config (capacity 40960 + band).
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
    from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    fcfg = REFERENCE_FULLSCALE_CONFIG
    log(f"fullscale: cluster_capacity={fcfg.cluster_capacity} "
        f"band={fcfg.cluster_band_window}")
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
    log(f"nonplane={int(seg.nonplane_cloud.count())} "
        f"cluster_overflow={bool(comp.overflow)}")

    def chain(make_body):
        def mk(m):
            def chained(*args):
                def body(carry, _):
                    return make_body(carry, *args), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return mk

    # ---- agreement + flags -------------------------------------------------
    full = jax.jit(
        lambda c: euclidean_cluster(
            c, fcfg.euc_cluster_tolerance, fcfg.euc_min_cluster_size,
            fcfg.euc_max_cluster_size, fcfg.max_clusters, fcfg.cluster_max_iters,
        )
    )(comp.cloud)
    band = jax.jit(
        lambda c: euclidean_cluster(
            c, fcfg.euc_cluster_tolerance, fcfg.euc_min_cluster_size,
            fcfg.euc_max_cluster_size, fcfg.max_clusters, fcfg.cluster_max_iters,
            band_window=fcfg.cluster_band_window,
        )
    )(comp.cloud)
    same = np.array_equal(np.asarray(full.labels), np.asarray(band.labels))
    log(f"banded labels == full labels: {same}; band_overflow="
        f"{bool(band.band_overflow)}; clusters full={int(full.clusters.num_clusters)} "
        f"band={int(band.clusters.num_clusters)}")

    # ---- timings -----------------------------------------------------------
    for name, bw in (("full", 0), ("banded", fcfg.cluster_band_window)):
        def s_clus(carry, c, bw=bw):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            r = euclidean_cluster(
                cc, fcfg.euc_cluster_tolerance, fcfg.euc_min_cluster_size,
                fcfg.euc_max_cluster_size, fcfg.max_clusters,
                fcfg.cluster_max_iters, band_window=bw,
            )
            return jnp.sum(r.clusters.sizes).astype(jnp.float32)

        t = marginal(chain(s_clus), (comp.cloud,))
        log(f"fullscale cluster[C=40960 {name}]: {t*1e3:.1f} ms/window")

    # ---- e2e ---------------------------------------------------------------
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
    log(f"fullscale e2e (honest 40960 + band): {((t3 - t1) / 2)*1e3:.1f} ms/window "
        f"(t1={t1*1e3:.0f} t3={t3*1e3:.0f})")
    r = jax.jit(lambda c, k: process_scan(c, k, fcfg))(fcloud, key)
    flags = {
        f: bool(np.asarray(getattr(r.stats, f)))
        for f in ("voxel_overflow", "cluster_overflow", "cluster_band_overflow",
                  "planes_truncated")
    }
    log(f"fullscale flags: {flags}")


if __name__ == "__main__":
    sys.exit(main())
