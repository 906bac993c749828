"""Round-3 perf experiments, part 6: the fullscale regression.

exp14 showed the 0.015-leaf window at 150 ms vs r2's 77-86 ms, with a
(previously silent) cluster_overflow.  Suspects:
a. compaction group=8 at the 2M-row table = 2048 sequential steps (r2 ran
   1024 at group=16) — per-stage voxel marginal at groups 8/16/32;
b. Pallas sortnet at nc=256 (VMEM pressure) — outlier stage A/B:
   pallas net / XLA net / kmin extraction at the fullscale window;
c. fullscale stage profile + true nonplane count (to size
   cluster_capacity honestly).
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
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((128, 128))
    np.asarray(jnp.sum(x @ x))
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

    # staged inputs
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
    log(f"counts: voxels={int(vox.num_voxels)} inliers={int(outl.cloud.count())} "
        f"nonplane={int(seg.nonplane_cloud.count())} (cluster cap {fcfg.cluster_capacity})")

    # ---- a. voxel stage vs compaction group --------------------------------
    from pointcloud_obstacle_processing_tpu.ops import pallas_compaction as PC

    orig = PC.compact_and_gather_exact

    def s_vox(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = voxel_downsample(
            cc, fcfg.downsample_leaf_size, fcfg.max_voxels, bounds,
            fcfg.voxel_sum_precision,
        )
        return jnp.sum(r.cloud.points).astype(jnp.float32)

    for grp in (8, 16, 32):
        def patched(bins, occ2d, capacity, use_pallas=None, group=8,
                    interpret=False, _g=grp):
            return orig(bins, occ2d, capacity, use_pallas, _g, interpret)

        PC.compact_and_gather_exact = patched
        try:
            t = marginal(chain(s_vox), (seeded.cloud,))
        finally:
            PC.compact_and_gather_exact = orig
        log(f"fullscale voxel[group={grp}]: {t*1e3:.1f} ms/window")

    # ---- b. outlier selector A/B at fullscale ------------------------------
    from pointcloud_obstacle_processing_tpu.ops import outliers as O

    def s_out(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = remove_statistical_outliers(
            cc, fcfg.statistical_outlier_mean_k,
            fcfg.statistical_outlier_std_dev_thresh, backend="banded",
            band=fcfg.knn_band, row_tile=fcfg.knn_row_tile,
        )
        return jnp.sum(r.cloud.valid).astype(jnp.float32)

    t = marginal(chain(s_out), (vox.cloud,))
    log(f"fullscale outlier[pallas net]: {t*1e3:.1f} ms/window")

    orig_pallas = O._sortnet_mean_pallas
    O._sortnet_mean_pallas = lambda d2p, k, big: O._sortnet_mean(
        [jnp.transpose(d2p[i]) for i in range(16)], k, big
    )
    try:
        t = marginal(chain(s_out), (vox.cloud,))
    finally:
        O._sortnet_mean_pallas = orig_pallas
    log(f"fullscale outlier[xla net]: {t*1e3:.1f} ms/window")

    O._sortnet_mean_pallas = lambda d2p, k, big: O._kmin_mean(
        jnp.transpose(d2p, (2, 1, 0)).reshape(d2p.shape[2], -1), k, big
    )
    try:
        t = marginal(chain(s_out), (vox.cloud,))
    finally:
        O._sortnet_mean_pallas = orig_pallas
    log(f"fullscale outlier[kmin extract]: {t*1e3:.1f} ms/window")

    # ---- c. remaining stages -----------------------------------------------
    def s_seg(carry, c, k):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        r = segment_planes(cc, k, fcfg)
        return jnp.sum(r.nonplane_cloud.valid).astype(jnp.float32)

    t = marginal(chain(s_seg), (outl.cloud, key))
    log(f"fullscale ransac: {t*1e3:.1f} ms/window")

    for cap in (16384, 24576):
        comp = jax.jit(lambda c: compact(c, cap))(seg.nonplane_cloud)

        def s_clus(carry, c, cap=cap):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            r = euclidean_cluster(
                cc, fcfg.euc_cluster_tolerance, fcfg.euc_min_cluster_size,
                fcfg.euc_max_cluster_size, fcfg.max_clusters, fcfg.cluster_max_iters,
            )
            return jnp.sum(r.clusters.sizes).astype(jnp.float32)

        t = marginal(chain(s_clus), (comp.cloud,))
        log(f"fullscale cluster[C={cap}]: {t*1e3:.1f} ms/window "
            f"overflow={bool(comp.overflow)}")


if __name__ == "__main__":
    sys.exit(main())
