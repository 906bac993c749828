"""Round-3 perf experiments, part 2 (v5e via axon tunnel).

1. Banded outlier: sorting-network selector (plane-axis Batcher/bitonic,
   ops/outliers.py:_sortnet_mean) vs the 15-pass k-min extraction, at the
   r2 shape (16384 voxels, band 512) and the honest-capacity shape
   (24576 voxels — the flagship scenes occupy ~21.5k voxels at leaf 0.04,
   so the old 16384 cap silently truncated; VERDICT r3).
2. Fidelity: banded-vs-exact kNN mean perturbation at 24576 for bands
   512 / 640 / 768 (the band must cover ~the same number of x-slabs as
   the validated 512-at-16k knee).
3. Candidate flagship end-to-end: max_voxels=24576, cluster_capacity=1536,
   chained-batch throughput.
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


def marginal(make_chained, arg, a=1, b=5):
    fa, fb = make_chained(a), make_chained(b)
    ta, tb = timed(fa, arg), timed(fb, arg)
    if tb <= ta:
        ta, tb = timed(fa, arg), timed(fb, arg)
    return (tb - ta) / (b - a)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        knn_mean_distances,
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((128, 128))
    np.asarray(jnp.sum(x @ x))
    log("probe ok")

    B = 32
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    base = FLAGSHIP_CONFIG

    def make_batch(cfg):
        pts = np.zeros((B, cfg.max_points, 3), np.float32)
        valid = np.zeros((B, cfg.max_points), bool)
        scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(8)]
        for i in range(B):
            p = scenes[i % 8]
            pts[i, : len(p)] = p
            valid[i, : len(p)] = True
        return Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))

    def voxelize(cfg, clouds):
        bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
        seeded = jax.jit(jax.vmap(lambda c: crop_and_seed(c, cfg)))(clouds)
        return jax.jit(
            jax.vmap(
                lambda c: voxel_downsample(
                    c, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                    cfg.voxel_sum_precision,
                )
            )
        )(seeded.cloud)

    # ---- 1. selector comparison at both capacities -------------------------
    import pointcloud_obstacle_processing_tpu.ops.outliers as O

    def outlier_marginal(cfg, vox_cloud, band, row_tile, force_kmin=False):
        def score(c):
            r = remove_statistical_outliers(
                c, cfg.statistical_outlier_mean_k,
                cfg.statistical_outlier_std_dev_thresh, backend="banded",
                band=band, row_tile=row_tile,
            )
            return jnp.sum(r.cloud.valid.astype(jnp.int32))

        def make(m):
            def chained(c):
                def body(carry, _):
                    cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                    return jnp.sum(jax.vmap(score)(cc)).astype(jnp.float32), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        if force_kmin:
            old = O._sortnet_mean
            # neutralize the sortnet path by pretending width%16 != 0:
            # easiest honest toggle is patching the selector to extraction
            O._sortnet_mean = lambda planes, k, big: O._kmin_mean(
                jnp.stack(planes).transpose(1, 2, 0).reshape(
                    planes[0].shape[0], -1
                ), k, big
            )
            try:
                t = marginal(make, vox_cloud)
            finally:
                O._sortnet_mean = old
        else:
            t = marginal(make, vox_cloud)
        return t

    for max_vox, bands in ((16384, (512,)), (24576, (512, 640, 768))):
        cfg = base.replace(max_voxels=max_vox)
        clouds = make_batch(cfg)
        vox = voxelize(cfg, clouds)
        nv = np.asarray(jax.vmap(lambda c: c.count())(vox.cloud))
        log(f"[N={max_vox}] voxel counts: max={nv.max()} min={nv.min()}")
        for band in bands:
            t_net = outlier_marginal(cfg, vox.cloud, band, cfg.knn_row_tile)
            log(f"[N={max_vox} band={band}] sortnet: {t_net*1e3:.2f} ms/batch "
                f"({t_net/B*1e3:.3f} ms/scan)")
        t_kmin = outlier_marginal(cfg, vox.cloud, bands[0], cfg.knn_row_tile, force_kmin=True)
        log(f"[N={max_vox} band={bands[0]}] kmin-extract: {t_kmin*1e3:.2f} ms/batch "
            f"({t_kmin/B*1e3:.3f} ms/scan)")

    # ---- 2. fidelity: banded vs exact at 24576 -----------------------------
    cfg = base.replace(max_voxels=24576)
    clouds = make_batch(cfg)
    vox = voxelize(cfg, clouds)
    c0 = jax.tree_util.tree_map(lambda x: x[0], vox.cloud)
    d_exact = np.asarray(
        jax.jit(
            lambda c: knn_mean_distances(c, cfg.statistical_outlier_mean_k,
                                         backend="exact")
        )(c0)
    )
    valid0 = np.asarray(c0.valid)
    for band in (512, 640, 768):
        d_band = np.asarray(
            jax.jit(
                lambda c: knn_mean_distances(
                    c, cfg.statistical_outlier_mean_k, backend="banded",
                    band=band, row_tile=cfg.knn_row_tile,
                )
            )(c0)
        )
        diff = np.abs(d_band[valid0] - d_exact[valid0])
        frac = np.mean(diff > 1e-7)
        log(f"[fidelity band={band}] perturbed means: {frac:.4%} "
            f"(max abs {diff.max():.2e})")

    # ---- 3. candidate flagship end-to-end ----------------------------------
    for name, cfg in (
        ("r2-flagship(16384/4096/b512)", base),
        ("honest(24576/1536/b640)", base.replace(
            max_voxels=24576, cluster_capacity=1536, knn_band=640)),
        ("honest(24576/1024/b512)", base.replace(
            max_voxels=24576, cluster_capacity=1024)),
    ):
        clouds = make_batch(cfg)
        keys = jax.random.split(jax.random.PRNGKey(0), B)

        def make(m, cfg=cfg):
            def chained(c, k):
                def body(carry, _):
                    cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                    r = jax.vmap(lambda a, b: process_scan(a, b, cfg))(cc, k)
                    s = jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(
                        r.clusters.num_clusters
                    )
                    return s.astype(jnp.float32), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        fa, fb = make(1), make(5)
        ta = timed(fa, clouds, keys)
        tb = timed(fb, clouds, keys)
        if tb <= ta:
            ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
        t = (tb - ta) / 4
        r = jax.jit(jax.vmap(lambda a, b: process_scan(a, b, cfg)))(clouds, keys)
        flags = {
            f: int(np.asarray(getattr(r.stats, f)).sum())
            for f in ("voxel_overflow", "cluster_overflow", "planes_truncated")
        }
        log(f"[pipeline {name}] {t*1e3:.2f} ms/batch -> "
            f"{B/t:.1f} scans/s; overflow flags {flags}")


if __name__ == "__main__":
    sys.exit(main())
