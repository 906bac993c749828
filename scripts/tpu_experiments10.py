"""Round-3 perf experiments (v5e via axon tunnel).

1. Outlier banded selection: 15-pass k-min extraction over the full
   [T, W=1280] window vs a chunked lax.top_k prefilter (per-128 chunk
   top-k -> k-min extraction over the [T, W*k/128] candidate pool) —
   bit-identical by construction (the candidate multiset always contains
   the window's k smallest incl. quota-relevant duplicates).
2. Cluster stage cost vs cluster_capacity (4096 / 2048 / 1024) and the
   actual nonplane counts of the bench scenes (headroom check).
3. The new closed-form shadow rasterizer's cost (vs the old [M*L, H, W]).

Timing discipline: chain M iterations inside one jit with a data
dependency, fetch a scalar, take (tM - t1)/(M-1); tiny-matmul probe first.
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
    """Steady-state per-iteration time via chained scans.

    ``make_chained(m)`` must return a jitted callable taking ``arg``."""
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
    from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        _kmin_mean,
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
    from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    # probe: tiny matmul (wedged-tunnel guard)
    x = jnp.ones((128, 128))
    np.asarray(jnp.sum(x @ x))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    B = 32
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    uniq = 8
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(uniq)]
    for i in range(B):
        p = scenes[i % uniq]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

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
    nonplane_counts = np.asarray(jax.vmap(lambda c: c.count())(seg.nonplane_cloud))
    log(f"nonplane counts across {B} scans: max={nonplane_counts.max()} "
        f"mean={nonplane_counts.mean():.0f} all={sorted(set(nonplane_counts.tolist()))}")

    # ---- experiment 1: banded selection variants ---------------------------
    def knn_variant(selector):
        def score(c):
            # replicate the banded path but with a pluggable selector
            from pointcloud_obstacle_processing_tpu.ops import outliers as O

            old = O._kmin_mean
            try:
                O._kmin_mean = selector
                r = remove_statistical_outliers(
                    c, cfg.statistical_outlier_mean_k,
                    cfg.statistical_outlier_std_dev_thresh, backend="banded",
                    band=cfg.knn_band, row_tile=cfg.knn_row_tile,
                )
            finally:
                O._kmin_mean = old
            return jnp.sum(r.cloud.valid.astype(jnp.int32))

        def make(m):
            def chained(c):
                def body(carry, _):
                    cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                    s = jax.vmap(score)(cc)
                    return jnp.sum(s).astype(jnp.float32), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return make

    big = 3.0e38

    def kmin_plain(d2, k, bigv):
        return _kmin_mean(d2, k, bigv)

    def make_chunked(chunk):
        def sel(d2, k, bigv):
            t, w = d2.shape
            if w % chunk or w // chunk < 2:
                return _kmin_mean(d2, k, bigv)
            c = d2.reshape(t, w // chunk, chunk)
            neg, _ = lax.top_k(-c, k)
            cand = (-neg).reshape(t, (w // chunk) * k)
            return _kmin_mean(cand, k, bigv)
        return sel

    for name, sel in [
        ("kmin_full_window", kmin_plain),
        ("chunk128_topk+kmin", make_chunked(128)),
        ("chunk256_topk+kmin", make_chunked(256)),
        ("chunk640_topk+kmin", make_chunked(640)),
    ]:
        mk = knn_variant(sel)
        t = marginal(mk, vox.cloud)
        log(f"outlier[{name}]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # agreement check: chunked vs full-window must be bit-identical
    a = np.asarray(knn_variant(kmin_plain)(1)(vox.cloud))
    b = np.asarray(knn_variant(make_chunked(128))(1)(vox.cloud))
    log(f"selector agreement (inlier-count sums): full={a} chunked={b} equal={a == b}")

    # ---- experiment 2: cluster capacity ------------------------------------
    for cap in (4096, 2048, 1024):
        comp = jax.jit(jax.vmap(lambda c: compact(c, cap)))(seg.nonplane_cloud)

        def make(m, comp=comp):
            def chained(c):
                def body(carry, _):
                    cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                    r = jax.vmap(
                        lambda x: euclidean_cluster(
                            x, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                            cfg.euc_max_cluster_size, cfg.max_clusters,
                            cfg.cluster_max_iters,
                        )
                    )(cc)
                    return jnp.sum(r.clusters.sizes).astype(jnp.float32), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        t = marginal(make, comp.cloud)
        log(f"cluster[C={cap}]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan) "
            f"overflow={np.asarray(comp.overflow).sum()}/{B}")

    # ---- experiment 3: shadow rasterizer cost ------------------------------
    comp = jax.jit(jax.vmap(lambda c: compact(c, cfg.cluster_capacity)))(seg.nonplane_cloud)
    clus = jax.jit(
        jax.vmap(
            lambda c: euclidean_cluster(
                c, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )
    )(comp.cloud)
    tfid = RigidTransform.identity()

    def make_shadow(m):
        def chained(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                g = jax.vmap(
                    lambda x, cl, hg: cast_shadows(hg, x, cl, tfid, cfg).grid
                )(cc, clus.clusters, seeded.hole_grid)
                return jnp.sum(g.astype(jnp.int32)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    t = marginal(make_shadow, comp.cloud, 1, 9)
    log(f"shadow[closed-form union]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    sys.exit(main())
