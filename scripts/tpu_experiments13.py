"""Round-3 perf experiments, part 4: sortnet implementation variants.

1. XLA sortnet with half/half contiguous merge pairing (product code as of
   this commit) vs the earlier strided even/odd pairing.
2. A Pallas sortnet kernel: planes [16, nc, T] (T = lanes), comparators as
   elementwise min/max on [nc, T] values, merges as contiguous sublane
   slices — min/max only, so bitwise identical to the XLA network.
3. Voxel compaction group=8 as the new default.
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        _BATCHER16,
        knn_mean_distances,
        remove_statistical_outliers,
    )
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
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    seeded = jax.jit(jax.vmap(lambda c: crop_and_seed(c, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda c: voxel_downsample(
                c, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )
    )(seeded.cloud)

    def chain(make_body):
        def mk(m):
            def chained(*args):
                def body(carry, _):
                    return make_body(carry, *args), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return mk

    # ---- 1. XLA half/half pairing (product path) ---------------------------
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

    t = marginal(chain(s_out), (vox.cloud,))
    log(f"outlier[xla halfhalf]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # ---- 2. Pallas sortnet kernel -----------------------------------------
    k = cfg.statistical_outlier_mean_k
    band = cfg.knn_band
    row_tile = cfg.knn_row_tile
    big = 3.0e38

    def sortnet_kernel(x_ref, o_ref):
        # x_ref: [16, nc, T]; o_ref: [16, T] sorted ascending values
        P = [x_ref[i] for i in range(16)]
        for i, j in _BATCHER16:
            lo, hi = jnp.minimum(P[i], P[j]), jnp.maximum(P[i], P[j])
            P[i], P[j] = lo, hi
        while P[0].shape[0] > 1:
            nc = P[0].shape[0]
            if nc % 2:
                pad = jnp.full((1, P[0].shape[1]), big, P[0].dtype)
                P = [jnp.concatenate([p, pad], axis=0) for p in P]
                nc += 1
            h = nc // 2
            A = [p[:h] for p in P]
            Bv = [p[h:] for p in P]
            P = [jnp.minimum(A[i], Bv[15 - i]) for i in range(16)]
            for d in (8, 4, 2, 1):
                for i in range(16):
                    if i % (2 * d) < d:
                        lo = jnp.minimum(P[i], P[i + d])
                        hi = jnp.maximum(P[i], P[i + d])
                        P[i], P[i + d] = lo, hi
        for i in range(16):
            o_ref[i, :] = P[i][0]

    def knn_pallas(cloud):
        pts_ = cloud.points
        n = cloud.points.shape[0]
        valid_ = cloud.valid
        width = row_tile + 2 * band
        nc = width // 16
        denom = jnp.maximum(jnp.sum(valid_.astype(jnp.float32)), 1.0)
        center = jnp.sum(jnp.where(valid_[:, None], pts_, 0.0), axis=0) / denom
        p = jnp.where(valid_[:, None], pts_ - center, 0.0)
        p_sq = jnp.sum(p * p, axis=-1)
        row_ids = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        tiles = n // row_tile
        starts = jnp.clip(
            lax.broadcasted_iota(jnp.int32, (tiles, 1), 0)[:, 0] * row_tile - band,
            0, n - width,
        )

        net = pl.pallas_call(
            sortnet_kernel,
            out_shape=jax.ShapeDtypeStruct((16, row_tile), jnp.float32),
            in_specs=[pl.BlockSpec((16, nc, row_tile), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, row_tile), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )

        def tile_fn(args):
            q, qq, qi, start = args
            cols = lax.dynamic_slice(p, (start, 0), (width, 3))
            cols_sq = lax.dynamic_slice(p_sq, (start,), (width,))
            c_ids = lax.dynamic_slice(row_ids, (start,), (width,))
            c_valid = lax.dynamic_slice(valid_, (start,), (width,))

            def planes_T(v):  # [W] -> [16, nc, 1]
                return v.reshape(nc, 16).T[:, :, None]

            cx, cy, cz = (planes_T(cols[:, a]) for a in range(3))
            cross = (
                q[:, 0][None, None, :] * cx
                + q[:, 1][None, None, :] * cy
                + q[:, 2][None, None, :] * cz
            )
            d2 = qq[None, None, :] + planes_T(cols_sq) - 2.0 * cross
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(planes_T(c_valid), d2, big)
            d2 = jnp.where(qi[None, None, :] == planes_T(c_ids), big, d2)
            vals = net(d2)  # [16, T] ascending
            pos = lax.broadcasted_iota(jnp.int32, (16, 1), 0)
            take = (vals < big * 0.5) & (pos < k)
            s = jnp.sum(jnp.where(take, jnp.sqrt(vals), 0.0), axis=0)
            cnt = jnp.sum(take.astype(jnp.float32), axis=0)
            return s / jnp.maximum(cnt, 1.0)

        out = lax.map(
            tile_fn,
            (
                p.reshape(tiles, row_tile, 3),
                p_sq.reshape(tiles, row_tile),
                row_ids.reshape(tiles, row_tile),
                starts,
            ),
        )
        return jnp.where(valid_, out.reshape(n), 0.0)

    # correctness vs the XLA product path (must be bitwise identical)
    c0 = jax.tree_util.tree_map(lambda x: x[0], vox.cloud)
    d_xla = np.asarray(
        jax.jit(lambda c: knn_mean_distances(
            c, k, row_tile, "banded", band))(c0)
    )
    d_pal = np.asarray(jax.jit(knn_pallas)(c0))
    same = np.array_equal(d_xla, d_pal)
    log(f"pallas sortnet bitwise == xla sortnet: {same} "
        f"(max abs diff {np.max(np.abs(d_xla - d_pal)):.2e})")

    def s_pal(carry, c):
        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
        d = jax.vmap(knn_pallas)(cc)
        return jnp.sum(d).astype(jnp.float32)

    t = marginal(chain(s_pal), (vox.cloud,))
    log(f"outlier[pallas sortnet]: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    sys.exit(main())
