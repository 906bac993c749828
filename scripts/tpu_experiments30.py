"""Round-3 perf experiments, part 21: what bounds the outlier sortnet?

The banded stage measures ~12 ms/batch; plausible decomposition is
~5 ms input DMA ([16, nc, T] blocks) + ~3.4 ms grid fixed overhead
(3072 steps/batch) + comparator compute — but the fused-distance
prototype (tpu_experiments27.py) removed the DMA and won nothing, so
the stage is probably compute/overhead-bound inside the kernel.  Pin it:

A. sortnet Pallas kernel ALONE on random planes, tc sweep 256/512/1024
   (fewer, fatter grid steps);
B. the full banded kNN stage for reference, same process.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=5):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        _sortnet_comparators,
        knn_mean_distances,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    B = 32
    n = cfg.max_voxels  # 24576
    T = cfg.knn_row_tile  # 256
    band = cfg.knn_band
    width = T + 2 * band  # 1280
    nc = width // 16  # 80
    big = 3.0e38

    rng = np.random.default_rng(0)
    d2p = jnp.asarray(rng.random((B, 16, nc, n), np.float32))

    def net_kernel(x_ref, o_ref):
        P = _sortnet_comparators([x_ref[0, i] for i in range(16)], big, 0)
        for i in range(16):
            o_ref[0, i, :] = P[i][0]

    def net_only(x, tc):
        return pl.pallas_call(
            net_kernel,
            grid=(B, n // tc),
            in_specs=[
                pl.BlockSpec(
                    (1, 16, nc, tc), lambda bi, i: (bi, 0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 16, tc), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, 16, n), jnp.float32),
        )(x)

    def chain(fn, m):
        def run(x):
            def body(carry, _):
                return fn(x + 0.0 * carry), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, x):
        fa, fb = chain(fn, 1), chain(fn, 4)
        ta, tb = timed(fa, x), timed(fb, x)
        if tb <= ta:
            ta, tb = timed(fa, x), timed(fb, x)
        return (tb - ta) / 3.0

    for tc in (256, 512, 1024):
        f = lambda x, t=tc: jnp.sum(net_only(x, t))
        t = marg(f, d2p)
        log(f"sortnet kernel alone tc={tc:4d}: {t*1e3:.2f} ms/batch")

    # full stage for reference (same process)
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

    @jax.jit
    @jax.vmap
    def upto_voxel(c):
        seed = crop_and_seed(c, cfg)
        return voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
        ).cloud

    vcloud = upto_voxel(clouds)

    def chain2(fn, m):
        def run(v, p):
            def body(carry, _):
                return fn(v, p + 0.0 * carry), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def stage(v, p):
        d = jax.vmap(
            lambda p1, v1: knn_mean_distances(
                Cloud(points=p1, valid=v1), cfg.statistical_outlier_mean_k,
                cfg.knn_row_tile, "banded", band
            )
        )(p, v)
        return jnp.sum(d)

    fa, fb = chain2(stage, 1), chain2(stage, 4)
    ta = timed(fa, vcloud.valid, vcloud.points)
    tb = timed(fb, vcloud.valid, vcloud.points)
    if tb <= ta:
        ta = timed(fa, vcloud.valid, vcloud.points)
        tb = timed(fb, vcloud.valid, vcloud.points)
    log(f"full banded stage (reference): {(tb-ta)/3*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
