"""Round-3 perf experiments, part 58: fullscale kNN tile size at the new
band 1280, and run-reduce window group 64 vs 32.

A. knn_row_tile: banded work is N*(1 + 2*band/T).  At band=1280 the
   shipped T=1024 has work factor 3.5; T=1280 -> 3.0, T=1536 -> 2.67.
   Larger tiles give every row a SUPERSET candidate window (fidelity
   monotone non-degrading), but the Pallas sortnet block is
   [16, W/16, tc] f32 (tc = 256 when T%256==0) and VMEM is ~16 MB —
   T=1536 (block 6.7 MB, double-buffered 13.4) may not compile.  Measure
   prefix-3 (crop+voxel+outlier) chained marginals, interleaved rounds,
   plus a perturbed-mean count vs T=1024 (expected ~0: supersets).

B. sorted_run_reduce group: the fullscale default is 32 (W=4096,
   2w kernel -> 256 sequential steps).  group=64 (W=8192, 128 steps)
   halves step-boundary overhead at the cost of one more scan shift;
   scratch 2*W*128*4 = 8.4 MB fits VMEM.  Isolated A/B + composed
   voxel-stage marginal via a monkeypatched default, plus value equality
   vs the XLA fallback at group 64 (each group choice is its own
   window structure; equality is required within a choice, across
   backends).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import (
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
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

    cfg = REFERENCE_FULLSCALE_CONFIG

    fspec = SceneSpec(
        n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000
    )
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(8)
    ]
    fpts = np.concatenate(parts)[: cfg.max_points]
    fcloud_np = np.zeros((cfg.max_points, 3), np.float32)
    fcloud_np[: len(fpts)] = fpts
    fvalid = np.zeros(cfg.max_points, bool)
    fvalid[: len(fpts)] = True
    window = Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))
    log(f"window: {len(fpts)} points")

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    k = cfg.statistical_outlier_mean_k
    mult = cfg.statistical_outlier_std_dev_thresh

    @jax.jit
    def voxelize(cloud):
        seed = crop_and_seed(cloud, cfg)
        return voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )

    vox = voxelize(window)
    log(f"voxels: {int(vox.num_voxels)}")
    vc = vox.cloud
    valid_np = np.asarray(vc.valid)

    # ---- A1. fidelity: larger tiles are supersets of T=1024's windows ----
    def means_at(row_tile):
        f = jax.jit(
            lambda c: knn_mean_distances(
                c, k, row_tile=row_tile, backend="banded", band=cfg.knn_band,
                skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
        )
        return np.asarray(f(vc))

    tiles = (1024, 1280, 1536)
    d_base = None
    ok_tiles = []
    for t in tiles:
        try:
            d = means_at(t)
        except Exception as e:  # VMEM overflow etc.
            log(f"[T={t}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        ok_tiles.append(t)
        if d_base is None:
            d_base = d
            log(f"[T={t}] baseline")
        else:
            diff = d[valid_np] != d_base[valid_np]
            log(
                f"[T={t}] perturbed means vs T=1024: {diff.mean():.4%} "
                f"(count {int(diff.sum())}/{int(valid_np.sum())})"
            )

    # ---- A2. timing: prefix-3 chained marginals, interleaved --------------
    def prefix3(row_tile):
        def run(cloud):
            seed = crop_and_seed(cloud, cfg)
            vx = voxel_downsample(
                seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
                cfg.voxel_payload_packing,
            )
            outl = remove_statistical_outliers(
                vx.cloud, k, mult, backend="banded", band=cfg.knn_band,
                row_tile=row_tile, skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
            return jnp.sum(outl.mean_distances) + jnp.sum(
                outl.cloud.valid.astype(jnp.float32)
            )

        def make(m):
            def chained(cloud):
                def body(carry, _):
                    cc = Cloud(
                        points=cloud.points + 0.0 * carry, valid=cloud.valid
                    )
                    return run(cc), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return make

    fns = {}
    for t in ok_tiles:
        mk = prefix3(t)
        try:
            f1, f4 = mk(1), mk(4)
            np.asarray(f1(window))
            np.asarray(f4(window))
            fns[t] = (f1, f4)
        except Exception as e:
            log(f"[T={t}] prefix3 FAILED: {type(e).__name__}: {str(e)[:200]}")
    for rnd in range(3):
        for t, (f1, f4) in fns.items():
            t1, t4 = timed(f1, window), timed(f4, window)
            log(
                f"[round {rnd} T={t}] prefix3 marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/window (t1 {t1*1e3:.1f})"
            )

    # ---- B. run-reduce group 64 vs 32 --------------------------------------
    # Build the exact sorted inputs the voxel stage feeds the kernel.
    import math

    leaf = cfg.downsample_leaf_size
    imin = [math.floor(v / leaf) for v in bounds[0]]
    imax = [math.floor(v / leaf) for v in bounds[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    K = dims[0] * dims[1] * dims[2]

    seed = jax.jit(lambda c: crop_and_seed(c, cfg))(window)
    pts, valid = seed.cloud.points, seed.cloud.valid

    @jax.jit
    def make_sorted(pts, valid):
        ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0)
            .astype(jnp.float32) * jnp.float32(leaf)
        )
        off0 = jnp.where(valid[None, :], pts.T - corner0, 0.0)
        q = jnp.float32(65536.0 / leaf)
        qx = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        qy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        qz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        pxy = lax.shift_left(qx, 16) | qy
        return lax.sort((packed, pxy, qz), num_keys=1, is_stable=True)

    skey, spxy, spz = jax.block_until_ready(make_sorted(pts, valid))
    quantum = leaf / 65536.0
    cap = cfg.max_voxels

    for group in (32, 64):
        try:
            vals, num = pallas_runreduce.sorted_run_reduce(
                skey, (spxy, spz), K, cap, group=group, quantum=quantum
            )
            fvals, fnum = pallas_runreduce.sorted_run_reduce(
                skey, (spxy, spz), K, cap, group=group, quantum=quantum,
                use_pallas=False,
            )
            nv = int(num)
            eq = bool(
                np.array_equal(
                    np.asarray(vals[:nv]), np.asarray(fvals[:nv])
                )
            ) and nv == int(fnum)
            log(f"[group={group}] runs={nv} bitwise-equal-vs-fallback={eq}")
        except Exception as e:
            log(f"[group={group}] FAILED: {type(e).__name__}: {str(e)[:300]}")

    # composed voxel-stage marginal with the default-group chooser patched
    orig = pallas_runreduce.sorted_run_reduce

    def voxel_marginal(group):
        def patched(*a, **kw):
            if kw.get("group") is None:
                kw["group"] = group
            return orig(*a, **kw)

        pallas_runreduce.sorted_run_reduce = patched

        def run(cloud):
            seed = crop_and_seed(cloud, cfg)
            vx = voxel_downsample(
                seed.cloud, leaf, cap, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
                cfg.voxel_payload_packing,
            )
            return jnp.sum(vx.cloud.points) + vx.num_voxels.astype(jnp.float32)

        def make(m):
            def chained(cloud):
                def body(carry, _):
                    cc = Cloud(
                        points=cloud.points + 0.0 * carry, valid=cloud.valid
                    )
                    return run(cc), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        f1, f4 = make(1), make(4)
        np.asarray(f1(window))
        np.asarray(f4(window))
        pallas_runreduce.sorted_run_reduce = orig
        return f1, f4

    gfns = {}
    for group in (32, 64):
        try:
            gfns[group] = voxel_marginal(group)
        except Exception as e:
            log(f"[group={group}] composed FAILED: {type(e).__name__}: {str(e)[:200]}")
    for rnd in range(3):
        for group, (f1, f4) in gfns.items():
            t1, t4 = timed(f1, window), timed(f4, window)
            log(
                f"[round {rnd} group={group}] crop+voxel marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/window (t1 {t1*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
