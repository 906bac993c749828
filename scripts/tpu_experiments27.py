"""Round-3 perf experiments, part 18: fused-distance sortnet kernel prototype.

The banded outlier stage (11.6 ms/batch) materializes the full [16, nc, T]
squared-distance planes to HBM (~N*W*4B = 126 MB/scan written + re-read)
because the distances are XLA ops feeding the Pallas sortnet kernel.
Prototype a kernel that computes the distance planes IN VMEM from a packed
per-16 column table (lanes 0..15 x-planes, 16..31 y, 32..47 z, 48..63 |p|^2,
64..79 ids-as-f32, 80..95 valid) DMA'd per query tile, then runs the same
comparator program.

Checks (all on device):
1. the kernel's mean distances vs the current banded path: BITWISE —
   placement-invariance makes the sorted 16-vals layout-independent, and
   the distance expression is the same mul-add tree — UNLESS Mosaic
   FMA-contracts it; if naive fails, re-test with bitcast barriers after
   every multiply.
2. chained-marginal perf vs the current banded stage.
"""

from __future__ import annotations

import functools
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
        _sortnet_mean_from_sorted,
        knn_mean_distances,
    )
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
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    @jax.jit
    @jax.vmap
    def upto_voxel(c):
        seed = crop_and_seed(c, cfg)
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
        )
        return vox.cloud

    vcloud = upto_voxel(clouds)
    n = vcloud.points.shape[1]
    T = cfg.knn_row_tile
    band = cfg.knn_band
    width = T + 2 * band
    nc = width // 16
    k = cfg.statistical_outlier_mean_k
    tiles = n // T
    big = 3.0e38

    # ---- fused kernel --------------------------------------------------------
    def kernel(starts_ref, q_ref, qsq_ref, qids_ref, table_ref, o_ref,
               wbuf, dsem, *, barrier: str):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        s16 = starts_ref[0, ti]

        cp = pltpu.make_async_copy(
            table_ref.at[bi, pl.ds(s16, nc), :], wbuf, dsem
        )
        cp.start()
        cp.wait()

        qx = q_ref[0, 0:1, :]  # [1, T]
        qy = q_ref[0, 1:2, :]
        qz = q_ref[0, 2:3, :]
        qsq = qsq_ref[0, 0:1, :]
        qids = qids_ref[0, 0:1, :]

        def bb(x):
            if barrier == "bitcast":
                return lax.bitcast_convert_type(
                    lax.bitcast_convert_type(x, jnp.int32), jnp.float32
                )
            return x

        P = []
        for p_i in range(16):
            cx = wbuf[:, p_i : p_i + 1]          # [nc, 1]
            cy = wbuf[:, 16 + p_i : 17 + p_i]
            cz = wbuf[:, 32 + p_i : 33 + p_i]
            csq = wbuf[:, 48 + p_i : 49 + p_i]
            cid = wbuf[:, 64 + p_i : 65 + p_i]
            cva = wbuf[:, 80 + p_i : 81 + p_i]
            cross = bb(qx * cx) + bb(qy * cy) + bb(qz * cz)
            d2 = qsq + csq - bb(2.0 * cross)
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(cva > 0.5, d2, big)
            d2 = jnp.where(qids == cid, big, d2)
            P.append(d2)  # [nc, T]
        P = _sortnet_comparators(P, big, 0)
        for p_i in range(16):
            o_ref[0, p_i, :] = P[p_i][0]

    def fused_knn_means(points, vmask, barrier: str):
        """Batched fused banded kNN mean distances: points [B, n, 3]."""
        bsz = points.shape[0]
        vf = vmask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(vf, axis=1, keepdims=True), 1.0)
        center = (
            jnp.sum(jnp.where(vmask[:, :, None], points, 0.0), axis=1) / denom
        )  # [B, 3]
        p = jnp.where(vmask[:, :, None], points - center[:, None, :], 0.0)
        p_sq = jnp.sum(p * p, axis=-1)  # [B, n]
        ids = lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
        ids = jnp.broadcast_to(ids, (bsz, n))

        def plane16(v):  # [B, n] -> [B, n/16, 16]
            return v.reshape(bsz, n // 16, 16)

        table = jnp.concatenate(
            [
                plane16(p[:, :, 0]), plane16(p[:, :, 1]), plane16(p[:, :, 2]),
                plane16(p_sq), plane16(ids), plane16(vf),
                jnp.zeros((bsz, n // 16, 32), jnp.float32),
            ],
            axis=2,
        )  # [B, n/16, 128]
        t_iota = lax.broadcasted_iota(jnp.int32, (tiles, 1), 0)[:, 0]
        starts16 = (jnp.clip(t_iota * T - band, 0, n - width) // 16)[None, :]

        qT = jnp.transpose(p, (0, 2, 1))  # [B, 3, n]
        qsq = p_sq[:, None, :]
        qids = ids[:, None, :]

        vals = pl.pallas_call(
            functools.partial(kernel, barrier=barrier),
            grid=(bsz, tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, tiles), lambda bi, ti: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (1, 3, T), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, T), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, T), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, 16, T), lambda bi, ti: (bi, 0, ti), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, 16, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nc, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(starts16, qT, qsq, qids, table)

        means = jax.vmap(lambda v: _sortnet_mean_from_sorted(v, k, big))(vals)
        return jnp.where(vmask, means, 0.0)

    # ---- correctness ---------------------------------------------------------
    ref = jax.jit(
        jax.vmap(
            lambda p_, v_: knn_mean_distances(
                Cloud(points=p_, valid=v_), k, cfg.knn_row_tile, "banded", band
            )
        )
    )(vcloud.points, vcloud.valid)
    ok_barrier = None
    for barrier in ("naive", "bitcast"):
        got = jax.jit(
            lambda p_, v_, b=barrier: fused_knn_means(p_, v_, b)
        )(vcloud.points, vcloud.valid)
        r, g = np.asarray(ref), np.asarray(got)
        eq = np.array_equal(r, g)
        nz = int((r != g).sum())
        md = float(np.abs(r - g).max()) if nz else 0.0
        log(f"fused[{barrier}] vs banded path: bitwise={eq} ndiff={nz} "
            f"maxdiff={md:.3e}")
        if eq:
            ok_barrier = barrier
            break

    # ---- perf ------------------------------------------------------------------
    def chain(fn, m):
        def run(v, p):
            def body(carry, _):
                return fn(v, p + 0.0 * carry), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn):
        fa, fb = chain(fn, 1), chain(fn, 4)
        ta = timed(fa, vcloud.valid, vcloud.points)
        tb = timed(fb, vcloud.valid, vcloud.points)
        if tb <= ta:
            ta = timed(fa, vcloud.valid, vcloud.points)
            tb = timed(fb, vcloud.valid, vcloud.points)
        return (tb - ta) / 3.0

    def cur(v, p):
        d = jax.vmap(
            lambda p1, v1: knn_mean_distances(
                Cloud(points=p1, valid=v1), k, cfg.knn_row_tile, "banded", band
            )
        )(p, v)
        return jnp.sum(d)

    t = marg(cur)
    log(f"current banded knn means: {t*1e3:.2f} ms/batch")

    for barrier in {ok_barrier or "naive", "naive"}:

        def fus(v, p, b=barrier):
            return jnp.sum(fused_knn_means(p, v, b))

        t = marg(fus)
        log(f"fused[{barrier}] knn means: {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
