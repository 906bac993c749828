"""Round-3 perf experiments, part 64: SMEM dead-chunk skip in the Pallas
sortnet selection kernel (flagship batched outlier stage).

~12% of the flagship's 24576 query rows are capacity padding (the bench
clouds voxelize to ~21.5k); the batched ``lax.cond`` tile skip is a known
2x REGRESSION under vmap (both branches execute as a select), but an SMEM
live-flag + ``pl.when`` inside the kernel has no such hazard — the cluster
sweep kernels already use the idiom.  This measures the batched outlier
stage with the skip vs a no-skip twin (chained 4-vs-1 marginals,
interleaved rounds), and asserts the two programs' mean-distance outputs
are BITWISE equal on device (dead chunks write the big sentinel planes,
which the final where(valid, ., 0) maps to the same 0 the computed path
produces).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import pointcloud_obstacle_processing_tpu.ops.outliers as O
from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.outliers import (
    remove_statistical_outliers,
)
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = FLAGSHIP_CONFIG
bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
B = 32


def build_batch():
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(8)]
    for i in range(B):
        p = scenes[i % 8]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    return Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))


def _timed(fn, *args, iters=4):
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def outl(cc):
    return remove_statistical_outliers(
        cc, cfg.statistical_outlier_mean_k, cfg.statistical_outlier_std_dev_thresh,
        backend=cfg.knn_backend, band=cfg.knn_band, row_tile=cfg.knn_row_tile,
        skip_dead_tiles=cfg.knn_skip_dead_tiles,
    )


def outl_scalar(c):
    r = jax.vmap(outl)(c)
    return jnp.sum(r.cloud.valid.astype(jnp.float32)) + jnp.sum(r.mean_distances)


def chain(m):
    def run(c):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return outl_scalar(cc).astype(jnp.float32), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def main():
    clouds = build_batch()
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
                cfg.voxel_payload_packing,
            )
        )
    )(seeded.cloud).cloud
    live = np.asarray(jnp.sum(vox.valid, axis=1))
    print(f"post-voxel live rows: {live.min()}-{live.max()} of {cfg.max_voxels} "
          f"({1 - live.mean() / cfg.max_voxels:.1%} dead)", flush=True)

    # Variant A (no skip): compile while the kernel entry is patched to
    # drop the live flags; jit traces on first call, so the compiled
    # executable keeps the unpatched program afterward.
    orig = O._sortnet_mean_pallas

    def no_skip(d2, k, big, q_valid=None, interpret=False):
        return orig(d2, k, big, q_valid=None, interpret=interpret)

    O._sortnet_mean_pallas = no_skip
    a1, a4 = chain(1), chain(4)
    fa = jax.jit(lambda c: jax.vmap(lambda cc: outl(cc).mean_distances)(c))
    np.asarray(a1(vox))
    np.asarray(a4(vox))
    da = np.asarray(fa(vox))
    O._sortnet_mean_pallas = orig

    # Variant B (skip, the shipped path)
    b1, b4 = chain(1), chain(4)
    fb = jax.jit(lambda c: jax.vmap(lambda cc: outl(cc).mean_distances)(c))
    np.asarray(b1(vox))
    np.asarray(b4(vox))
    db = np.asarray(fb(vox))

    print(f"bitwise equal mean distances: {np.array_equal(da, db)}", flush=True)
    assert np.array_equal(da, db)

    for r in range(3):
        tA = (_timed(a4, vox) - _timed(a1, vox)) / 3.0
        tB = (_timed(b4, vox) - _timed(b1, vox)) / 3.0
        print(f"round {r}: no-skip {tA * 1e3:.2f} ms/batch   "
              f"skip {tB * 1e3:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
