"""Round-3 perf experiments, part 61: transposed slot-decode A/B, one run.

tpu_experiments60 measured the full decode tail ~1.15 ms/window pre-change
and 0.7-1.7 post-change (the transposed [5, cap] materialization) — the
delta is inside cross-run tunnel noise, so this script interleaves BOTH
tail variants over the identical crop+pack+sort+run-reduce prefix inside
one process (the honest protocol, CLAUDE.md):

(t_direct)  decode reads slot_vals[:, ch] columns directly
(t_transp)  decode reads sv = optimization_barrier(slot_vals.T) channels

Both compute the identical VoxelPartials-shaped outputs and reduce to the
same scalar; values are bitwise equal (checked).  Whichever marginal is
smaller wins; a delta under ~0.3 ms/window means the transpose is noise
and the simpler direct form stays.
"""

from __future__ import annotations

import math
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
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
        sorted_run_reduce,
    )
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    cfg = REFERENCE_FULLSCALE_CONFIG
    leaf = cfg.downsample_leaf_size
    cap = cfg.max_voxels
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    imin = [math.floor(v / leaf) for v in bounds[0]]
    imax = [math.floor(v / leaf) for v in bounds[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    K = dims[0] * dims[1] * dims[2]
    quantum = leaf / 65536.0
    I32_MAX = jnp.iinfo(jnp.int32).max

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

    def kernel_out(cloud):
        """crop + key/offset pack + stable sort + run-reduce (shared prefix)."""
        seed = crop_and_seed(cloud, cfg)
        pts, valid = seed.cloud.points, seed.cloud.valid
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
        skey, spxy, spz = lax.sort((packed, pxy, qz), num_keys=1, is_stable=True)
        return sorted_run_reduce(skey, (spxy, spz), K, cap, quantum=quantum)

    def tail(chan, num):
        """The decode tail given chan(i) -> [cap] channel vector i."""
        target = lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        out_valid = target < jnp.minimum(num, cap)
        slot_key = jnp.clip(chan(0).astype(jnp.int32), 0, K - 1)
        lx = slot_key // (dims[1] * dims[2]) + imin[0]
        lrem = slot_key % (dims[1] * dims[2])
        ly = lrem // dims[2] + imin[1]
        lz = lrem % dims[2] + imin[2]
        slot_counts = chan(4)
        lf = jnp.float32(leaf)
        key_cols, sum_cols = [], []
        for ch, l in ((1, lx), (2, ly), (3, lz)):
            key_cols.append(jnp.where(out_valid, l, I32_MAX))
            sum_cols.append(
                jnp.where(
                    out_valid,
                    chan(ch) + l.astype(jnp.float32) * lf * slot_counts,
                    0.0,
                )
            )
        keys = jnp.stack(key_cols, axis=-1)
        sums = jnp.stack(sum_cols, axis=-1)
        counts = jnp.where(out_valid, slot_counts, 0.0)
        return (
            jnp.sum(keys.astype(jnp.float32))
            + jnp.sum(sums)
            + jnp.sum(counts)
            + num.astype(jnp.float32)
        )

    def v_direct(cloud):
        slot_vals, num = kernel_out(cloud)
        return tail(lambda i: slot_vals[:, i], num)

    def v_transp(cloud):
        slot_vals, num = kernel_out(cloud)
        sv = lax.optimization_barrier(slot_vals.T)
        return tail(lambda i: sv[i], num)

    def make(run, m):
        def chained(cloud):
            def body(carry, _):
                cc = Cloud(points=cloud.points + 0.0 * carry, valid=cloud.valid)
                return run(cc), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    variants = {"direct": v_direct, "transp": v_transp}
    fns = {}
    for name, run in variants.items():
        f1, f4 = make(run, 1), make(run, 4)
        np.asarray(f1(window))
        np.asarray(f4(window))
        fns[name] = (f1, f4)

    d = np.asarray(fns["direct"][0](window))
    t = np.asarray(fns["transp"][0](window))
    log(f"scalar check: direct {d!r} transp {t!r} equal={bool(d == t)}")

    for rnd in range(4):
        for name, (f1, f4) in fns.items():
            t1, t4 = timed(f1, window), timed(f4, window)
            log(
                f"[round {rnd} {name}] marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/window (t1 {t1*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
