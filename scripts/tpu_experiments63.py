"""Round-3 perf experiments, part 63: transposed slot-decode on the
BATCHED flagship path + sort-gap closure note.

tpu_experiments61 proved the transpose on the unbatched fullscale window
(−0.7 ms/window, all rounds).  The flagship runs the same tail under
vmap (kernel8, [B=32, cap, 128] ANY output); the post-change bench read
voxel 0.49 ms/scan vs the pre-change table's 0.41 — possibly noise,
possibly a vmap'd-transpose regression.  Interleaved A/B of the two
decode tails over the identical batched crop+pack+sort+kernel8 prefix.

Also closes the sort-gap thread (tpu_experiments62): in-context sort
marginal is 3.7-4.9 with pack-only at 1.0-1.2, i.e. the sort itself is
at the 3.6 ms pure floor; an operand optimization_barrier is neutral to
slightly worse — nothing to ship.
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
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
        sorted_run_reduce,
    )
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    leaf = cfg.downsample_leaf_size
    cap = cfg.max_voxels
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    imin = [math.floor(v / leaf) for v in bounds[0]]
    imax = [math.floor(v / leaf) for v in bounds[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    K = dims[0] * dims[1] * dims[2]
    quantum = leaf / 65536.0
    I32_MAX = jnp.iinfo(jnp.int32).max

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

    def kernel_out(cloud):
        seed = crop_and_seed(cloud, cfg)
        p, v = seed.cloud.points, seed.cloud.valid
        ijk = jnp.floor(p / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(v, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0)
            .astype(jnp.float32) * jnp.float32(leaf)
        )
        off0 = jnp.where(v[None, :], p.T - corner0, 0.0)
        q = jnp.float32(65536.0 / leaf)
        qx = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        qy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        qz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        pxy = lax.shift_left(qx, 16) | qy
        skey, spxy, spz = lax.sort((packed, pxy, qz), num_keys=1, is_stable=True)
        return sorted_run_reduce(skey, (spxy, spz), K, cap, quantum=quantum)

    def tail(chan, num):
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
        vrun = jax.vmap(run)

        def chained(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jnp.sum(vrun(cc)), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    variants = {"direct": v_direct, "transp": v_transp}
    fns = {}
    for name, run in variants.items():
        f1, f4 = make(run, 1), make(run, 4)
        np.asarray(f1(clouds))
        np.asarray(f4(clouds))
        fns[name] = (f1, f4)

    d = np.asarray(fns["direct"][0](clouds))
    t = np.asarray(fns["transp"][0](clouds))
    log(f"scalar check: direct {d!r} transp {t!r} equal={bool(d == t)}")

    for rnd in range(4):
        for name, (f1, f4) in fns.items():
            t1, t4 = timed(f1, clouds), timed(f4, clouds)
            log(
                f"[round {rnd} {name}] marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/batch (t1 {t1*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
