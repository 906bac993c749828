"""Round-4 perf experiments, part 65: radix-partition + batched sub-sorts
vs the flat fullscale voxel sort (VERDICT r3 next #4).

The fullscale stable sort (1 key + 2 packed payloads over the 2M-point
window) measures ~3.6 ms of the ~21.8 ms window — the largest remaining
single step.  The radix-partition idea: partition rows into P buckets by
the key's top bits (the x-slab index), then sort each bucket
independently as a BATCHED [P, N/P] sort — batched sorts are nearly free
per-row on v5e (CLAUDE.md), so if the partition were free the sub-sorts
might undercut the flat sort's O(N log N) bitonic depth.

This script bounds the idea from both sides WITHOUT building the
partition kernel:

  (full)     flat stable 1-key+2-payload sort — the shipped form;
  (subP)     the SAME arrays reshaped [P, N/P] and batch-sorted along the
             last axis, P in {16, 64} — the post-partition sub-sort cost
             with a FREE partition (upper bound on the win);
  (move)     one 2M-row permutation gather of key+2 payloads (a
             precomputed iota-scramble permutation) — a LOWER bound on
             the partition's data movement (any partition must move every
             row once; XLA multi-row gathers serialize ~20 cyc/elem);
  (meta)     bucket ids + one-hot [P] histogram + cumsum — the partition
             metadata cost (cheap; sanity only).

Decision rule: if subP + move >= full - 0.5 ms, the partition can never
pay and the thread is CLOSED (rejected-list entry); if subP alone beats
full by >1 ms, building the sequential-overwrite partition kernel (the
compaction kernel's contract with P output streams) becomes worth
pricing.

All variants consume the same pack() outputs, chained 1-vs-3 marginals,
interleaved rounds (the drift-cancelling protocol).
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
    from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    cfg = REFERENCE_FULLSCALE_CONFIG
    leaf = cfg.downsample_leaf_size
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    imin = [math.floor(v / leaf) for v in bounds[0]]
    imax = [math.floor(v / leaf) for v in bounds[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    K = dims[0] * dims[1] * dims[2]
    N = cfg.max_points

    fspec = SceneSpec(n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000)
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(8)
    ]
    fpts = np.concatenate(parts)[:N]
    fcloud_np = np.zeros((N, 3), np.float32)
    fcloud_np[: len(fpts)] = fpts
    fvalid = np.zeros(N, bool)
    fvalid[: len(fpts)] = True
    window = Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))

    def pack(cloud):
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
        return packed, pxy, qz

    def consume3(a, b, c):
        return (
            jnp.sum(a, dtype=jnp.int64).astype(jnp.float32)
            + jnp.sum(b, dtype=jnp.int64).astype(jnp.float32)
            + jnp.sum(c, dtype=jnp.int64).astype(jnp.float32)
        )

    # fixed scramble permutation for the movement lower bound (host-built
    # once; a real partition's destinations are similarly data-dependent)
    perm_np = np.random.default_rng(0).permutation(N).astype(np.int32)
    perm = jnp.asarray(perm_np)

    def v_p(cloud):
        return consume3(*pack(cloud))

    def v_full(cloud):
        sk, sp, sz = lax.sort(pack(cloud), num_keys=1, is_stable=True)
        return consume3(sk, sp, sz)

    def make_sub(P):
        def v_sub(cloud):
            k, p, z = pack(cloud)
            kk = k.reshape(P, N // P)
            pp = p.reshape(P, N // P)
            zz = z.reshape(P, N // P)
            sk, sp, sz = lax.sort((kk, pp, zz), num_keys=1, is_stable=True)
            return consume3(sk, sp, sz)

        return v_sub

    def v_move(cloud):
        k, p, z = pack(cloud)
        return consume3(jnp.take(k, perm), jnp.take(p, perm), jnp.take(z, perm))

    def v_meta(cloud):
        k, p, z = pack(cloud)
        P = 64
        b = jnp.clip(k // (K // P + 1), 0, P - 1)
        onehot = (b[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None])
        counts = jnp.sum(onehot.astype(jnp.int32), axis=1)
        offs = jnp.cumsum(counts)
        return consume3(k, p, z) + jnp.sum(offs).astype(jnp.float32)

    def chain(fn, m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return fn(cc), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    variants = {
        "pack_only": v_p,
        "full_sort": v_full,
        "sub16": make_sub(16),
        "sub64": make_sub(64),
        "move_gather": v_move,
        "meta": v_meta,
    }
    progs = {k: (chain(f, 1), chain(f, 3)) for k, f in variants.items()}
    for r in range(3):
        log(f"--- round {r}")
        for name, (c1, c3) in progs.items():
            t1 = timed(c1, window, iters=3)
            t3 = timed(c3, window, iters=3)
            log(f"{name:12s}: marginal {(t3 - t1) / 2 * 1e3:7.2f} ms/window "
                f"(1x {t1*1e3:6.1f}, 3x {t3*1e3:6.1f})")


if __name__ == "__main__":
    main()
