"""Round-3 perf experiments, part 29: which tail consumer costs 5.5 ms?

Pinning one compact copy of the run-reduce kernel's output made things
WORSE (tpu_experiments37: 15.9 -> 17.1 channel-minor pin, 17.3
channel-leading pin), so the overhead is not simple redundant reads.
Bisect the composed tail consumer-by-consumer: every variant runs
sort+kernel from materialized pre-sort buffers (baseline 9.85 ms/batch)
plus ONE piece of the tail.
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
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu import Cloud
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
        sorted_run_reduce,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec
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
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]
    quantum = leaf / 65536.0
    d12 = dims[1] * dims[2]
    I32_MAX = np.iinfo(np.int32).max

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud

    def presort(cloud):
        p = cloud.points
        v = cloud.valid & jnp.all(jnp.isfinite(p), axis=-1)
        ijk = jnp.floor(p / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(v, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0).astype(
                jnp.float32
            )
            * jnp.float32(leaf)
        )
        off0 = jnp.where(v[None, :], p.T - corner0, 0.0)
        q = jnp.float32(65536.0 / leaf)
        qx = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        qy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        qz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        pxy = lax.shift_left(qx, 16) | qy
        return packed, pxy, qz

    pk, pxy, pz = jax.jit(jax.vmap(presort))(vcloud)
    for x in (pk, pxy, pz):
        x.block_until_ready()

    def chain(fn, m):
        def run(a, b, c):
            def body(carry, _):
                return jnp.sum(fn(a + (carry * 0.0).astype(a.dtype), b, c)), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn):
        fa, fb = chain(fn, 1), chain(fn, 4)
        ta, tb = timed(fa, pk, pxy, pz), timed(fb, pk, pxy, pz)
        ta2, tb2 = timed(fa, pk, pxy, pz), timed(fb, pk, pxy, pz)
        return (min(tb, tb2) - min(ta, ta2)) / 3.0

    def kern(a, b, c):
        sa, sb, sc = lax.sort((a, b, c), num_keys=1, is_stable=True)
        return sorted_run_reduce(sa, (sb, sc), K, capacity, quantum=quantum)

    def make(tail):
        def f(a, b, c):
            vals, num = jax.vmap(kern)(a, b, c)
            return jax.vmap(tail)(vals, num)

        return f

    variants = {}

    variants["t0 sum(vals)+num (baseline)"] = make(
        lambda v, n: jnp.sum(v) + n.astype(jnp.float32)
    )

    def t1(v, n):
        slot_key = jnp.clip(v[:, 0].astype(jnp.int32), 0, K - 1)
        lx = slot_key // d12
        lrem = slot_key % d12
        ly = lrem // dims[2]
        lz = lrem % dims[2]
        return jnp.sum((lx + ly + lz).astype(jnp.float32))

    variants["t1 key decode only"] = make(t1)

    variants["t2 sum cols 1:4"] = make(lambda v, n: jnp.sum(v[:, 1:4]))
    variants["t3 sum col 4"] = make(lambda v, n: jnp.sum(v[:, 4]))

    def t4(v, n):
        target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
        out_valid = target < jnp.minimum(n, capacity)
        slot_key = jnp.clip(v[:, 0].astype(jnp.int32), 0, K - 1)
        lx = slot_key // d12 + imin[0]
        lrem = slot_key % d12
        ly = lrem // dims[2] + imin[1]
        lz = lrem % dims[2] + imin[2]
        keys = jnp.where(out_valid[:, None], jnp.stack([lx, ly, lz], axis=-1), I32_MAX)
        return jnp.sum(keys.astype(jnp.float32))

    variants["t4 keys construction"] = make(t4)

    def t5(v, n):
        slot_key = jnp.clip(v[:, 0].astype(jnp.int32), 0, K - 1)
        lx = slot_key // d12 + imin[0]
        lrem = slot_key % d12
        ly = lrem // dims[2] + imin[1]
        lz = lrem % dims[2] + imin[2]
        slot_counts = v[:, 4]
        slot_corner = (
            jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32) * jnp.float32(leaf)
        )
        slot_sums = v[:, 1:4] + slot_corner * slot_counts[:, None]
        return jnp.sum(slot_sums)

    variants["t5 slot_sums (cols 0,1:4,4)"] = make(t5)

    def t6(v, n):
        target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
        out_valid = target < jnp.minimum(n, capacity)
        slot_key = jnp.clip(v[:, 0].astype(jnp.int32), 0, K - 1)
        lx = slot_key // d12 + imin[0]
        lrem = slot_key % d12
        ly = lrem // dims[2] + imin[1]
        lz = lrem % dims[2] + imin[2]
        keys = jnp.where(out_valid[:, None], jnp.stack([lx, ly, lz], axis=-1), I32_MAX)
        slot_counts = v[:, 4]
        slot_corner = (
            jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32) * jnp.float32(leaf)
        )
        slot_sums = v[:, 1:4] + slot_corner * slot_counts[:, None]
        sums = jnp.where(out_valid[:, None], slot_sums, 0.0)
        counts = jnp.where(out_valid, slot_counts, 0.0)
        return jnp.sum(sums) + jnp.sum(counts) + jnp.sum(keys.astype(jnp.float32))

    variants["t6 full tail"] = make(t6)

    for name, f in variants.items():
        t = marg(f)
        log(f"{name}: {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
