"""Round-3 perf experiments, part 27: the voxel tail's 5.5 ms — layout?

tpu_experiments35.py pinned ~5.5 ms/batch between sort+reduce (9.85) and
_sort_segment_partials (15.87): the slot decode + partials assembly over
[B, 24576, 5]-ish arrays.  Hypothesis: channel-MINOR intermediates
([cap, 3] keys/sums stacks) lane-pad 3 -> 128 on TPU (32x HBM bloat per
pass, CLAUDE.md).  Probes:

  0. lane-pad probe: marginal of sum(x * 1.0000001) over materialized
     [32, 24576, 3] vs [32, 3, 24576] vs [32, 24576, 128] inputs;
  1. tail as-is from materialized (vals [B, cap, 5], num);
  2. tail channel-leading: vals_t [B, 5, cap] input, keys/sums emitted
     [B, 3, cap] — no channel-minor arrays anywhere;
  3. tail hybrid: vals [B, cap, 5] input, ONE transpose to [5, cap],
     compute channel-leading, final outputs transposed back to the
     current [cap, 3] interface (what a minimal in-place fix would do).
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
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels
    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]
    quantum = leaf / 65536.0
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
    spk, spxy, spz = jax.jit(
        jax.vmap(lambda a, b, c: lax.sort((a, b, c), num_keys=1, is_stable=True))
    )(pk, pxy, pz)

    # materialize the kernel outputs
    vals, num = jax.jit(
        jax.vmap(
            lambda a, b, c: sorted_run_reduce(a, (b, c), K, capacity, quantum=quantum)
        )
    )(spk, spxy, spz)
    vals_t = jax.jit(lambda v: jnp.transpose(v, (0, 2, 1)))(vals)  # [B, 5, cap]
    for x in (vals, num, vals_t):
        x.block_until_ready()
    log(f"vals {vals.shape} num {num.shape}")

    def chain1(fn, m, *args):
        def run(a, *rest):
            def body(carry, _):
                return jnp.sum(fn(a + (carry * 0.0).astype(a.dtype), *rest)), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, *args):
        fa, fb = chain1(fn, 1), chain1(fn, 4)
        ta, tb = timed(fa, *args), timed(fb, *args)
        ta2, tb2 = timed(fa, *args), timed(fb, *args)
        return (min(tb, tb2) - min(ta, ta2)) / 3.0

    # 0. lane-pad probes
    x_minor = jnp.asarray(np.random.rand(32, capacity, 3).astype(np.float32))
    x_lead = jnp.asarray(np.random.rand(32, 3, capacity).astype(np.float32))
    x_full = jnp.asarray(np.random.rand(32, capacity, 128).astype(np.float32))
    for name, x in (("[B,cap,3]", x_minor), ("[B,3,cap]", x_lead), ("[B,cap,128]", x_full)):
        t = marg(lambda v: jnp.sum(v * 1.0000001), x)
        log(f"0. elementwise+sum over {name}: {t*1e3:.2f} ms/batch")

    d12 = dims[1] * dims[2]

    # 1. tail as-is (mirrors _sort_segment_partials post-kernel code)
    def tail_minor(v, n):
        def one(slot_vals, nn):
            target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
            out_valid = target < jnp.minimum(nn, capacity)
            slot_key = jnp.clip(slot_vals[:, 0].astype(jnp.int32), 0, K - 1)
            lx = slot_key // d12 + imin[0]
            lrem = slot_key % d12
            ly = lrem // dims[2] + imin[1]
            lz = lrem % dims[2] + imin[2]
            keys = jnp.where(
                out_valid[:, None], jnp.stack([lx, ly, lz], axis=-1), I32_MAX
            )
            slot_counts = slot_vals[:, 4]
            slot_corner = (
                jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32)
                * jnp.float32(leaf)
            )
            slot_sums = slot_vals[:, 1:4] + slot_corner * slot_counts[:, None]
            sums = jnp.where(out_valid[:, None], slot_sums, 0.0)
            counts = jnp.where(out_valid, slot_counts, 0.0)
            # finalize too
            inv = 1.0 / jnp.maximum(counts, 1.0)
            centroids = sums * inv[:, None]
            return (
                jnp.sum(centroids)
                + jnp.sum(keys.astype(jnp.float32))
                + jnp.sum(counts)
            )

        return jax.vmap(one)(v, n)

    t = marg(tail_minor, vals, num)
    log(f"1. tail as-is (channel-minor) from [B,cap,5]: {t*1e3:.2f} ms/batch")

    # 2. tail channel-leading from [B, 5, cap]
    def tail_lead(v, n):
        def one(sv, nn):  # sv [5, cap]
            target = lax.broadcasted_iota(jnp.int32, (1, capacity), 1)[0]
            out_valid = target < jnp.minimum(nn, capacity)
            slot_key = jnp.clip(sv[0].astype(jnp.int32), 0, K - 1)
            lx = slot_key // d12 + imin[0]
            lrem = slot_key % d12
            ly = lrem // dims[2] + imin[1]
            lz = lrem % dims[2] + imin[2]
            lxyz = jnp.stack([lx, ly, lz], axis=0)  # [3, cap]
            keys = jnp.where(out_valid[None, :], lxyz, I32_MAX)
            slot_counts = sv[4]
            slot_corner = lxyz.astype(jnp.float32) * jnp.float32(leaf)
            slot_sums = sv[1:4] + slot_corner * slot_counts[None, :]
            sums = jnp.where(out_valid[None, :], slot_sums, 0.0)
            counts = jnp.where(out_valid, slot_counts, 0.0)
            inv = 1.0 / jnp.maximum(counts, 1.0)
            centroids = sums * inv[None, :]
            return (
                jnp.sum(centroids)
                + jnp.sum(keys.astype(jnp.float32))
                + jnp.sum(counts)
            )

        return jax.vmap(one)(v, n)

    t = marg(tail_lead, vals_t, num)
    log(f"2. tail channel-leading from [B,5,cap]: {t*1e3:.2f} ms/batch")

    # 3. hybrid: [B,cap,5] input, transpose once, channel-leading compute,
    #    outputs transposed back to the [cap, 3] interface at the end
    def tail_hybrid(v, n):
        def one(slot_vals, nn):
            sv = slot_vals.T  # [5, cap]
            target = lax.broadcasted_iota(jnp.int32, (1, capacity), 1)[0]
            out_valid = target < jnp.minimum(nn, capacity)
            slot_key = jnp.clip(sv[0].astype(jnp.int32), 0, K - 1)
            lx = slot_key // d12 + imin[0]
            lrem = slot_key % d12
            ly = lrem // dims[2] + imin[1]
            lz = lrem % dims[2] + imin[2]
            lxyz = jnp.stack([lx, ly, lz], axis=0)
            keys_l = jnp.where(out_valid[None, :], lxyz, I32_MAX)
            slot_counts = sv[4]
            slot_corner = lxyz.astype(jnp.float32) * jnp.float32(leaf)
            slot_sums = sv[1:4] + slot_corner * slot_counts[None, :]
            sums_l = jnp.where(out_valid[None, :], slot_sums, 0.0)
            counts = jnp.where(out_valid, slot_counts, 0.0)
            inv = 1.0 / jnp.maximum(counts, 1.0)
            centroids = (sums_l * inv[None, :]).T  # back to [cap, 3]
            keys = keys_l.T
            return (
                jnp.sum(centroids)
                + jnp.sum(keys.astype(jnp.float32))
                + jnp.sum(counts)
            )

        return jax.vmap(one)(v, n)

    t = marg(tail_hybrid, vals, num)
    log(f"3. tail hybrid (transpose once, [cap,3] outputs): {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
