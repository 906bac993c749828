"""Round-3 perf experiments, part 30: cheapest voxel-tail form.

tpu_experiments38: the [cap, 3] channel-minor stacks downstream of the
run-reduce kernel cost +3..5.4 ms/batch (the decode arithmetic itself is
free).  The pipeline consumer (finalize -> centroids) drops keys, so the
realistic tail is slot_sums + counts -> centroids.  Variants, all
composed sort+kernel+tail from pre-sort buffers (t0 baseline ~10.3):

  v1: current pipeline tail (slot_sums channel-minor, centroids [cap,3]);
  v2: channel-leading compute ([3, cap] stacks), final [cap, 3] centroid
      transpose at the end;
  v3: fully vector-wise (three separate [cap] centroid channels, no
      stacked array at any point) — the floor;
  v4: v3 + ONE final stack to [cap, 3] — the cost of the one
      materialization the Cloud interface needs.
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

    def decoded(v):
        slot_key = jnp.clip(v[:, 0].astype(jnp.int32), 0, K - 1)
        lx = slot_key // d12 + imin[0]
        lrem = slot_key % d12
        ly = lrem // dims[2] + imin[1]
        lz = lrem % dims[2] + imin[2]
        return lx, ly, lz

    def v1(v, n):
        target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
        out_valid = target < jnp.minimum(n, capacity)
        lx, ly, lz = decoded(v)
        slot_counts = v[:, 4]
        slot_corner = (
            jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32) * jnp.float32(leaf)
        )
        slot_sums = v[:, 1:4] + slot_corner * slot_counts[:, None]
        sums = jnp.where(out_valid[:, None], slot_sums, 0.0)
        counts = jnp.where(out_valid, slot_counts, 0.0)
        inv = 1.0 / jnp.maximum(counts, 1.0)
        centroids = sums * inv[:, None]
        return jnp.sum(centroids) + jnp.sum(counts)

    def v2(v, n):
        target = lax.broadcasted_iota(jnp.int32, (1, capacity), 1)[0]
        out_valid = target < jnp.minimum(n, capacity)
        lx, ly, lz = decoded(v)
        lxyz = jnp.stack([lx, ly, lz], axis=0)  # [3, cap]
        slot_counts = v[:, 4]
        corner_l = lxyz.astype(jnp.float32) * jnp.float32(leaf)
        sums_l = jnp.stack([v[:, 1], v[:, 2], v[:, 3]], axis=0) + (
            corner_l * slot_counts[None, :]
        )
        sums_l = jnp.where(out_valid[None, :], sums_l, 0.0)
        counts = jnp.where(out_valid, slot_counts, 0.0)
        inv = 1.0 / jnp.maximum(counts, 1.0)
        centroids = (sums_l * inv[None, :]).T  # [cap, 3]
        return jnp.sum(centroids) + jnp.sum(counts)

    def v3(v, n):
        target = lax.broadcasted_iota(jnp.int32, (1, capacity), 1)[0]
        out_valid = target < jnp.minimum(n, capacity)
        lx, ly, lz = decoded(v)
        slot_counts = v[:, 4]
        counts = jnp.where(out_valid, slot_counts, 0.0)
        inv = 1.0 / jnp.maximum(counts, 1.0)
        s = jnp.float32(0.0)
        for ch, l in ((1, lx), (2, ly), (3, lz)):
            sums_c = jnp.where(
                out_valid,
                v[:, ch] + l.astype(jnp.float32) * jnp.float32(leaf) * slot_counts,
                0.0,
            )
            s = s + jnp.sum(sums_c * inv)
        return s + jnp.sum(counts)

    def v4(v, n):
        target = lax.broadcasted_iota(jnp.int32, (1, capacity), 1)[0]
        out_valid = target < jnp.minimum(n, capacity)
        lx, ly, lz = decoded(v)
        slot_counts = v[:, 4]
        counts = jnp.where(out_valid, slot_counts, 0.0)
        inv = 1.0 / jnp.maximum(counts, 1.0)
        chans = []
        for ch, l in ((1, lx), (2, ly), (3, lz)):
            sums_c = jnp.where(
                out_valid,
                v[:, ch] + l.astype(jnp.float32) * jnp.float32(leaf) * slot_counts,
                0.0,
            )
            chans.append(sums_c * inv)
        centroids = jnp.stack(chans, axis=-1)  # ONE [cap, 3]
        return jnp.sum(centroids) + jnp.sum(counts)

    for name, f in (
        ("v1 current channel-minor tail", v1),
        ("v2 channel-leading, final transpose", v2),
        ("v3 three separate channels (floor)", v3),
        ("v4 v3 + one final [cap,3] stack", v4),
    ):
        t = marg(make(f))
        log(f"{name}: {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
