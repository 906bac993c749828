"""Round-3 perf experiments, part 25: dissect the voxel stage's glue.

The prefix profile at the new flagship shape (100352 cap, packing,
kernel8) charges the voxel stage 16.5 ms/batch, but the isolated sort
(~6.1) and reduce (~4.7) only explain ~11 — where are the other ~6?
Chained-marginal sub-timings:

  1. pre-sort arithmetic (validity, ijk, clip, pack, corner offsets,
     16-bit payload quantization) reduced to a scalar;
  2. the stable sort alone on precomputed inputs, at N=100352 AND
     N=131072 (if XLA's sort pads to the next power of two, shrinking
     the buffer bought nothing in the sort share);
  3. the run-reduce alone on precomputed sorted inputs;
  4. the slot decode + finalize tail;
  5. the full voxel_downsample for the cross-check of the parts.

Plus one A/B: ijk = floor(p / leaf) vs floor(p * (1/leaf)) — the divide
is a multi-pass VPU op; if it shows up, the reciprocal form is a
candidate (with its own boundary-rounding fidelity review).  Timing only
here.
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
    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        _pack_spec,
        voxel_downsample,
    )
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

    # materialized pre-sort outputs for the isolated sort/reduce timings
    pk, pxy, pz = jax.jit(jax.vmap(presort))(vcloud)
    spk, spxy, spz = jax.jit(
        jax.vmap(lambda a, b, c: lax.sort((a, b, c), num_keys=1, is_stable=True))
    )(pk, pxy, pz)
    for x in (pk, pxy, pz, spk, spxy, spz):
        x.block_until_ready()

    def chain_cloud(fn, m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return fn(cc), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg_cloud(fn):
        fa, fb = chain_cloud(fn, 1), chain_cloud(fn, 4)
        ta, tb = timed(fa, vcloud), timed(fb, vcloud)
        ta2, tb2 = timed(fa, vcloud), timed(fb, vcloud)
        return (min(tb, tb2) - min(ta, ta2)) / 3.0

    def chain_bufs(fn, m):
        def run(a, b, c):
            def body(carry, _):
                return jnp.sum(fn(a + (carry * 0.0).astype(a.dtype), b, c)), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg_bufs(fn, a, b, c):
        fa, fb = chain_bufs(fn, 1), chain_bufs(fn, 4)
        ta, tb = timed(fa, a, b, c), timed(fb, a, b, c)
        ta2, tb2 = timed(fa, a, b, c), timed(fb, a, b, c)
        return (min(tb, tb2) - min(ta, ta2)) / 3.0

    # 1. pre-sort arithmetic
    def presort_scalar(cloud):
        a, b, c = jax.vmap(presort)(cloud)
        return (
            jnp.sum(a).astype(jnp.float32)
            + jnp.sum(b).astype(jnp.float32)
            + jnp.sum(c).astype(jnp.float32)
        )

    t = marg_cloud(presort_scalar)
    log(f"pre-sort arithmetic: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # 1b. divide vs reciprocal ijk (timing only)
    for name, f in (
        ("floor(p / leaf)", lambda p: jnp.floor(p / jnp.float32(leaf))),
        ("floor(p * inv)", lambda p: jnp.floor(p * jnp.float32(1.0 / leaf))),
    ):
        def ij_scalar(cloud, ff=f):
            return jnp.sum(ff(cloud.points).astype(jnp.int32)).astype(jnp.float32)

        t = marg_cloud(ij_scalar)
        log(f"ijk {name}: {t*1e3:.2f} ms/batch")

    # 2. the sort alone, N=100352 and padded N=131072
    def sort_scalar(a, b, c):
        sa, sb, sc = lax.sort((a, b, c), num_keys=1, is_stable=True)
        return (
            jnp.sum(sa).astype(jnp.float32)
            + jnp.sum(sb).astype(jnp.float32)
            + jnp.sum(sc).astype(jnp.float32)
        )

    t = marg_bufs(jax.vmap(sort_scalar), pk, pxy, pz)
    log(f"sort alone N=100352: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    padn = 131072 - cfg.max_points
    pk_p = jnp.pad(pk, ((0, 0), (0, padn)), constant_values=K)
    pxy_p = jnp.pad(pxy, ((0, 0), (0, padn)))
    pz_p = jnp.pad(pz, ((0, 0), (0, padn)))
    t = marg_bufs(jax.vmap(sort_scalar), pk_p, pxy_p, pz_p)
    log(f"sort alone N=131072: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # 3. the reduce alone on pre-sorted inputs
    def reduce_scalar(a, b, c):
        vals, num = sorted_run_reduce(a, (b, c), K, capacity, quantum=quantum)
        return jnp.sum(vals) + num.astype(jnp.float32)

    t = marg_bufs(jax.vmap(reduce_scalar), spk, spxy, spz)
    log(f"reduce alone (sorted in): {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # 4/5. full stage and the finalize tail by subtraction
    def vox_scalar(cloud):
        r = jax.vmap(
            lambda cc: voxel_downsample(
                cc, leaf, capacity, bounds, cfg.voxel_sum_precision,
                cfg.voxel_binning, cfg.voxel_order, cfg.voxel_payload_packing,
            )
        )(cloud)
        return jnp.sum(r.cloud.points) + jnp.sum(r.num_voxels).astype(jnp.float32)

    t = marg_cloud(vox_scalar)
    log(f"full voxel stage: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")
    log("(finalize/decode tail = full - presort - sort - reduce)")


if __name__ == "__main__":
    main()
