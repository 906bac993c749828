"""Round-3 perf experiments, part 26: bisect the voxel stage's missing ~6 ms.

tpu_experiments34.py measured (ms/batch-of-32, flagship 100352/24576,
packing on): presort ~0, sort alone 5.18, reduce alone 5.07, but the full
voxel stage 16.38 — ~6 ms is in the COMPOSITION or the tail, not the
parts.  Chained marginals of the intermediate compositions:

  a. presort -> sort -> reduce (sum of vals+num)  — parts composed;
  b. _sort_segment_partials (adds slot decode + partials assembly);
  c. full voxel_downsample (adds finalize);
  d. reduce-alone again but summing ONLY num (drops the [B, cap, 5]
     slice readback from the timing chain);
  e. sort -> reduce where the sort inputs are materialized buffers
     (drops the presort recompute from (a) — isolates sort->kernel
     composition cost from presort->sort fusion cost).
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
        _sort_segment_partials,
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
                return jnp.sum(fn(cc)), None

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

    def reduce_scal(a, b, c):
        vals, num = sorted_run_reduce(a, (b, c), K, capacity, quantum=quantum)
        return jnp.sum(vals) + num.astype(jnp.float32)

    # d. reduce alone, scalar = num only (no vals readback in the chain)
    def reduce_num_only(a, b, c):
        vals, num = sorted_run_reduce(a, (b, c), K, capacity, quantum=quantum)
        return num.astype(jnp.float32)

    t = marg_bufs(jax.vmap(reduce_num_only), spk, spxy, spz)
    log(f"d. reduce alone, num-only scalar: {t*1e3:.2f} ms/batch")

    t = marg_bufs(jax.vmap(reduce_scal), spk, spxy, spz)
    log(f"   reduce alone, vals+num scalar: {t*1e3:.2f} ms/batch")

    # e. sort -> reduce from materialized pre-sort buffers
    def sortreduce(a, b, c):
        sa, sb, sc = lax.sort((a, b, c), num_keys=1, is_stable=True)
        return reduce_scal(sa, sb, sc)

    t = marg_bufs(jax.vmap(sortreduce), pk, pxy, pz)
    log(f"e. sort -> reduce composed: {t*1e3:.2f} ms/batch")

    # a. presort -> sort -> reduce from the cloud
    def full_chain(cloud):
        a, b, c = jax.vmap(presort)(cloud)
        return jnp.sum(jax.vmap(sortreduce)(a, b, c))

    t = marg_cloud(full_chain)
    log(f"a. presort -> sort -> reduce: {t*1e3:.2f} ms/batch")

    # b. _sort_segment_partials (slot decode + partials assembly on top)
    def partials_scal(cloud):
        p = cloud.points
        v = cloud.valid & jnp.all(jnp.isfinite(p), axis=-1)
        ijk = jnp.floor(p / jnp.float32(leaf)).astype(jnp.int32)
        r = jax.vmap(
            lambda pp, vv, kk: _sort_segment_partials(
                pp, vv, kk, imin, dims, leaf, capacity, "lattice", True
            )
        )(p, v, ijk)
        return (
            jnp.sum(r.sums)
            + jnp.sum(r.counts)
            + jnp.sum(r.num_voxels).astype(jnp.float32)
        )

    t = marg_cloud(partials_scal)
    log(f"b. _sort_segment_partials: {t*1e3:.2f} ms/batch")

    # c. full voxel_downsample
    def vox_scal(cloud):
        r = jax.vmap(
            lambda cc: voxel_downsample(
                cc, leaf, capacity, bounds, cfg.voxel_sum_precision,
                cfg.voxel_binning, cfg.voxel_order, cfg.voxel_payload_packing,
            )
        )(cloud)
        return jnp.sum(r.cloud.points) + jnp.sum(r.num_voxels).astype(jnp.float32)

    t = marg_cloud(vox_scal)
    log(f"c. full voxel_downsample: {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
