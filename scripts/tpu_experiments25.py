"""Round-3 perf experiments, part 16: locate the composed-voxel-stage gap.

Parts (sort 4.8 + reduce 6.2 + prologue 0.1) sum to ~11 ms/batch but the
composed voxel stage measures 21.5.  Bisect the composition:

1. sort alone (re-baseline, same program as tpu_experiments21)
2. sort -> stack -> reduce (no decode/finalize)
3. full _sort_segment_partials via voxel_partials (adds key decode)
4. full voxel_downsample (adds finalize centroids)
5. (2) with the stack removed — feed the 3 payload rows via one
   pre-stacked [3, N] sort payload matrix trick?  Not expressible; instead
   (5) times sort -> reduce where the reduce consumes UNSTACKED payloads
   re-materialized by stack inside a separate jit boundary is not
   meaningful under chaining — skipped.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=3):
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
        voxel_partials,
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

    imin, dims = _pack_spec(bounds, cfg.downsample_leaf_size)
    K = dims[0] * dims[1] * dims[2]
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud

    def sorted_inputs(p, v):
        v = v & jnp.all(jnp.isfinite(p), axis=-1)
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
        return lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )

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

    # 1. sort alone
    def f_sort(v, p):
        out = jax.vmap(sorted_inputs)(p, v)
        return jnp.sum(out[0]).astype(jnp.float32) + jnp.sum(out[1])

    t = marg(f_sort)
    log(f"1. sort alone: {t*1e3:.2f} ms/batch")

    # 2. sort -> reduce (payloads passed unstacked)
    def f_sr(v, p):
        skey, sox, soy, soz = jax.vmap(sorted_inputs)(p, v)
        vals, num = jax.vmap(
            lambda k1, a, b, c: sorted_run_reduce(k1, (a, b, c), K, capacity)
        )(skey, sox, soy, soz)
        return jnp.sum(vals) + jnp.sum(num).astype(jnp.float32)

    t = marg(f_sr)
    log(f"2. sort+reduce (unstacked payloads): {t*1e3:.2f} ms/batch  [stacked: 14.55]")

    # 3. voxel_partials (adds slot decode)
    def f_vp(v, p):
        r = jax.vmap(
            lambda p1, v1: voxel_partials(
                Cloud(points=p1, valid=v1), leaf, capacity, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            )
        )(p, v)
        return jnp.sum(r.sums) + jnp.sum(r.counts) + jnp.sum(
            r.num_voxels
        ).astype(jnp.float32)

    t = marg(f_vp)
    log(f"3. voxel_partials: {t*1e3:.2f} ms/batch")

    # 4. voxel_downsample (adds finalize)
    def f_vd(v, p):
        r = jax.vmap(
            lambda p1, v1: voxel_downsample(
                Cloud(points=p1, valid=v1), leaf, capacity, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            )
        )(p, v)
        return jnp.sum(r.cloud.points) + jnp.sum(r.num_voxels).astype(jnp.float32)

    t = marg(f_vd)
    log(f"4. voxel_downsample: {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
