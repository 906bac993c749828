"""Round-3 perf experiments, part 23: sort-payload packing + batch scaling.

(a) The voxel sort is a stable 1-key ``lax.sort`` carrying THREE f32
    payload columns (corner-relative offsets).  Packing two of them into
    one int32 (16-bit fixed point each; quantum leaf/65536 ~ 0.6 um — two
    orders below the 1e-5 centroid tolerance) cuts the sort to 1 key + 2
    payloads.  Measures the isolated sort cost both ways; values are NOT
    compared (packing changes centroids by <= 1 ulp-scale quanta — if the
    sort win is real, the product change lands separately with its own
    oracle runs).

(b) Steady-state throughput at batch 64 vs 32: the pallas kernels are
    sequential per batch row, so bigger batches amortize nothing per-row,
    but XLA may overlap fusions better / worse.  Marginal chained batch
    time per scan decides the bench batch size.
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
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(8)]

    def make_batch(B):
        pts = np.zeros((B, cfg.max_points, 3), np.float32)
        valid = np.zeros((B, cfg.max_points), bool)
        for i in range(B):
            p = scenes[i % 8]
            pts[i, : len(p)] = p
            valid[i, : len(p)] = True
        return Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))

    clouds = make_batch(32)
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud

    # ---- (a) sort payload packing ------------------------------------------
    def keys_offsets(cloud):
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
        return packed, off0

    def sort4(cloud):
        packed, off0 = keys_offsets(cloud)
        out = lax.sort((packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True)
        return sum(jnp.sum(o[::1024].astype(jnp.float32)) for o in out)

    def sort3_packed(cloud):
        packed, off0 = keys_offsets(cloud)
        q = jnp.float32(65536.0 / leaf)
        oy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        oz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        oyz = (oy << 16) | oz
        out = lax.sort((packed, off0[0], oyz), num_keys=1, is_stable=True)
        return sum(jnp.sum(o[::1024].astype(jnp.float32)) for o in out)

    def sort2_key_only(cloud):
        packed, off0 = keys_offsets(cloud)
        q = jnp.float32(65536.0 / leaf)
        ox = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        oy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        oz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        # 48 bits across two payload ints (x alone; y|z packed)
        out = lax.sort((packed, (ox << 16) | oy, oz), num_keys=1, is_stable=True)
        return sum(jnp.sum(o[::1024].astype(jnp.float32)) for o in out)

    def chained(fn, m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jnp.sum(jax.vmap(fn)(cc)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, arg):
        fa, fb = chained(fn, 1), chained(fn, 4)
        ta, tb = timed(fa, arg), timed(fb, arg)
        if tb <= ta:
            ta, tb = timed(fa, arg), timed(fb, arg)
        return (tb - ta) / 3.0

    for name, fn in (
        ("sort 1key+3xf32 (current)", sort4),
        ("sort 1key+f32+packed-i32", sort3_packed),
        ("sort 1key+2xi32 (all packed)", sort2_key_only),
    ):
        t = marg(fn, vcloud)
        log(f"{name}: {t*1e3:.2f} ms/batch-of-32 ({t/32*1e3:.3f} ms/scan)")

    # ---- (a2) composed voxel stage: packed vs unpacked product paths -------
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample

    def vox_stage(packing):
        def f(cloud):
            r = voxel_downsample(
                cloud, leaf, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, "sort", "lattice", packing,
            )
            return jnp.sum(r.cloud.points[::64]) + r.num_voxels.astype(
                jnp.float32
            )
        return f

    for name, packing in (("voxel unpacked", False), ("voxel packed", True)):
        t = marg(vox_stage(packing), vcloud)
        log(f"{name}: {t*1e3:.2f} ms/batch-of-32 ({t/32*1e3:.3f} ms/scan)")

    # ---- (b) batch scaling: 32 vs 64 ---------------------------------------
    keys32 = jax.random.split(jax.random.PRNGKey(0), 32)
    keys64 = jax.random.split(jax.random.PRNGKey(0), 64)

    def pipe_scalar(c, k):
        r = jax.vmap(lambda cc, kk: process_scan(cc, kk, cfg))(c, k)
        return (
            jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(r.clusters.num_clusters)
        ).astype(jnp.float32)

    def chained_pipe(c, k, m):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return pipe_scalar(cc, k), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    for B, kk in ((32, keys32), (64, keys64)):
        cb = make_batch(B)
        f1 = jax.jit(lambda c, k: chained_pipe(c, k, 1))
        f4 = jax.jit(lambda c, k: chained_pipe(c, k, 4))
        ta, tb = timed(f1, cb, kk, iters=4), timed(f4, cb, kk, iters=4)
        if tb <= ta:
            ta, tb = timed(f1, cb, kk, iters=4), timed(f4, cb, kk, iters=4)
        t = (tb - ta) / 3.0
        log(
            f"pipeline B={B}: {t*1e3:.2f} ms/batch marginal "
            f"({t/B*1e3:.3f} ms/scan, {B/t:.1f} scans/s)"
        )


if __name__ == "__main__":
    main()
