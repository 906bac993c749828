"""Round-3 perf experiments, part 11: fused sorted-run reduce kernel A/B.

ops/pallas_runreduce.py fuses segscan + run-end table + compaction into
one sequential Pallas pass (SMEM carries).  Measure on hardware at the
flagship shape (batch 32 x 131072, capacity 24576) and the fullscale
window (2M rows, 262144), and check the fused outputs match the old
three-pass construction exactly (keys/counts) / to f32 tolerance (sums —
the windowed scan order differs from the full-width Hillis-Steele).
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
    from pointcloud_obstacle_processing_tpu.models import (
        FLAGSHIP_CONFIG,
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
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
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    # --- correctness: fused vs old three-pass construction on device -------
    from pointcloud_obstacle_processing_tpu.ops.pallas_compaction import (
        compact_and_gather_exact,
    )
    from pointcloud_obstacle_processing_tpu.ops.segscan import (
        segmented_inclusive_scan,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec

    imin, dims = _pack_spec(bounds, cfg.downsample_leaf_size)
    K = dims[0] * dims[1] * dims[2]
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels

    def sorted_inputs(cloud):
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
        return lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )

    def old_path(cloud):
        skey, sox, soy, soz = sorted_inputs(cloud)
        svalid = skey < K
        off = jnp.stack([sox, soy, soz], axis=0)
        heads = svalid & (
            skey != jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
        )
        vals = jnp.concatenate([off, svalid.astype(jnp.float32)[None, :]], axis=0)
        scans = segmented_inclusive_scan(vals, heads)
        next_head = jnp.concatenate([heads[1:], jnp.ones((1,), bool)])
        next_invalid = jnp.concatenate([~svalid[1:], jnp.ones((1,), bool)])
        is_end = svalid & (next_head | next_invalid)
        cnt_end = jnp.where(is_end, scans[3], 0.0)
        table = jnp.concatenate(
            [skey.astype(jnp.float32)[None, :], scans[:3], cnt_end[None, :]],
            axis=0,
        )
        occ2d = (cnt_end > 0.0).reshape(skey.shape[0] // 128, 128)
        _, num, slot_vals = compact_and_gather_exact(table, occ2d, capacity)
        return slot_vals, num

    def new_path(cloud):
        from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
            sorted_run_reduce,
        )

        skey, sox, soy, soz = sorted_inputs(cloud)
        off = jnp.stack([sox, soy, soz], axis=0)
        return sorted_run_reduce(skey, off, K, capacity)

    c0 = jax.tree_util.tree_map(lambda x: x[0], vcloud)
    ov, on = jax.jit(old_path)(c0)
    nv, nn = jax.jit(new_path)(c0)
    ov, on, nv, nn = map(np.asarray, (ov, on, nv, nn))
    k = min(int(on), capacity)
    assert int(on) == int(nn), (on, nn)
    keys_eq = np.array_equal(ov[:k, 0], nv[:k, 0])
    cnts_eq = np.array_equal(ov[:k, 4], nv[:k, 4])
    dsum = float(np.abs(ov[:k, 1:4] - nv[:k, 1:4]).max())
    log(f"fused vs old: num={int(on)} keys_eq={keys_eq} counts_eq={cnts_eq} "
        f"max|dsum|={dsum:.2e}")
    assert keys_eq and cnts_eq and dsum < 1e-4

    # --- flagship voxel stage marginal --------------------------------------
    def chained(fn, m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jnp.sum(jax.vmap(fn)(cc)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, data):
        fa, fb = chained(fn, 1), chained(fn, 4)
        ta, tb = timed(fa, data), timed(fb, data)
        if tb <= ta:
            ta, tb = timed(fa, data), timed(fb, data)
        return (tb - ta) / 3.0

    def vox_full(cloud):
        r = voxel_downsample(
            cloud, leaf, capacity, bounds, cfg.voxel_sum_precision,
            cfg.voxel_binning, cfg.voxel_order,
        )
        return jnp.sum(r.cloud.points) + r.num_voxels.astype(jnp.float32)

    t = marg(vox_full, vcloud)
    log(f"flagship voxel stage (fused): {t*1e3:.2f} ms/batch "
        f"({t/B*1e3:.3f} ms/scan)  [old: 25.8 / 0.805]")

    def old_scalar(cloud):
        sv, num = old_path(cloud)
        return jnp.sum(sv) + num.astype(jnp.float32)

    def new_scalar(cloud):
        sv, num = new_path(cloud)
        return jnp.sum(sv) + num.astype(jnp.float32)

    t_old = marg(old_scalar, vcloud)
    t_new = marg(new_scalar, vcloud)
    log(f"sort..reduce only: old {t_old*1e3:.2f} -> fused {t_new*1e3:.2f} ms/batch")

    # --- fullscale window ----------------------------------------------------
    fcfg = REFERENCE_FULLSCALE_CONFIG
    fspec = SceneSpec(n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000)
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(8)
    ]
    fpts = np.concatenate(parts)[: fcfg.max_points]
    fnp = np.zeros((fcfg.max_points, 3), np.float32)
    fnp[: len(fpts)] = fpts
    fvalid = np.zeros(fcfg.max_points, bool)
    fvalid[: len(fpts)] = True
    fcloud = Cloud(points=jnp.asarray(fnp), valid=jnp.asarray(fvalid))
    fbounds = ((fcfg.x_min, fcfg.y_min, fcfg.z_min), (fcfg.x_max, fcfg.y_max, fcfg.z_max))

    def fvox(cloud):
        r = voxel_downsample(
            cloud, fcfg.downsample_leaf_size, fcfg.max_voxels, fbounds,
            fcfg.voxel_sum_precision, fcfg.voxel_binning, fcfg.voxel_order,
        )
        return jnp.sum(r.cloud.points) + r.num_voxels.astype(jnp.float32)

    def fchained(m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return fvox(cc), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    fa, fb = fchained(1), fchained(4)
    ta, tb = timed(fa, fcloud), timed(fb, fcloud)
    if tb <= ta:
        ta, tb = timed(fa, fcloud), timed(fb, fcloud)
    log(f"fullscale voxel stage (fused): {(tb-ta)/3*1e3:.2f} ms/window "
        f"[old: ~13.6]")


if __name__ == "__main__":
    main()
