"""Round-3 perf experiments, part 31: the compact + mark+grid prefix tails.

The round-3 prefix profile (scripts/profile_prefix.py at the 807.7
headline tree) shows two stages that were never attacked directly:

  prefix 1..5 (compact):   +5.30 ms/batch   (nonplane 24576 -> 1024 slots)
  prefix 1..9 (mark+grid): +3.71 ms/batch   (histogram over 24576 rows)

Part A - compact variants over a realistic sparse nonplane mask
(~600/24576 valid):
  a. current ops/compaction.compact (compact_occupied_blocks one-hot
     matmul + a [1024]-row XLA gather — the gather serializes);
  b. stable 1-key sort (key = valid ? iota : INT32_MAX, payloads x/y/z)
     + slice 1024 — the RANSAC valid-first permutation trick at the
     smaller shape;
  c. pallas compact_and_gather_exact with bins [4, N] (x, y, z,
     valid-as-count) — the voxel path's sequential-overwrite kernel.

Part B - mark_obstacles dissection:
  m0. grid_cell_xy alone (closed form + 4 fixup passes);
  m1. + flat index, ok mask, divmod re-split;
  m2. + histogram2d_mxu + where (full mark_obstacles).

All timings are chained 4-vs-1 marginals from pre-staged device arrays;
the float perturbation rides BOTH points and the valid mask's float
carrier so no variant can hoist mask-only work out of the scan body.
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
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import (
        crop_and_seed,
        grid_cell_xy,
        mark_obstacles,
    )
    from pointcloud_obstacle_processing_tpu.ops.pallas_compaction import (
        compact_and_gather_exact,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    B = 32
    CAP = cfg.cluster_capacity  # 1024
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

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, payload_packing=cfg.voxel_payload_packing,
            )
        )
    )(seeded.cloud)
    N = cfg.max_voxels
    vpts = np.asarray(vox.cloud.points)
    vvalid = np.asarray(vox.cloud.valid)
    # realistic nonplane survivor mask: ~600 scattered points
    rng = np.random.default_rng(3)
    keep = vvalid & (rng.random((B, N)) < 0.028)
    log(f"nonplane-like mask: {keep.sum(1).min()}..{keep.sum(1).max()} of {N}")

    P = jnp.asarray(vpts)
    VF = jnp.asarray(keep.astype(np.float32))

    def chain(fn, m):
        def run(p, vf):
            def body(carry, _):
                out = fn(p + 0.0 * carry, vf + 0.0 * carry)
                return jnp.sum(out).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, *args):
        fa, fb = chain(fn, 1), chain(fn, 4)
        ta, tb = timed(fa, *args), timed(fb, *args)
        ta2, tb2 = timed(fa, *args), timed(fb, *args)
        return (min(tb, tb2) - min(ta, ta2)) / 3.0

    I32_MAX = jnp.iinfo(jnp.int32).max

    # ---- Part A: compact variants ----------------------------------------
    def a_current(p, vf):
        v = vf > 0.5
        r = jax.vmap(lambda pp, vv: compact(Cloud(points=pp, valid=vv), CAP))(p, v)
        return jnp.sum(r.cloud.points) + jnp.sum(r.count)

    def b_sort(p, vf):
        v = vf > 0.5

        def one(pp, vv):
            n = pp.shape[0]
            iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            key = jnp.where(vv, iota, I32_MAX)
            sk, sx, sy, sz = lax.sort(
                (key, pp[:, 0], pp[:, 1], pp[:, 2]), num_keys=1, is_stable=True
            )
            cnt = jnp.sum(vv.astype(jnp.int32))
            out_valid = (
                lax.broadcasted_iota(jnp.int32, (CAP, 1), 0)[:, 0]
                < jnp.minimum(cnt, CAP)
            )
            ptso = jnp.stack([sx[:CAP], sy[:CAP], sz[:CAP]], axis=-1)
            return jnp.sum(jnp.where(out_valid[:, None], ptso, 0.0)) + cnt

        return jnp.sum(jax.vmap(one)(p, v))

    def c_pallas(p, vf):
        v = vf > 0.5

        def one(pp, vv):
            cnt_ch = vv.astype(jnp.float32)
            bins = jnp.concatenate([pp.T, cnt_ch[None, :]], axis=0)  # [4, N]
            occ2d = vv.reshape(N // 128, 128)
            loc, num, vals = compact_and_gather_exact(bins, occ2d, CAP)
            out_valid = (
                lax.broadcasted_iota(jnp.int32, (CAP, 1), 0)[:, 0]
                < jnp.minimum(num, CAP)
            )
            return jnp.sum(jnp.where(out_valid[:, None], vals[:, :3], 0.0)) + num

        return jnp.sum(jax.vmap(one)(p, v))

    # parity check (valid slots only)
    ra = jax.jit(
        jax.vmap(
            lambda pp, vv: compact(Cloud(points=pp, valid=vv), CAP)
        )
    )(P, VF > 0.5)
    n0 = np.asarray(ra.count)

    def sort_pts(pp, vv):
        n = pp.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        key = jnp.where(vv, iota, I32_MAX)
        _, sx, sy, sz = lax.sort(
            (key, pp[:, 0], pp[:, 1], pp[:, 2]), num_keys=1, is_stable=True
        )
        return jnp.stack([sx[:CAP], sy[:CAP], sz[:CAP]], axis=-1)

    rb = np.asarray(jax.jit(jax.vmap(sort_pts))(P, VF > 0.5))
    pa = np.asarray(ra.cloud.points)
    ok = all(np.array_equal(pa[i, : n0[i]], rb[i, : n0[i]]) for i in range(B))
    log(f"parity sort vs current (valid slots): {'OK' if ok else 'MISMATCH'}")

    def pallas_pts(pp, vv):
        bins = jnp.concatenate([pp.T, vv.astype(jnp.float32)[None, :]], axis=0)
        _, num, vals = compact_and_gather_exact(bins, vv.reshape(N // 128, 128), CAP)
        return vals[:, :3]

    rc = np.asarray(jax.jit(jax.vmap(pallas_pts))(P, VF > 0.5))
    ok = all(np.array_equal(pa[i, : n0[i]], rc[i, : n0[i]]) for i in range(B))
    log(f"parity pallas vs current (valid slots): {'OK' if ok else 'MISMATCH'}")

    for name, f in (
        ("a. current blocks+gather", a_current),
        ("b. stable-sort valid-first", b_sort),
        ("c. pallas compact_and_gather", c_pallas),
    ):
        t = marg(f, P, VF)
        log(f"compact {name}: {t*1e3:.2f} ms/batch")

    # ---- Part B: mark_obstacles dissection --------------------------------
    grid0 = jnp.zeros((B, cfg.grid_height, cfg.grid_width), jnp.int8)

    def m0(p, vf):
        col, row = jax.vmap(lambda pp: grid_cell_xy(pp, cfg))(p)
        return jnp.sum(col) + jnp.sum(row) + jnp.sum(vf)

    def m1(p, vf):
        v = vf > 0.5

        def one(pp, vv):
            col, row = grid_cell_xy(pp, cfg)
            index = row * cfg.grid_width + col
            ok = (
                vv
                & jnp.all(jnp.isfinite(pp), axis=-1)
                & (index >= 0)
                & (index < cfg.grid_size)
            )
            r2 = index // cfg.grid_width
            c2 = index % cfg.grid_width
            return jnp.sum(r2) + jnp.sum(c2) + jnp.sum(ok)

        return jnp.sum(jax.vmap(one)(p, v))

    def m2(p, vf):
        v = vf > 0.5
        out = jax.vmap(
            lambda g, pp, vv: mark_obstacles(g, Cloud(points=pp, valid=vv), cfg)
        )(grid0, p, v)
        return jnp.sum(out.astype(jnp.int32))

    for name, f in (
        ("m0 grid_cell_xy only", m0),
        ("m1 + index/ok/divmod", m1),
        ("m2 full mark_obstacles", m2),
    ):
        t = marg(f, P, VF)
        log(f"mark {name}: {t*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
