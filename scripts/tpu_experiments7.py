"""TPU micro-experiments, round 7: Pallas sequential-overwrite compaction.

Round 6 showed compact_and_gather_blocks' one-hot dot is ~35 ms/batch-of-32
(production terms) at A~1.8k.  The new kernel (ops/pallas_compaction.py)
compacts each 128-lane block in VMEM and dynamic-slice-stores it at its
running offset, exploiting the sequential TPU grid.  Measure it, pick the
group size, and validate exactness on hardware.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def log(*a):
    print(*a, flush=True)


NULL = [0.0]


def timed(fn, *args, iters=5, label=""):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    log(f"  {label:<56s} {t*1e3:9.2f} ms/batch  (true ~{t*1e3-NULL[0]:8.2f})")
    return t


def main():
    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.mxu_histogram import (
        compact_and_gather_blocks,
        weighted_histogram_blocks,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.pallas_compaction import (
        compact_and_gather_exact,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec, voxel_partials
    from tpu_experiments import make_inputs

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    cfg = REFERENCE_YAML_CONFIG.replace(
        max_points=131072, max_voxels=16384, downsample_leaf_size=0.04,
    )
    clouds = make_inputs(cfg)
    small = jnp.ones((8, 8), jnp.float32)
    NULL[0] = timed(jax.jit(lambda s: jnp.sum(s)), small, iters=8, label="null (RPC)") * 1e3

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    S = cfg.max_voxels

    def make_bins(cc):
        pts = cc.points
        valid = cc.valid & jnp.all(jnp.isfinite(pts), axis=-1)
        ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner = ijk.astype(jnp.float32) * jnp.float32(leaf)
        off = jnp.where(valid[:, None], pts - corner, 0.0)
        upd = jnp.concatenate([off, valid.astype(jnp.float32)[:, None]], -1)
        blocks, a, b = weighted_histogram_blocks(packed, upd, valid, K, exact_f32=False)
        bins = blocks.reshape(4, a * b)
        kp = -(-(a * b) // 128) * 128
        if kp != a * b:
            bins = jnp.pad(bins, ((0, 0), (0, kp - a * b)))
        return bins, (bins[3] > 0.0).reshape(kp // 128, 128)

    binsv, occv = jax.jit(jax.vmap(make_bins))(seeded.cloud)
    log(f"K={K}  a_blocks={occv.shape[1]}  S={S}")

    # e0: current production voxel_partials (fast)
    def e0(c):
        r = jax.vmap(lambda cc: voxel_partials(cc, leaf, S, bounds, "fast"))(c)
        return jnp.sum(r.sums) + jnp.sum(r.counts)

    timed(jax.jit(e0), seeded.cloud, label="e0 voxel_partials current (fast)")

    # e1: binning alone
    def e1(c):
        b, o = jax.vmap(make_bins)(c)
        return jnp.sum(b[:, 3, ::64])

    timed(jax.jit(e1), seeded.cloud, label="e1 binning alone (1-term)")

    # e2: current compact_and_gather (production fast terms [1,1,1,2])
    def e2(b, o):
        def one(bb, oo):
            loc, num, vals = compact_and_gather_blocks(bb, oo, S, [1, 1, 1, 2])
            return jnp.sum(loc) + jnp.sum(vals)
        return jnp.sum(jax.vmap(one)(b, o))

    timed(jax.jit(e2), binsv, occv, label="e2 compact_and_gather terms=[1,1,1,2]")

    # e3: pallas kernel at several group sizes
    for grp in (8, 16, 32):
        def e3(b, o, grp=grp):
            def one(bb, oo):
                loc, num, vals = compact_and_gather_exact(
                    bb, oo, S, use_pallas=True, group=grp
                )
                return jnp.sum(loc) + jnp.sum(vals)
            return jnp.sum(jax.vmap(one)(b, o))

        timed(jax.jit(e3), binsv, occv, label=f"e3 pallas compact+gather group={grp}")

    # e4: hardware exactness: pallas vs fallback gathers
    def pall(b, o):
        return jax.vmap(
            lambda bb, oo: compact_and_gather_exact(bb, oo, S, use_pallas=True)
        )(b, o)

    loc_p, num_p, vals_p = jax.jit(pall)(binsv, occv)
    loc_p, num_p, vals_p = map(np.asarray, (loc_p, num_p, vals_p))
    binsn, occn = np.asarray(binsv), np.asarray(occv)
    bad = 0
    for bi in range(binsn.shape[0]):
        gt = np.flatnonzero(binsn[bi, 3] > 0)[:S]
        k = len(gt)
        if num_p[bi] != (binsn[bi, 3] > 0).sum():
            bad += 1; log(f"  scan {bi}: num mismatch {num_p[bi]}")
            continue
        if not np.array_equal(loc_p[bi, :k], gt):
            bad += 1; log(f"  scan {bi}: loc mismatch")
            continue
        if not np.array_equal(vals_p[bi, :k], binsn[bi].T[gt]):
            d = np.abs(vals_p[bi, :k] - binsn[bi].T[gt]).max()
            bad += 1; log(f"  scan {bi}: vals mismatch max {d}")
    log(f"e4 hardware exactness: {'OK - bit-exact all 32 scans' if bad == 0 else f'{bad} BAD'}")


if __name__ == "__main__":
    main()
