"""TPU micro-experiments, round 6: inside compact_and_gather_blocks.

Round 5: binning is 9.7 ms/batch (channel-leading layout), but
compact_and_gather adds ~77 ms.  Isolate: occupancy-only compaction, the
one-hot dot's column scaling, XLA 1-D value gathers as the alternative.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

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
    log(f"  {label:<52s} {t*1e3:9.2f} ms/batch  (true ~{t*1e3-NULL[0]:8.2f})")
    return t


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.mxu_histogram import (
        compact_and_gather_blocks,
        compact_occupied_blocks,
        weighted_histogram_blocks,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec
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

    # precompute bins for isolation
    binsv, occv = jax.jit(jax.vmap(make_bins))(seeded.cloud)

    # e0: occupancy-only compaction
    def e0(o):
        def one(oo):
            loc, num = compact_occupied_blocks(oo, S)
            return jnp.sum(loc) + num
        return jnp.sum(jax.vmap(one)(o))

    timed(jax.jit(e0), occv, label="e0 compact_occupied_blocks only")

    # e1: compaction + 4 XLA 1-D channel gathers
    def e1(b, o):
        def one(bb, oo):
            loc, num = compact_occupied_blocks(oo, S)
            vals = jnp.stack([bb[ci][loc] for ci in range(4)], axis=-1)
            return jnp.sum(loc) + jnp.sum(vals)
        return jnp.sum(jax.vmap(one)(b, o))

    timed(jax.jit(e1), binsv, occv, label="e1 compaction + 4x XLA 1-D gathers")

    # e2: current fused compact_and_gather (2 terms)
    def e2(b, o):
        def one(bb, oo):
            loc, num, vals = compact_and_gather_blocks(bb, oo, S, 2)
            return jnp.sum(loc) + jnp.sum(vals)
        return jnp.sum(jax.vmap(one)(b, o))

    timed(jax.jit(e2), binsv, occv, label="e2 fused compact_and_gather (2 terms)")

    # e3: fused with 1 term (column scaling probe)
    def e3(b, o):
        def one(bb, oo):
            loc, num, vals = compact_and_gather_blocks(bb, oo, S, 1)
            return jnp.sum(loc) + jnp.sum(vals)
        return jnp.sum(jax.vmap(one)(b, o))

    timed(jax.jit(e3), binsv, occv, label="e3 fused compact_and_gather (1 term)")

    # e4: the big one-hot dot alone (fixed blk, full gmat columns)
    a_blocks = occv.shape[1]

    def e4(b, o):
        def one(bb, oo):
            blk = jnp.arange(S, dtype=jnp.int32) % a_blocks
            cols = lax.broadcasted_iota(jnp.int32, (1, a_blocks), 1)
            oh = (blk[:, None] == cols).astype(jnp.bfloat16)
            t0 = bb.reshape(4, a_blocks, 128).astype(jnp.bfloat16)
            gmat = jnp.concatenate(
                [oo.astype(jnp.bfloat16)]
                + [t0[ci] for ci in range(4)]
                + [t0[ci] for ci in range(4)],
                axis=1,
            )  # [A, 128*9] ~ same width as production
            g = lax.dot_general(
                oh, gmat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(g[:, ::64])
        return jnp.sum(jax.vmap(one)(b, o))

    timed(jax.jit(e4), binsv, occv, label="e4 one-hot dot alone (1152 cols)")

    # e5: the per-slot postprocessing alone (cumsum/argmax/lane-select)
    def e5(b, o):
        def one(bb, oo):
            rows = oo[jnp.arange(S, dtype=jnp.int32) % a_blocks].astype(jnp.int32)
            local = jnp.cumsum(rows, axis=1)
            hit = local == 3
            lane = jnp.argmax(hit, axis=1)
            vals = bb[:, : S * 1].reshape(4, S).T  # stand-in read
            return jnp.sum(lane) + jnp.sum(vals)
        return jnp.sum(jax.vmap(one)(b, o))

    timed(jax.jit(e5), binsv, occv, label="e5 rows cumsum/argmax alone (approx)")


if __name__ == "__main__":
    main()
