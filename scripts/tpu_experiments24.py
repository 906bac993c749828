"""Round-3 perf experiments, part 15: run-reduce prologue cost + flush sweep.

tpu_experiments22/23 left ~6.8 ms/batch of the flagship voxel stage
unattributed: the kernel's XLA prologue (flags, per-block run-end counts,
cumsum offsets, boundary-key meta) depends only on the sorted KEYS and was
hoisted out of the offs-chained reduce timings.  Here:

A. time the prologue alone (chained on keys);
B. sweep (group, flush-quantum) with keys chained in, so each number is
   prologue + kernel — the voxel stage's true marginal reduce cost;
C. fullscale-shape spot check of the winning (group, flush).
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
    from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
        _flags,
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

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud
    skey, sox, soy, soz = jax.jit(jax.vmap(sorted_inputs))(vcloud)
    soffs = jnp.stack([sox, soy, soz], axis=1)  # [B, 3, N]
    n = skey.shape[1]

    def chain2(fn, m):
        # float carry: 0.0*carry is NOT algebraically removable (NaN
        # semantics), so both operands stay loop-dependent — an int32
        # 0*carry gets folded and the whole body hoisted (measured: negative
        # marginals).
        def run(a, b):
            def body(carry, _):
                kk = a + (carry * 0.0).astype(a.dtype)
                return fn(kk, b + 0.0 * carry).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn, a, b):
        fa, fb = chain2(fn, 1), chain2(fn, 4)
        ta, tb = timed(fa, a, b), timed(fb, a, b)
        if tb <= ta:
            ta, tb = timed(fa, a, b), timed(fb, a, b)
        return (tb - ta) / 3.0

    # --- A. prologue alone ----------------------------------------------------
    def prologue(k, _o, group=8):
        k = k.astype(jnp.int32)
        w = group * 128
        steps = n // w
        a = n // 128
        is_end = jax.vmap(lambda kk: _flags(kk, K)[2])(k)
        per_block = jnp.sum(is_end.reshape(B, a, 128).astype(jnp.int32), axis=2)
        offsets = jnp.cumsum(per_block, axis=1)
        num = offsets[:, -1]
        excl = offsets - per_block
        firsts = jnp.concatenate(
            [k[:, ::w], jnp.full((B, 1), -2, jnp.int32)], axis=1
        )
        prevs = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), k[:, w - 1 :: w][:, : steps - 1]],
            axis=1,
        )
        return (
            jnp.sum(excl) + jnp.sum(num) + jnp.sum(firsts) + jnp.sum(prevs)
        ).astype(jnp.float32)

    t = marg(prologue, skey, soffs)
    log(f"prologue alone (g8): {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- B. (group, flush) sweep, keys chained in -----------------------------
    for group, flush in [
        (8, 512), (8, 1024), (16, 1024), (32, 512), (32, 1024), (32, 2048),
        (32, 4096),
    ]:

        def red_scalar(k, o, g=group, f=flush):
            vals, num = jax.vmap(
                lambda k1, o1: sorted_run_reduce(
                    k1, o1, K, capacity, group=g, flush=f
                )
            )(k, o)
            return jnp.sum(vals) + jnp.sum(num).astype(jnp.float32)

        t = marg(red_scalar, skey, soffs)
        log(f"reduce+prologue group={group:2d} flush={flush:4d}: "
            f"{t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- C. fullscale spot check ----------------------------------------------
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
    fbounds = (
        (fcfg.x_min, fcfg.y_min, fcfg.z_min), (fcfg.x_max, fcfg.y_max, fcfg.z_max)
    )
    fimin, fdims = _pack_spec(fbounds, fcfg.downsample_leaf_size)
    fK = fdims[0] * fdims[1] * fdims[2]
    fleaf = fcfg.downsample_leaf_size

    def fsorted(p, v):
        ijk = jnp.floor(p / jnp.float32(fleaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - fimin[0], 0, fdims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - fimin[1], 0, fdims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - fimin[2], 0, fdims[2] - 1)
        packed = jnp.where(v, (ix * fdims[1] + iy) * fdims[2] + iz, fK)
        corner0 = (
            jnp.stack([ix + fimin[0], iy + fimin[1], iz + fimin[2]], axis=0).astype(
                jnp.float32
            )
            * jnp.float32(fleaf)
        )
        off0 = jnp.where(v[None, :], p.T - corner0, 0.0)
        return lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )

    fk, fx, fy, fz = jax.jit(fsorted)(jnp.asarray(fnp), jnp.asarray(fvalid))
    fo = jnp.stack([fx, fy, fz], axis=0)

    def fchain(g, f, m):
        def run(k, o):
            def body(carry, _):
                kk = k + (carry * 0.0).astype(k.dtype)
                vals, num = sorted_run_reduce(
                    kk, o + 0.0 * carry, fK, fcfg.max_voxels, group=g, flush=f
                )
                return jnp.sum(vals) + num.astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    for g, f in [(32, 512), (32, 1024), (32, 2048)]:
        fa, fb = fchain(g, f, 1), fchain(g, f, 4)
        ta, tb = timed(fa, fk, fo), timed(fb, fk, fo)
        if tb <= ta:
            ta, tb = timed(fa, fk, fo), timed(fb, fk, fo)
        log(f"fullscale reduce+prologue g={g} flush={f}: "
            f"{(tb-ta)/3*1e3:.2f} ms/window")


if __name__ == "__main__":
    main()
