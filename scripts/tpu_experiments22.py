"""Round-3 perf experiments, part 13: stacked-channel run-reduce A/B.

The kernel's window scan now stacks the 4 value channels on SUBLANES
([4, W] — one vector op per shift+add step instead of four) and the
group sweep (tpu_experiments21.py) showed larger windows win.  Measure
the stacked kernel at groups {8, 16, 32} on the flagship shape, verify
device outputs still match the XLA fallback bitwise, and re-time the
full voxel stage + fullscale window at the winning group.
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

    # --- correctness: stacked kernel vs XLA fallback, on device -------------
    k0, o0 = skey[0], soffs[0]
    vp, npal = jax.jit(
        lambda k, o: sorted_run_reduce(k, o, K, capacity, group=32, use_pallas=True)
    )(k0, o0)
    vf, nf = jax.jit(
        lambda k, o: sorted_run_reduce(k, o, K, capacity, group=32, use_pallas=False)
    )(k0, o0)
    vp, npal, vf, nf = map(np.asarray, (vp, npal, vf, nf))
    kk = min(int(npal), capacity)
    assert int(npal) == int(nf), (npal, nf)
    bit_eq = np.array_equal(vp[:kk], vf[:kk])
    log(f"stacked kernel vs fallback (device): num={int(npal)} bitwise_eq={bit_eq}")
    assert bit_eq

    # --- reduce sweep ---------------------------------------------------------
    def chain_arr(fn, m):
        def run(a, b):
            def body(carry, _):
                return fn(a, b + 0.0 * carry), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg2(fn, a, b):
        fa, fb = chain_arr(fn, 1), chain_arr(fn, 4)
        ta, tb = timed(fa, a, b), timed(fb, a, b)
        if tb <= ta:
            ta, tb = timed(fa, a, b), timed(fb, a, b)
        return (tb - ta) / 3.0

    for group in (8, 16, 32):

        def red_scalar(k, o, g=group):
            vals, num = jax.vmap(
                lambda k1, o1: sorted_run_reduce(k1, o1, K, capacity, group=g)
            )(k, o)
            return jnp.sum(vals) + jnp.sum(num).astype(jnp.float32)

        t = marg2(red_scalar, skey, soffs)
        log(f"stacked reduce group={group:2d}: {t*1e3:.2f} ms/batch "
            f"({t/B*1e3:.3f} ms/scan)   [unstacked: g8 11.66 g16 10.94 g32 9.57]")

    # --- full voxel stage at the (new) default --------------------------------
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
    log(f"flagship voxel stage: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan) "
        f"[pre-stacking: 25.0 / 0.782]")

    # --- fullscale window ------------------------------------------------------
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
    fbounds = (
        (fcfg.x_min, fcfg.y_min, fcfg.z_min), (fcfg.x_max, fcfg.y_max, fcfg.z_max)
    )

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
    log(f"fullscale voxel stage: {(tb-ta)/3*1e3:.2f} ms/window [pre-stacking: 11.7]")


if __name__ == "__main__":
    main()
