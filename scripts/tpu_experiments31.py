"""Round-3 perf experiments, part 22: 8-rows-per-step run-reduce on device.

_kernel8 (ops/pallas_runreduce.py) scans/reduces/compacts eight batch
rows per sequential grid step: full 32-sublane channel-major stacks, 8x
fewer grid steps, direct (8, w)-blocked [B, N] operands (no T(1,128)
relayout).  Validate bitwise vs the XLA fallback on hardware and measure
the isolated reduce + the composed voxel stage vs the 1-row kernel.
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
        _pallas_batched,
        _pallas_batched8,
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

    # --- correctness on device: kernel8 vs fallback -------------------------
    v8, n8 = jax.jit(
        lambda k, a, b, c: _pallas_batched8(
            k, (a, b, c), K, capacity, 8, 512, False
        )
    )(skey, sox, soy, soz)
    vf, nf = jax.jit(
        jax.vmap(
            lambda k, a, b, c: sorted_run_reduce(
                k, (a, b, c), K, capacity, group=8, use_pallas=False
            )
        )
    )(skey, sox, soy, soz)
    v8, n8, vf, nf = map(np.asarray, (v8, n8, vf, nf))
    assert np.array_equal(n8, nf), (n8[:4], nf[:4])
    ok = True
    for b in range(B):
        kk = min(int(nf[b]), capacity)
        if not np.array_equal(v8[b, :kk], vf[b, :kk]):
            ok = False
            d = np.abs(v8[b, :kk] - vf[b, :kk]).max()
            log(f"  row {b}: MISMATCH maxdiff={d:.3e}")
            break
    log(f"kernel8 vs fallback (device, B=32): bitwise={ok}")
    assert ok

    # --- packed payloads: both kernels vs packed fallback, on device --------
    q = jnp.float32(65536.0 / leaf)
    quantum = leaf / 65536.0

    def packit(o):
        return jnp.clip((o * q).astype(jnp.int32), 0, 65535)

    pxy = lax.shift_left(packit(sox), 16) | packit(soy)
    pz = packit(soz)
    vpf, npf = jax.jit(
        jax.vmap(
            lambda k, a, b: sorted_run_reduce(
                k, (a, b), K, capacity, group=8, use_pallas=False,
                quantum=quantum,
            )
        )
    )(skey, pxy, pz)
    for label, launcher in (("1-row", _pallas_batched), ("8-row", _pallas_batched8)):
        vp, np_ = jax.jit(
            lambda k, a, b, L=launcher: L(
                k, (a, b), K, capacity, 8, 512, False, quantum
            )
        )(skey, pxy, pz)
        vp, np_ = np.asarray(vp), np.asarray(np_)
        assert np.array_equal(np_, np.asarray(npf))
        okp = all(
            np.array_equal(
                vp[b, : min(int(np_[b]), capacity)],
                np.asarray(vpf)[b, : min(int(np_[b]), capacity)],
            )
            for b in range(B)
        )
        log(f"packed {label} vs packed fallback (device): bitwise={okp}")
        assert okp

    # --- perf: isolated reduce, 1-row vs 8-row, same process ----------------
    def chain(fn, m):
        def run(k, a, b, c):
            def body(carry, _):
                kk = k + (carry * 0.0).astype(k.dtype)
                return fn(kk, a + 0.0 * carry, b, c), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn):
        fa, fb = chain(fn, 1), chain(fn, 4)
        ta = timed(fa, skey, sox, soy, soz)
        tb = timed(fb, skey, sox, soy, soz)
        if tb <= ta:
            ta = timed(fa, skey, sox, soy, soz)
            tb = timed(fb, skey, sox, soy, soz)
        return (tb - ta) / 3.0

    for name, g, f, fn8 in [
        ("1-row g8  f512", 8, 512, False),
        ("1-row g32 f4096", 32, 4096, False),
        ("8-row g8  f512", 8, 512, True),
        ("8-row g8  f1024", 8, 1024, True),
        ("8-row g4  f512", 4, 512, True),
    ]:
        launcher = _pallas_batched8 if fn8 else _pallas_batched

        def red(k, a, b, c, L=launcher, gg=g, ff=f):
            vals, num = L(k, (a, b, c), K, capacity, gg, ff, False)
            return jnp.sum(vals) + jnp.sum(num).astype(jnp.float32)

        t = marg(red)
        log(f"reduce {name}: {t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")

    # --- composed voxel stage: kernel8 vs 1-row, same process (A/B) ---------
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr

    def chained(fn, m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jnp.sum(jax.vmap(fn)(cc)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def vox_full(cloud):
        r = voxel_downsample(
            cloud, leaf, capacity, bounds, cfg.voxel_sum_precision,
            cfg.voxel_binning, cfg.voxel_order,
        )
        return jnp.sum(r.cloud.points) + r.num_voxels.astype(jnp.float32)

    for label, flag in (("1-row", False), ("8-row", True), ("1-row again", False)):
        prr.KERNEL8_ENABLED = flag  # consulted at trace time; fresh jits below
        fa, fb = chained(vox_full, 1), chained(vox_full, 4)
        ta, tb = timed(fa, vcloud), timed(fb, vcloud)
        if tb <= ta:
            ta, tb = timed(fa, vcloud), timed(fb, vcloud)
        t = (tb - ta) / 3.0
        log(f"composed voxel stage [{label}]: {t*1e3:.2f} ms/batch "
            f"({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    main()
