"""Round-3 perf experiments, part 62: the in-context sort gap.

tpu_experiments55 put the fullscale stable sort at 4.62 ms/window in
pipeline context, while a PURE sort of identical pre-materialized
[2M] (key, pxy, qz) arrays is 3.6 ms — a ~1 ms gap that can only be
producer fusion/layout: XLA either fuses the crop+pack computation into
the sort's operand copy (recomputing it per bitonic pass?) or inserts
relayout copies.  Interleaved chained marginals over one process:

(p)    crop + key/offset/payload pack, consumed directly
(ps)   p + lax.sort                         — the shipped form
(psb)  p + optimization_barrier(operands) + lax.sort

If (psb) - (p) lands near the 3.6 pure floor while (ps) - (p) stays
~4.6, a barrier before the sort ships (values unaffected: the barrier
is an identity).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=4):
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
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    cfg = REFERENCE_FULLSCALE_CONFIG
    leaf = cfg.downsample_leaf_size
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    imin = [math.floor(v / leaf) for v in bounds[0]]
    imax = [math.floor(v / leaf) for v in bounds[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    K = dims[0] * dims[1] * dims[2]

    fspec = SceneSpec(
        n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000
    )
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(8)
    ]
    fpts = np.concatenate(parts)[: cfg.max_points]
    fcloud_np = np.zeros((cfg.max_points, 3), np.float32)
    fcloud_np[: len(fpts)] = fpts
    fvalid = np.zeros(cfg.max_points, bool)
    fvalid[: len(fpts)] = True
    window = Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))

    def pack(cloud):
        seed = crop_and_seed(cloud, cfg)
        pts, valid = seed.cloud.points, seed.cloud.valid
        ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0)
            .astype(jnp.float32) * jnp.float32(leaf)
        )
        off0 = jnp.where(valid[None, :], pts.T - corner0, 0.0)
        q = jnp.float32(65536.0 / leaf)
        qx = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        qy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        qz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        pxy = lax.shift_left(qx, 16) | qy
        return packed, pxy, qz

    def consume3(a, b, c):
        return (
            jnp.sum(a, dtype=jnp.int64).astype(jnp.float32)
            + jnp.sum(b, dtype=jnp.int64).astype(jnp.float32)
            + jnp.sum(c, dtype=jnp.int64).astype(jnp.float32)
        )

    def v_p(cloud):
        return consume3(*pack(cloud))

    def v_ps(cloud):
        skey, spxy, spz = lax.sort(pack(cloud), num_keys=1, is_stable=True)
        return consume3(skey, spxy, spz)

    def v_psb(cloud):
        ops = lax.optimization_barrier(pack(cloud))
        skey, spxy, spz = lax.sort(ops, num_keys=1, is_stable=True)
        return consume3(skey, spxy, spz)

    def make(run, m):
        def chained(cloud):
            def body(carry, _):
                cc = Cloud(points=cloud.points + 0.0 * carry, valid=cloud.valid)
                return run(cc), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    variants = {"p_pack_only": v_p, "ps_sort": v_ps, "psb_barrier_sort": v_psb}
    fns = {}
    for name, run in variants.items():
        f1, f4 = make(run, 1), make(run, 4)
        np.asarray(f1(window))
        np.asarray(f4(window))
        fns[name] = (f1, f4)

    a = np.asarray(fns["ps_sort"][0](window))
    b = np.asarray(fns["psb_barrier_sort"][0](window))
    log(f"scalar check: ps {a!r} psb {b!r} equal={bool(a == b)}")

    for rnd in range(3):
        for name, (f1, f4) in fns.items():
            t1, t4 = timed(f1, window), timed(f4, window)
            log(
                f"[round {rnd} {name}] marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/window (t1 {t1*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
