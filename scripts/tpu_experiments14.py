"""Round-3 perf experiments, part 5: the integrated product paths.

1. Flagship pipeline e2e at the honest config (24576 voxels, cluster 1024,
   Pallas sortnet) — chained marginal + overflow flags.
2. Fullscale (REFERENCE_FULLSCALE_CONFIG) window: does the Pallas sortnet
   at nc=256, tc=256 fit VMEM, and what is the window time now?
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


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
        FLAGSHIP_CONFIG,
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((128, 128))
    np.asarray(jnp.sum(x @ x))
    log("probe ok")

    cfg = FLAGSHIP_CONFIG
    log(f"flagship: max_voxels={cfg.max_voxels} cluster_capacity={cfg.cluster_capacity}")
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
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def make(m):
        def chained(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                r = jax.vmap(lambda a, b: process_scan(a, b, cfg))(cc, k)
                s = jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(
                    r.clusters.num_clusters
                )
                return s.astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    fa, fb = make(1), make(5)
    ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
    if tb <= ta:
        ta, tb = timed(fa, clouds, keys), timed(fb, clouds, keys)
    t = (tb - ta) / 4
    r = jax.jit(jax.vmap(lambda a, b: process_scan(a, b, cfg)))(clouds, keys)
    flags = {
        f: int(np.asarray(getattr(r.stats, f)).sum())
        for f in ("voxel_overflow", "cluster_overflow", "planes_truncated")
    }
    log(f"[flagship honest+pallas-net] {t*1e3:.2f} ms/batch -> {B/t:.1f} scans/s; "
        f"flags {flags}")

    # ---- fullscale ---------------------------------------------------------
    fcfg = REFERENCE_FULLSCALE_CONFIG
    fspec = SceneSpec(n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000)
    parts = [make_scene(seed=100 + i, spec=fspec).points for i in range(8)]
    fpts = np.concatenate(parts)[: fcfg.max_points]
    fbuf = np.zeros((fcfg.max_points, 3), np.float32)
    fbuf[: len(fpts)] = fpts
    fvalid = np.zeros(fcfg.max_points, bool)
    fvalid[: len(fpts)] = True
    fcloud = Cloud(points=jnp.asarray(fbuf), valid=jnp.asarray(fvalid))

    def f_chain(m):
        def chained(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                r = process_scan(cc, k, fcfg)
                return jnp.sum(r.grid.data.astype(jnp.int32)).astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(chained)

    f1, f3 = f_chain(1), f_chain(3)
    t1 = timed(f1, fcloud, keys[0], iters=3)
    t3 = timed(f3, fcloud, keys[0], iters=3)
    if t3 <= t1:
        t1, t3 = timed(f1, fcloud, keys[0], iters=3), timed(f3, fcloud, keys[0], iters=3)
    tw = (t3 - t1) / 2
    rf = jax.jit(lambda c, k: process_scan(c, k, fcfg))(fcloud, keys[0])
    fflags = {
        f: bool(np.asarray(getattr(rf.stats, f)))
        for f in ("voxel_overflow", "cluster_overflow", "planes_truncated")
    }
    log(f"[fullscale+pallas-net] {tw*1e3:.1f} ms/window; flags {fflags}; "
        f"voxels={int(rf.stats.voxel_points)}")


if __name__ == "__main__":
    sys.exit(main())
