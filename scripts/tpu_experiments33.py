"""Round-3 perf experiments, part 24: honest buffer right-sizing + combined
gated features.

(a) FLAGSHIP max_points is 131072 for ~98.5k-pt bench scenes (25% padding
    in every N-bound op).  BASELINE.json's contract is "100k-point
    clouds": capacity 100352 (= 784 * 128 >= 100k) keeps every workload
    point AND still fits a true 100k cloud.  Whether it wins depends on
    XLA internals (a bitonic sort that pads to the next power of two
    would erase the sort share of the win) — measure the full pipeline
    marginal at both capacities on the SAME scenes.

(b) Composed voxel stage with kernel8 + payload packing TOGETHER (exp31
    and exp32 measure them separately), at both capacities.
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
    from pointcloud_obstacle_processing_tpu.ops import pallas_runreduce as prr
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    log("probe ok")

    B = 32
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    scenes = [make_scene(seed=i, spec=spec).points for i in range(8)]
    log(f"scene sizes: {[len(s) for s in scenes[:3]]}")

    def make_batch(cfg):
        pts = np.zeros((B, cfg.max_points, 3), np.float32)
        valid = np.zeros((B, cfg.max_points), bool)
        for i in range(B):
            p = scenes[i % 8][: cfg.max_points]
            pts[i, : len(p)] = p
            valid[i, : len(p)] = True
        return Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))

    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def pipe_marg(cfg, clouds):
        def pipe_scalar(c, k):
            r = jax.vmap(lambda cc, kk: process_scan(cc, kk, cfg))(c, k)
            return (
                jnp.sum(r.grid.data.astype(jnp.int32))
                + jnp.sum(r.clusters.num_clusters)
            ).astype(jnp.float32)

        def chained(m):
            def run(c, k):
                def body(carry, _):
                    cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                    return pipe_scalar(cc, k), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(run)

        f1, f4 = chained(1), chained(4)
        ta, tb = timed(f1, clouds, keys, iters=4), timed(f4, clouds, keys, iters=4)
        if tb <= ta:
            ta, tb = timed(f1, clouds, keys, iters=4), timed(f4, clouds, keys, iters=4)
        return (tb - ta) / 3.0

    # ---- (a) full pipeline at both capacities -------------------------------
    for n_cap in (131072, 100352):
        cfg = FLAGSHIP_CONFIG.replace(max_points=n_cap)
        clouds = make_batch(cfg)
        t = pipe_marg(cfg, clouds)
        log(
            f"pipeline max_points={n_cap}: {t*1e3:.2f} ms/batch "
            f"({t/B*1e3:.3f} ms/scan, {B/t:.1f} scans/s)"
        )

    # ---- (b) composed voxel stage: gated-feature grid ------------------------
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed

    for n_cap in (131072, 100352):
        cfg = FLAGSHIP_CONFIG.replace(max_points=n_cap)
        clouds = make_batch(cfg)
        bounds = (
            (cfg.x_min, cfg.y_min, cfg.z_min),
            (cfg.x_max, cfg.y_max, cfg.z_max),
        )
        vcloud = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds).cloud

        def vox_marg(packing, k8):
            prr.KERNEL8_ENABLED = k8  # consulted at trace time

            def f(cloud):
                r = voxel_downsample(
                    cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                    cfg.voxel_sum_precision, "sort", "lattice", packing,
                )
                return jnp.sum(r.cloud.points[::64]) + r.num_voxels.astype(
                    jnp.float32
                )

            def chained(m):
                def run(c):
                    def body(carry, _):
                        cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                        return jnp.sum(jax.vmap(f)(cc)).astype(jnp.float32), None

                    out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                    return out

                return jax.jit(run)

            fa, fb = chained(1), chained(4)
            ta, tb = timed(fa, vcloud), timed(fb, vcloud)
            if tb <= ta:
                ta, tb = timed(fa, vcloud), timed(fb, vcloud)
            return (tb - ta) / 3.0

        for packing, k8 in ((False, False), (True, False), (False, True), (True, True)):
            t = vox_marg(packing, k8)
            log(
                f"voxel n={n_cap} packing={int(packing)} kernel8={int(k8)}: "
                f"{t*1e3:.2f} ms/batch ({t/B*1e3:.3f} ms/scan)"
            )
        prr.KERNEL8_ENABLED = False


if __name__ == "__main__":
    main()
