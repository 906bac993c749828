"""Round-3 perf experiments, part 28: A/B the forced-compact kernel readback.

After _compact_vals (optimization_barrier on the run-reduce / compaction
kernels' sliced outputs): re-measure _sort_segment_partials (was 15.87
ms/batch), full voxel_downsample (was 16.18) and the full process_scan
marginal (was ~39.6 at 807.7 scans/s) at the flagship shape.
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
    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        _pack_spec,
        _sort_segment_partials,
        voxel_downsample,
    )
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
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
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels
    imin, dims = _pack_spec(bounds, leaf)

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud

    def chain_cloud(fn, m, with_keys=False):
        def run(c, k):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jnp.sum(fn(cc, k) if with_keys else fn(cc)), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg_cloud(fn, src, with_keys=False):
        fa = chain_cloud(fn, 1, with_keys)
        fb = chain_cloud(fn, 4, with_keys)
        ta, tb = timed(fa, src, keys), timed(fb, src, keys)
        ta2, tb2 = timed(fa, src, keys), timed(fb, src, keys)
        return (min(tb, tb2) - min(ta, ta2)) / 3.0

    def partials_scal(cloud):
        p = cloud.points
        v = cloud.valid & jnp.all(jnp.isfinite(p), axis=-1)
        ijk = jnp.floor(p / jnp.float32(leaf)).astype(jnp.int32)
        r = jax.vmap(
            lambda pp, vv, kk: _sort_segment_partials(
                pp, vv, kk, imin, dims, leaf, capacity, "lattice", True
            )
        )(p, v, ijk)
        return (
            jnp.sum(r.sums)
            + jnp.sum(r.counts)
            + jnp.sum(r.num_voxels).astype(jnp.float32)
        )

    t = marg_cloud(partials_scal, vcloud)
    log(f"_sort_segment_partials: {t*1e3:.2f} ms/batch (was 15.87)")

    def vox_scal(cloud):
        r = jax.vmap(
            lambda cc: voxel_downsample(
                cc, leaf, capacity, bounds, cfg.voxel_sum_precision,
                cfg.voxel_binning, cfg.voxel_order, cfg.voxel_payload_packing,
            )
        )(cloud)
        return jnp.sum(r.cloud.points) + jnp.sum(r.num_voxels).astype(jnp.float32)

    t = marg_cloud(vox_scal, vcloud)
    log(f"full voxel_downsample: {t*1e3:.2f} ms/batch (was 16.18)")

    def pipe_scal(cloud, k):
        r = jax.vmap(lambda cc, kk: process_scan(cc, kk, cfg))(cloud, k)
        return (
            jnp.sum(r.grid.data.astype(jnp.float32))
            + jnp.sum(r.obstacle_cloud.points)
            + jnp.sum(r.stats.num_clusters.astype(jnp.float32))
        )

    t = marg_cloud(pipe_scal, clouds, with_keys=True)
    log(
        f"full process_scan: {t*1e3:.2f} ms/batch = {t/B*1e3:.3f} ms/scan "
        f"({B/t:.1f} scans/s)"
    )


if __name__ == "__main__":
    main()
