"""Round-3 perf experiments, part 9: voxel-stage decomposition at flagship.

After the RANSAC sort swap the bench sits at 621 scans/s with voxel at
0.82 ms/scan (67% of device time).  Decompose `_sort_segment_partials`
(sort -> segscan -> run-end table build -> Pallas compaction -> key
unpack/finalize) into cumulative prefixes at the exact flagship shape
(batch 32 x 131072 rows, capacity 24576) to find the next lever.
Each prefix reduces to a scalar and is timed by chained marginals.
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
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # probe
    log("probe ok", dev.platform)

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
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vcloud = seeded.cloud  # the voxel stage's true input

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    capacity = cfg.max_voxels

    # --- re-derive the _sort_segment_partials internals as prefixes --------
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec

    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]
    log(f"flagship lattice dims={dims} K={K} capacity={capacity}")

    def prep(cloud):
        pts = cloud.points
        valid = cloud.valid & jnp.all(jnp.isfinite(pts), axis=-1)
        ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner0 = (
            jnp.stack([ix + imin[0], iy + imin[1], iz + imin[2]], axis=0).astype(
                jnp.float32
            )
            * jnp.float32(leaf)
        )
        off0 = jnp.where(valid[None, :], pts.T - corner0, 0.0)
        return packed, off0

    def p_prep(cloud):
        packed, off0 = prep(cloud)
        return jnp.sum(packed) + jnp.sum(off0)

    def p_sort(cloud):
        packed, off0 = prep(cloud)
        skey, sox, soy, soz = lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )
        return jnp.sum(skey) + jnp.sum(sox) + jnp.sum(soy) + jnp.sum(soz)

    def scan_part(cloud):
        from pointcloud_obstacle_processing_tpu.ops.segscan import (
            segmented_inclusive_scan,
        )

        packed, off0 = prep(cloud)
        skey, sox, soy, soz = lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )
        svalid = skey < K
        off = jnp.stack([sox, soy, soz], axis=0)
        heads = svalid & (
            skey != jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
        )
        vals = jnp.concatenate([off, svalid.astype(jnp.float32)[None, :]], axis=0)
        scans = segmented_inclusive_scan(vals, heads)
        return skey, svalid, heads, scans

    def p_scan(cloud):
        _, _, _, scans = scan_part(cloud)
        return jnp.sum(scans)

    def p_table(cloud):
        skey, svalid, heads, scans = scan_part(cloud)
        next_head = jnp.concatenate([heads[1:], jnp.ones((1,), bool)])
        next_invalid = jnp.concatenate([~svalid[1:], jnp.ones((1,), bool)])
        is_end = svalid & (next_head | next_invalid)
        cnt_end = jnp.where(is_end, scans[3], 0.0)
        table = jnp.concatenate(
            [skey.astype(jnp.float32)[None, :], scans[:3], cnt_end[None, :]], axis=0
        )
        return jnp.sum(table)

    def p_compact(cloud):
        from pointcloud_obstacle_processing_tpu.ops.pallas_compaction import (
            compact_and_gather_exact,
        )

        skey, svalid, heads, scans = scan_part(cloud)
        next_head = jnp.concatenate([heads[1:], jnp.ones((1,), bool)])
        next_invalid = jnp.concatenate([~svalid[1:], jnp.ones((1,), bool)])
        is_end = svalid & (next_head | next_invalid)
        cnt_end = jnp.where(is_end, scans[3], 0.0)
        table = jnp.concatenate(
            [skey.astype(jnp.float32)[None, :], scans[:3], cnt_end[None, :]], axis=0
        )
        n = skey.shape[0]
        occ2d = (cnt_end > 0.0).reshape(n // 128, 128)
        _, num, slot_vals = compact_and_gather_exact(table, occ2d, capacity)
        return jnp.sum(slot_vals) + num.astype(jnp.float32)

    def p_full(cloud):
        from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample

        r = voxel_downsample(cloud, leaf, capacity, bounds)
        return jnp.sum(r.cloud.points) + r.num_voxels.astype(jnp.float32)

    def chained(fn, m):
        def run(c):
            def body(carry, _):
                cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
                return jax.vmap(fn)(cc).sum().astype(jnp.float32), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    def marg(fn):
        fa, fb = chained(fn, 1), chained(fn, 4)
        ta, tb = timed(fa, vcloud), timed(fb, vcloud)
        if tb <= ta:
            ta, tb = timed(fa, vcloud), timed(fb, vcloud)
        return (tb - ta) / 3.0

    for name, fn in [
        ("prep (keys+offsets)", p_prep),
        ("+ sort", p_sort),
        ("+ segscan", p_scan),
        ("+ run-end table", p_table),
        ("+ compaction", p_compact),
        ("full voxel_downsample", p_full),
    ]:
        t = marg(fn)
        log(f"{name:26s}: {t*1e3:7.2f} ms/batch ({t/B*1e3:.3f} ms/scan)")


if __name__ == "__main__":
    main()
