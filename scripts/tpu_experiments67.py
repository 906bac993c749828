"""Round-5 perf experiments, part 67: packed-key vs triple-key gathered
merge A/B (VERDICT r4 next #3 'done' criterion).

Round 5 slims the SP replicated-merge gather: shards pack their
(ix, iy, iz) keys into one int32 BEFORE the all_gather (20 B/row vs 28,
~30% less ICI traffic) and the merge enters
``merge_voxel_partials_packed`` directly.  The collective saving cannot
be measured single-chip, but the MERGE side can: the packed entry point
skips the in-merge key pack (one [2M, 3] int32 read + clip/mul/add
chain), so the single-chip merge cost must be equal-or-better than the
triple form — this script prices both on the authentic fullscale
gathered tables (8 x 262144 rows), interleaved chained 1-vs-3 marginals,
three rounds (the tpu_experiments66 protocol).

Also verifies the two forms produce IDENTICAL tables (packing commutes
with gathering) before timing.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


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
    from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.filters import crop_box_mask
    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        VoxelPartials,
        _pack_keys,
        _pack_spec,
        finalize_voxels,
        merge_voxel_partials,
        merge_voxel_partials_packed,
        voxel_partials,
    )
    
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    cfg = REFERENCE_FULLSCALE_CONFIG
    S = 8
    N = cfg.max_points
    NS = N // S
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    spec = _pack_spec(bounds, cfg.downsample_leaf_size)

    from pointcloud_obstacle_processing_tpu.utils.scene import (
        make_fullscale_window,
    )

    fcloud_np, fvalid = make_fullscale_window(N, n_obs=S)
    shard_pts = jnp.asarray(fcloud_np.reshape(S, NS, 3))
    shard_valid = jnp.asarray(fvalid.reshape(S, NS))

    def shard_partials(pts, valid):
        in_box = valid & crop_box_mask(pts, cfg)
        return voxel_partials(
            Cloud(points=pts, valid=in_box),
            cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )

    gp = jax.jit(jax.vmap(shard_partials))(shard_pts, shard_valid)
    keys = jnp.asarray(gp.keys.reshape(S * cfg.max_voxels, 3))
    sums = jnp.asarray(gp.sums.reshape(S * cfg.max_voxels, 3))
    counts = jnp.asarray(gp.counts.reshape(S * cfg.max_voxels))
    packed = jax.jit(lambda k, c: _pack_keys(k, c, spec))(keys, counts)
    packed = jnp.asarray(packed)
    n_real = int(np.asarray(jnp.sum((counts > 0).astype(jnp.int32))))
    log(f"gathered tables: {S} x {cfg.max_voxels} rows, {n_real} real")

    # ---- equality first: packed-entry merge == triple-entry merge ---------
    mt = jax.jit(
        lambda k, s, c: merge_voxel_partials(
            VoxelPartials(keys=k, sums=s, counts=c,
                          num_voxels=gp.num_voxels[0], overflow=gp.overflow[0]),
            cfg.max_voxels, bounds=bounds, leaf_size=cfg.downsample_leaf_size,
        )
    )(keys, sums, counts)
    mp = jax.jit(
        lambda p, s, c: merge_voxel_partials_packed(
            p, s, c, cfg.max_voxels, spec, cfg.downsample_leaf_size
        )
    )(packed, sums, counts)
    for name, a, b in (
        ("keys", mt.keys, mp.keys), ("sums", mt.sums, mp.sums),
        ("counts", mt.counts, mp.counts),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    assert int(mt.num_voxels) == int(mp.num_voxels)
    log(f"equality OK: {int(mt.num_voxels)} voxels, tables bitwise equal")

    # ---- chained 1-vs-3 marginals, interleaved ----------------------------
    def v_triple(k, s, c):
        m = merge_voxel_partials(
            VoxelPartials(keys=k, sums=s, counts=c,
                          num_voxels=gp.num_voxels[0], overflow=gp.overflow[0]),
            cfg.max_voxels, bounds=bounds, leaf_size=cfg.downsample_leaf_size,
        )
        vox = finalize_voxels(m)
        return jnp.sum(vox.cloud.points) + vox.num_voxels.astype(jnp.float32)

    def v_packed(p, s, c):
        m = merge_voxel_partials_packed(
            p, s, c, cfg.max_voxels, spec, cfg.downsample_leaf_size
        )
        vox = finalize_voxels(m)
        return jnp.sum(vox.cloud.points) + vox.num_voxels.astype(jnp.float32)

    def chain(fn, m):
        # the float perturbation rides the f32 sums (CLAUDE.md: an int
        # perturbation is algebraically folded and the body hoisted)
        def run(a, s, c):
            def body(carry, _):
                return fn(a, s + 0.0 * carry, c), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    ct1, ct3 = chain(v_triple, 1), chain(v_triple, 3)
    cp1, cp3 = chain(v_packed, 1), chain(v_packed, 3)

    for rnd in range(3):
        t1 = timed(ct1, keys, sums, counts)
        t3 = timed(ct3, keys, sums, counts)
        p1 = timed(cp1, packed, sums, counts)
        p3 = timed(cp3, packed, sums, counts)
        log(
            f"round {rnd}: triple merge {max(t3-t1,0)/2*1e3:6.2f} ms | "
            f"packed merge {max(p3-p1,0)/2*1e3:6.2f} ms"
        )


if __name__ == "__main__":
    main()
