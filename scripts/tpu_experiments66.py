"""Round-4 perf experiments, part 66: price the SP (point-sharded) path's
per-shard and replicated terms on ONE chip, to ground the v5e-8
fullscale-window projection (VERDICT r3 next #1 'done' criterion).

Multi-chip hardware is not available (one tunneled v5e chip), but every
term of the SP program is a pure function measurable single-chip:

  (local)   ``voxel_partials`` on one shard's 262144-point slice — the
            shard-LOCAL stage-1+2 cost (crop happens inside the SP body
            too but is priced with the histogram, known small);
  (merge)   ``merge_voxel_partials`` + ``finalize_voxels`` on the
            8-shard GATHERED tables (8 x 262144 rows) — the REPLICATED
            dense-bin scatter merge every shard runs after the
            all_gather.  The scatter prices at ~20 cyc/row on XLA
            (CLAUDE.md), so this is the suspected wall;
  (mergesort) a candidate sort-based merge: pack the gathered bounded
            keys to int32, ONE stable 1-key sort carrying (sx, sy, sz,
            cnt) payloads, then the run-reduce machinery
            (sorted_run_reduce sums 3 channels + row count, so counts
            ride a second reduce sharing the same sorted buffer) — if
            this undercuts (merge), the SP merge should switch to it
            for large tables;
  (knn/8, sweep/8) — per-shard post-voxel costs are tiles/8 of the
            measured single-chip stages (bitwise-identical per-tile
            programs; see PERFORMANCE.md round-4) — not re-measured.

Chained 1-vs-3 marginals, interleaved rounds.
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
        finalize_voxels,
        merge_voxel_partials,
        voxel_partials,
    )
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))))
    log("probe ok")

    cfg = REFERENCE_FULLSCALE_CONFIG
    S = 8  # shards
    N = cfg.max_points
    NS = N // S
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    fspec = SceneSpec(n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000)
    base = make_scene(seed=100, spec=fspec).points
    jit_rng = np.random.default_rng(7)
    parts = [
        base + jit_rng.normal(0, 0.003, base.shape).astype(np.float32)
        for _ in range(S)
    ]
    fpts = np.concatenate(parts)[:N]
    fcloud_np = np.zeros((N, 3), np.float32)
    fcloud_np[: len(fpts)] = fpts
    fvalid = np.zeros(N, bool)
    fvalid[: len(fpts)] = True

    shard_pts = jnp.asarray(fcloud_np.reshape(S, NS, 3))
    shard_valid = jnp.asarray(fvalid.reshape(S, NS))

    def shard_partials(pts, valid):
        in_box = valid & crop_box_mask(pts, cfg)
        return voxel_partials(
            Cloud(points=pts, valid=in_box),
            cfg.downsample_leaf_size,
            cfg.max_voxels,
            bounds,
            cfg.voxel_sum_precision,
            cfg.voxel_binning,
            cfg.voxel_order,
            cfg.voxel_payload_packing,
        )

    # ---- (local): one shard's voxel_partials ------------------------------
    def v_local(pts, valid):
        p = shard_partials(pts, valid)
        return (
            jnp.sum(p.sums) + jnp.sum(p.counts)
            + jnp.sum(p.keys, dtype=jnp.int64).astype(jnp.float32)
        )

    def chain_cloud(fn, m):
        def run(p, v):
            def body(carry, _):
                return fn(p + 0.0 * carry, v), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    # ---- build the gathered tables once (host-side via device vmap) -------
    gp = jax.jit(jax.vmap(shard_partials))(shard_pts, shard_valid)
    gathered = VoxelPartials(
        keys=gp.keys.reshape(S * cfg.max_voxels, 3),
        sums=gp.sums.reshape(S * cfg.max_voxels, 3),
        counts=gp.counts.reshape(S * cfg.max_voxels),
        num_voxels=gp.num_voxels[0],
        overflow=gp.overflow[0],
    )
    gathered = jax.tree_util.tree_map(jnp.asarray, gathered)
    n_real = int(np.asarray(jnp.sum((gathered.counts > 0).astype(jnp.int32))))
    log(f"gathered tables: {S} x {cfg.max_voxels} rows, {n_real} real")

    # ---- (merge): merge_voxel_partials + finalize as shipped --------------
    # NOTE: since round 4 the shipped path for >= 2^19-row tables is the
    # packed-sort single-pass merge; to re-price the old dense-bin scatter
    # explicitly, raise voxel_mod._SORT_MERGE_MIN_ROWS before building the
    # chain (the 93.8 ms dense-bin datum was measured pre-switch).
    def v_merge(keys, sums, counts):
        m = merge_voxel_partials(
            VoxelPartials(
                keys=keys, sums=sums, counts=counts,
                num_voxels=gathered.num_voxels, overflow=gathered.overflow,
            ),
            cfg.max_voxels,
            bounds=bounds,
            leaf_size=cfg.downsample_leaf_size,
        )
        vox = finalize_voxels(m)
        return jnp.sum(vox.cloud.points) + vox.num_voxels.astype(jnp.float32)

    # ---- (mergesort): packed 1-key sort + run-reduce candidate ------------
    import math

    leaf = cfg.downsample_leaf_size
    imin = [math.floor(v / leaf) for v in bounds[0]]
    imax = [math.floor(v / leaf) for v in bounds[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    K = dims[0] * dims[1] * dims[2]

    from pointcloud_obstacle_processing_tpu.ops.pallas_runreduce import (
        sorted_run_reduce,
    )

    def v_mergesort(keys, sums, counts):
        real = counts > 0.0
        kx = jnp.clip(keys[:, 0] - imin[0], 0, dims[0] - 1)
        ky = jnp.clip(keys[:, 1] - imin[1], 0, dims[1] - 1)
        kz = jnp.clip(keys[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(real, (kx * dims[1] + ky) * dims[2] + kz, K)
        sk, sx, sy, sz, scnt = lax.sort(
            (packed, sums[:, 0], sums[:, 1], sums[:, 2], counts),
            num_keys=1, is_stable=False,
        )
        # two run-reduces share the one sorted buffer: (sx, sy, sz) and
        # (cnt, cnt, cnt) — the second's count channel is redundant but
        # the kernel sums 3 channels + row count per run
        vals1, num = sorted_run_reduce(sk, (sx, sy, sz), K, cfg.max_voxels)
        vals2, _ = sorted_run_reduce(sk, (scnt, scnt, scnt), K, cfg.max_voxels)
        return jnp.sum(vals1) + jnp.sum(vals2[:, 1]) + num.astype(jnp.float32)

    def v_mergesort1(keys, sums, counts):
        """Single-pass variant: counts ride the run-reduce's count channel
        as a 4th value buffer (the shipped merge after round 4)."""
        real = counts > 0.0
        kx = jnp.clip(keys[:, 0] - imin[0], 0, dims[0] - 1)
        ky = jnp.clip(keys[:, 1] - imin[1], 0, dims[1] - 1)
        kz = jnp.clip(keys[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(real, (kx * dims[1] + ky) * dims[2] + kz, K)
        sk, sx, sy, sz, scnt = lax.sort(
            (packed, sums[:, 0], sums[:, 1], sums[:, 2], counts),
            num_keys=1, is_stable=False,
        )
        vals, num = sorted_run_reduce(sk, (sx, sy, sz, scnt), K, cfg.max_voxels)
        return jnp.sum(vals) + num.astype(jnp.float32)

    def chain_tab(fn, m):
        def run(keys, sums, counts):
            def body(carry, _):
                return fn(keys, sums + 0.0 * carry, counts), None

            out, _ = lax.scan(body, jnp.float32(0), None, length=m)
            return out

        return jax.jit(run)

    progs = {
        "local_partials": (
            chain_cloud(v_local, 1),
            chain_cloud(v_local, 3),
            (shard_pts[0], shard_valid[0]),
        ),
        "merge_shipped": (  # merge_voxel_partials + finalize, current path
            chain_tab(v_merge, 1),
            chain_tab(v_merge, 3),
            (gathered.keys, gathered.sums, gathered.counts),
        ),
        "merge_sortrr": (
            chain_tab(v_mergesort, 1),
            chain_tab(v_mergesort, 3),
            (gathered.keys, gathered.sums, gathered.counts),
        ),
        "merge_sortrr1": (
            chain_tab(v_mergesort1, 1),
            chain_tab(v_mergesort1, 3),
            (gathered.keys, gathered.sums, gathered.counts),
        ),
    }
    for r in range(3):
        log(f"--- round {r}")
        for name, (c1, c3, args) in progs.items():
            t1 = timed(c1, *args, iters=3)
            t3 = timed(c3, *args, iters=3)
            log(f"{name:14s}: marginal {(t3 - t1) / 2 * 1e3:7.2f} ms "
                f"(1x {t1*1e3:6.1f}, 3x {t3*1e3:6.1f})")


if __name__ == "__main__":
    main()
