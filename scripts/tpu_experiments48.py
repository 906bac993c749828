"""Round-3 perf experiments, part 39: fullscale cluster-stage ablation.

The fullscale cluster stage costs ~7.3-8.0 ms/window after the
valid-tile skip + 4096 band window.  The banded sweep's raw VPU work is
tiny (56 live tiles x 128 rows x 4096 cols x ~10 ops ~ 0.3 GOP ~ 0.15 ms
per sweep at the measured ~2 TOP/s), so something else dominates: the
per-sweep scatter-min hook (~20 cycles/elem at C=16384), the final
lax.top_k over [16384] (may lower to a full sort), the root_slot
scatter + label gather, or the sweep count itself.

Ablation by chained marginals (same protocol as profile_prefix.py), all
on the REAL compacted fullscale cluster input:

  A: chain-seed + while-loop sweeps only (labels fixpoint)
  B: A + size histogram (scatter)        -> marginal = size scatter
  C: B + top_k/root_slot/point_cluster   -> marginal = slot machinery
  D: the shipped euclidean_cluster       -> sanity (== C)
Also prints the converged sweep count.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
from pointcloud_obstacle_processing_tpu.ops import cluster as cm
from pointcloud_obstacle_processing_tpu.ops.compaction import compact
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = REFERENCE_FULLSCALE_CONFIG
bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))


def build_cluster_input():
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
    cloud = Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))

    @jax.jit
    def to_compacted(c, k):
        seed = crop_and_seed(c, cfg)
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )
        outl = remove_statistical_outliers(
            vox.cloud, cfg.statistical_outlier_mean_k,
            cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            band=cfg.knn_band, row_tile=cfg.knn_row_tile,
            skip_dead_tiles=cfg.knn_skip_dead_tiles,
        )
        seg = segment_planes(outl.cloud, k, cfg)
        comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
        return comp.cloud

    return to_compacted(cloud, jax.random.PRNGKey(0))


def make_stage(k_stage):
    """k_stage: 1=sweeps only, 2=+sizes, 3=full slot machinery."""
    tolerance = cfg.euc_cluster_tolerance
    min_size, max_size = cfg.euc_min_cluster_size, cfg.euc_max_cluster_size
    max_clusters, max_iters = cfg.max_clusters, cfg.cluster_max_iters
    band_window = cfg.cluster_band_window

    def run(cloud):
        pts, valid, n = cloud.points, cloud.valid, cloud.capacity
        denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
        p = jnp.where(valid[:, None], pts - center, 0.0)
        tol2 = float(tolerance) ** 2
        idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

        prev = jnp.concatenate([p[:1], p[:-1]], axis=0)
        gap2 = jnp.sum((p - prev) * (p - prev), axis=-1)
        prev_valid = jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
        chain = valid & prev_valid & (gap2 <= tol2 * (1.0 - 1e-6))
        head = valid & ~chain
        run_head = jnp.where(head, idx, -1)
        d = 1
        while d < n:
            run_head = jnp.maximum(
                run_head,
                jnp.concatenate(
                    [jnp.full((d,), -1, run_head.dtype), run_head[:-d]]
                ),
            )
            d *= 2
        labels0 = jnp.where(valid, run_head, idx)

        btile = 128
        starts, _ = cm._band_starts(p, valid, btile, band_window, tolerance)
        band = (btile, band_window, starts)

        def cond(state):
            labels, changed, it = state
            return changed & (it < max_iters)

        def body(state):
            labels, _, it = state
            nbr_min = cm._neighbor_min_sweep(
                p, valid, labels, tol2, 512, band=band
            )
            new = labels.at[labels].min(nbr_min)
            new = jnp.minimum(new, nbr_min)
            return (new, jnp.any(new != labels), it + 1)

        labels, _, iters = lax.while_loop(
            cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
        )
        if k_stage == 1:
            return jnp.sum(labels).astype(jnp.float32), iters

        sizes_by_root = jnp.zeros((n,), jnp.int32).at[
            jnp.where(valid, labels, n)
        ].add(1, mode="drop")
        if k_stage == 2:
            return (jnp.sum(labels) + jnp.sum(sizes_by_root)).astype(
                jnp.float32
            ), iters

        is_root = valid & (labels == idx)
        gate = is_root & (sizes_by_root >= min_size) & (sizes_by_root <= max_size)
        num_total = jnp.sum(gate.astype(jnp.int32))
        gated_size = jnp.where(gate, sizes_by_root, jnp.int32(-1))
        _, top_roots = lax.top_k(gated_size, max_clusters)
        slot_valid = (
            lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0]
            < jnp.minimum(num_total, max_clusters)
        )
        root_slot = jnp.full((n,), -1, jnp.int32)
        root_slot = root_slot.at[jnp.where(slot_valid, top_roots, n)].set(
            lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0],
            mode="drop",
        )
        point_cluster = jnp.where(valid, root_slot[labels], -1)
        return (
            jnp.sum(point_cluster) + jnp.sum(labels)
        ).astype(jnp.float32), iters

    return run


def chained(fn, m):
    def run(c):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            s, it = fn(cc)
            return s, it

        out, its = lax.scan(body, jnp.float32(0), None, length=m)
        return out, its[-1]

    return jax.jit(run)


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    cloud = build_cluster_input()
    print(f"cluster input: {int(np.asarray(cloud.valid).sum())} valid of "
          f"{cloud.capacity}", flush=True)

    progs = {}
    for name, ks in (("A_sweeps", 1), ("B_sizes", 2), ("C_slots", 3)):
        f1 = chained(make_stage(ks), 1)
        f4 = chained(make_stage(ks), 4)
        s, it = f1(cloud)
        np.asarray(s)
        np.asarray(f4(cloud)[0])
        progs[name] = (f1, f4)
        print(f"compiled {name}: sweeps={int(it)}", flush=True)

    # shipped function as sanity
    def shipped(c):
        out = cm.euclidean_cluster(
            c, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            band_window=cfg.cluster_band_window,
        )
        return jnp.sum(out.clusters.point_cluster).astype(jnp.float32), out.clusters.num_clusters

    fD1 = chained(shipped, 1)
    fD4 = chained(shipped, 4)
    np.asarray(fD1(cloud)[0]); np.asarray(fD4(cloud)[0])
    progs["D_shipped"] = (fD1, fD4)
    print("compiled D_shipped", flush=True)

    for rnd in range(3):
        for name, (f1, f4) in progs.items():
            ts1, ts4 = [], []
            for _ in range(2):
                t0 = time.perf_counter(); np.asarray(f1(cloud)[0])
                ts1.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f4(cloud)[0])
                ts4.append(time.perf_counter() - t0)
            marg = (min(ts4) - min(ts1)) / 3.0
            print(f"round {rnd} {name}: {marg*1e3:7.2f} ms/window", flush=True)


if __name__ == "__main__":
    main()
