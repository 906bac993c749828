"""Round-3 perf experiments, part 42: dissect the fullscale compact+cluster
stage (9.1 ms/window, the joint-largest wall in tpu_experiments50's table).

Questions:
  1. How does p5's 9.1 ms split between `compact` (262144 -> 16384) and
     `euclidean_cluster` (C=16384, band_window=4096)?
  2. How many sweeps does the while loop run at fullscale, and what does
     each sweep cost — banded Pallas sweep vs the serialized 16k
     scatter-min hook (C=16384 > ONEHOT_SEGMENT_MAX, so the one-hot
     segment hook is off) vs the frontier cumsum?

Protocol: fetch the REAL compacted non-plane cloud once (prefix through
compact), then time chained 4-vs-1 marginals of cluster variants on it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
from pointcloud_obstacle_processing_tpu.ops import cluster as cl
from pointcloud_obstacle_processing_tpu.ops.compaction import compact
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = REFERENCE_FULLSCALE_CONFIG
CACHE = "/tmp/fullscale_comp_cloud.npz"


def build_window():
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
    return Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))


def get_comp_cloud():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["pts"], z["valid"]
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def to_comp(cloud):
        seed = crop_and_seed(cloud, cfg)
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
        seg = segment_planes(outl.cloud, key, cfg)
        comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
        return comp.cloud.points, comp.cloud.valid

    cloud = build_window()
    pts, valid = to_comp(cloud)
    pts = np.asarray(pts)
    valid = np.asarray(valid)
    np.savez(CACHE, pts=pts, valid=valid)
    return pts, valid


def chained_cloud(fn, m):
    def run(pts, valid):
        def body(carry, _):
            return fn(pts + 0.0 * carry, valid), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def time_marginal(f1, f4, args, rounds=3):
    outs = []
    for _ in range(rounds):
        ts1, ts4 = [], []
        for _ in range(2):
            t0 = time.perf_counter(); np.asarray(f1(*args))
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f4(*args))
            ts4.append(time.perf_counter() - t0)
        outs.append((min(ts4) - min(ts1)) / 3.0)
    return sorted(outs)[1]


def scalarize(x):
    return jnp.sum(jnp.asarray(x).astype(jnp.float32))


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    pts_np, valid_np = get_comp_cloud()
    print(f"comp cloud: {valid_np.sum()} valid of {len(valid_np)}", flush=True)
    pts = jnp.asarray(pts_np)
    valid = jnp.asarray(valid_np)

    tol2 = float(cfg.euc_cluster_tolerance) ** 2
    n = len(valid_np)
    window = cfg.cluster_band_window

    # -- sweep count at fullscale (inline copy of euclidean_cluster's loop)
    def count_sweeps(p_in, v_in):
        denom = jnp.maximum(jnp.sum(v_in.astype(jnp.float32)), 1.0)
        center = jnp.sum(jnp.where(v_in[:, None], p_in, 0.0), axis=0) / denom
        p = jnp.where(v_in[:, None], p_in - center, 0.0)
        idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        prev = jnp.concatenate([p[:1], p[:-1]], axis=0)
        gap2 = jnp.sum((p - prev) * (p - prev), axis=-1)
        prev_valid = jnp.concatenate([jnp.zeros((1,), bool), v_in[:-1]])
        chain = v_in & prev_valid & (gap2 <= tol2 * (1.0 - 1e-6))
        head = v_in & ~chain
        run_head = jnp.where(head, idx, -1)
        d = 1
        while d < n:
            run_head = jnp.maximum(
                run_head,
                jnp.concatenate([jnp.full((d,), -1, run_head.dtype), run_head[:-d]]),
            )
            d *= 2
        labels0 = jnp.where(v_in, run_head, idx)
        starts, _ = cl._band_starts(p, v_in, 128, window, cfg.euc_cluster_tolerance)
        band = (128, window, starts)

        def fl(changed_vec):
            cs = jnp.cumsum(changed_vec.astype(jnp.int32))
            hi = cs[starts + (window - 1)]
            lo = jnp.where(starts > 0, cs[jnp.maximum(starts - 1, 0)], 0)
            return (hi - lo) > 0

        def cond(state):
            labels, changed, it = state
            return jnp.any(changed) & (it < cfg.cluster_max_iters)

        def body(state):
            labels, changed, it = state
            nbr = cl._neighbor_min_sweep(
                p, v_in, labels, tol2, 512, band=band, tile_live=fl(changed)
            )
            new = labels.at[labels].min(nbr)
            new = jnp.minimum(new, nbr)
            return (new, new != labels, it + 1)

        labels, _, it = lax.while_loop(
            cond, body, (labels0, jnp.ones((n,), bool), jnp.int32(0))
        )
        return it, scalarize(labels)

    it, chk = jax.jit(count_sweeps)(pts, valid)
    print(f"fullscale sweeps to converge: {int(it)}  (labels chk {float(chk):.3e})",
          flush=True)

    # -- shared preamble for fixed-k variants -------------------------------
    def preamble(p_in, v_in):
        denom = jnp.maximum(jnp.sum(v_in.astype(jnp.float32)), 1.0)
        center = jnp.sum(jnp.where(v_in[:, None], p_in, 0.0), axis=0) / denom
        p = jnp.where(v_in[:, None], p_in - center, 0.0)
        idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        labels0 = jnp.where(v_in, jnp.minimum(idx, idx), idx)
        starts, _ = cl._band_starts(p, v_in, 128, window, cfg.euc_cluster_tolerance)
        return p, labels0, starts

    def fixed_k(k, do_sweep, do_hook, do_frontier):
        def run(p_in, v_in):
            p, labels0, starts = preamble(p_in, v_in)
            band = (128, window, starts)

            def fl(changed_vec):
                cs = jnp.cumsum(changed_vec.astype(jnp.int32))
                hi = cs[starts + (window - 1)]
                lo = jnp.where(starts > 0, cs[jnp.maximum(starts - 1, 0)], 0)
                return (hi - lo) > 0

            def body(state, _):
                labels, changed = state
                tl = fl(changed) if do_frontier else None
                if do_sweep:
                    nbr = cl._neighbor_min_sweep(
                        p, v_in, labels, tol2, 512, band=band, tile_live=tl
                    )
                else:
                    nbr = labels
                if do_hook:
                    new = labels.at[labels].min(nbr)
                    new = jnp.minimum(new, nbr)
                else:
                    new = jnp.minimum(labels, nbr)
                return (new, new != labels), None

            (labels, _), _ = lax.scan(
                body, (labels0, jnp.ones((n,), bool)), None, length=k
            )
            return scalarize(labels)

        return run

    variants = {
        "full_cluster": lambda p_in, v_in: scalarize(
            cl.euclidean_cluster(
                Cloud(points=p_in, valid=v_in), cfg.euc_cluster_tolerance,
                cfg.euc_min_cluster_size, cfg.euc_max_cluster_size,
                cfg.max_clusters, cfg.cluster_max_iters,
                band_window=window,
            ).labels
        ),
        "k8_sweep_only": fixed_k(8, True, False, False),
        "k8_hook_only": fixed_k(8, False, True, False),
        "k8_sweep_hook": fixed_k(8, True, True, False),
        "k8_all_frontier": fixed_k(8, True, True, True),
        "k16_all_frontier": fixed_k(16, True, True, True),
        "k24_all_frontier": fixed_k(24, True, True, True),
    }
    for name, fn in variants.items():
        f1 = chained_cloud(fn, 1)
        f4 = chained_cloud(fn, 4)
        v = float(np.asarray(f1(pts, valid)))
        np.asarray(f4(pts, valid))
        m = time_marginal(f1, f4, (pts, valid))
        print(f"{name:18s} {m*1e3:7.2f} ms/window  (chk {v:.4e})", flush=True)


if __name__ == "__main__":
    main()
