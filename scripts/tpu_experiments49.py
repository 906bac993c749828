"""Round-3 perf experiments, part 40: fullscale kNN row-tile + payload packing.

Two independent A/Bs on the fullscale window (chained 3-vs-1 marginals,
interleaved rounds — the honest protocol):

1. ``knn_row_tile`` 512 (preset) vs 1024 vs 2048 on the prefix-3 program
   (crop+voxel+outlier).  Total banded work is N*(1 + 2*band/T): at
   band=1792, T=1024 scores 44% fewer window columns than 512, and each
   row's candidate window is a SUPERSET (fidelity monotone non-degrading).
   The flagship's T=768 VMEM spill does not transfer: width here is
   band-dominated, so the sortnet block grows only ~12% per T doubling.

2. ``voxel_payload_packing`` off (preset) vs on, on the prefix-2 program:
   the stable sort moves 1 key + 2 payloads instead of 1 + 3
   (quantization leaf/65536 = 0.23 um at leaf 0.015 — PARITY deviation 11).
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
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

base_cfg = REFERENCE_FULLSCALE_CONFIG


def build_window(cfg):
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


def prefix_fn(cfg, k):
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    def run(cloud):
        seed = crop_and_seed(cloud, cfg)
        vox = voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )
        if k == 2:
            return jnp.sum(vox.cloud.points) + vox.num_voxels.astype(jnp.float32)
        outl = remove_statistical_outliers(
            vox.cloud, cfg.statistical_outlier_mean_k,
            cfg.statistical_outlier_std_dev_thresh, backend=cfg.knn_backend,
            band=cfg.knn_band, row_tile=cfg.knn_row_tile,
            skip_dead_tiles=cfg.knn_skip_dead_tiles,
        )
        return jnp.sum(outl.mean_distances) + jnp.sum(
            outl.cloud.valid.astype(jnp.float32)
        )

    return run


def chained(fn, m):
    def run(c):
        def body(carry, _):
            cc = Cloud(points=c.points + 0.0 * carry, valid=c.valid)
            return fn(cc), None

        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    return jax.jit(run)


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("probe ok", flush=True)
    cloud = build_window(base_cfg)

    progs = {}
    variants = [
        ("T512", base_cfg, 3),
        ("T1024", base_cfg.replace(knn_row_tile=1024), 3),
        ("T2048", base_cfg.replace(knn_row_tile=2048), 3),
        ("pack_off", base_cfg, 2),
        ("pack_on", base_cfg.replace(voxel_payload_packing=True), 2),
    ]
    for name, cfg, k in variants:
        try:
            f1 = chained(prefix_fn(cfg, k), 1)
            f4 = chained(prefix_fn(cfg, k), 4)
            v = float(np.asarray(f1(cloud)))
            np.asarray(f4(cloud))
            progs[name] = (f1, f4)
            print(f"compiled {name}: scalar={v:.6e}", flush=True)
        except Exception as e:  # VMEM overflow etc: report, keep going
            print(f"compile FAILED {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for rnd in range(3):
        for name, (f1, f4) in progs.items():
            ts1, ts4 = [], []
            for _ in range(2):
                t0 = time.perf_counter(); np.asarray(f1(cloud))
                ts1.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f4(cloud))
                ts4.append(time.perf_counter() - t0)
            marg = (min(ts4) - min(ts1)) / 3.0
            print(f"round {rnd} {name}: {marg*1e3:7.2f} ms/window", flush=True)


if __name__ == "__main__":
    main()
