"""CPU probe: fullscale cluster-stage x-envelope window spans.

Runs the pipeline on CPU up to the compacted non-plane cloud (the cluster
stage's input) on the bench's fullscale window, then reports the per-tile
true span ``hi - aligned_start`` that ``_band_starts`` would need to
cover.  The static ``cluster_band_window`` preset must exceed the worst
tile's span (else ``cluster_band_overflow``); if the measured worst span
is far below the current 8192, the preset can shrink (sweep work scales
linearly with the window).
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG
from pointcloud_obstacle_processing_tpu.ops.compaction import compact
from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

cfg = REFERENCE_FULLSCALE_CONFIG
bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))


def main():
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
    key = jax.random.PRNGKey(0)

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
        return comp.cloud, comp.count

    comp_cloud, count = to_compacted(cloud, key)
    pts = np.asarray(comp_cloud.points)
    valid = np.asarray(comp_cloud.valid)
    n = len(valid)
    print(f"compacted non-plane points: {int(count)} of capacity {n}")

    # replicate _band_starts' envelope math (incl. centroid parking) in NumPy
    denom = max(valid.sum(), 1)
    center = np.where(valid[:, None], pts, 0.0).sum(0) / denom
    x = np.where(valid, pts[:, 0] - center[0], np.nan)
    tol = cfg.euc_cluster_tolerance
    tile = 128
    tiles = n // tile
    x_hi = np.where(valid, x, -np.inf)
    x_lo = np.where(valid, x, np.inf)
    runmax = np.maximum.accumulate(x_hi)
    runmin_r = np.minimum.accumulate(x_lo[::-1])[::-1]
    xt = x.reshape(tiles, tile)
    vt = valid.reshape(tiles, tile)
    tmin = np.where(vt, xt, np.inf).min(1)
    tmax = np.where(vt, xt, -np.inf).max(1)
    lo = (runmax[None, :] < (tmin[:, None] - tol)).sum(1)
    hi = n - (runmin_r[None, :] > (tmax[:, None] + tol)).sum(1)
    start = np.clip(lo, 0, None) // 128 * 128
    span = hi - start
    live = vt.any(1)
    span_live = span[live]
    print(
        f"live tiles: {live.sum()}/{tiles}; span max {span_live.max()}, "
        f"p99 {np.percentile(span_live, 99):.0f}, "
        f"p90 {np.percentile(span_live, 90):.0f}, "
        f"median {np.median(span_live):.0f}"
    )
    for w in (2048, 3072, 4096, 6144, 8192):
        print(f"  window {w}: overflow tiles = {(span_live > w).sum()}")


if __name__ == "__main__":
    main()
