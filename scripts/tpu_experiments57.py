"""Round-3 perf experiments, part 48: fullscale kNN band knee.

REFERENCE_FULLSCALE_CONFIG ships knn_band=1792 — scaled analytically from
the flagship's validated 512 knee (leaf ratio), never fidelity-measured at
the fullscale shape.  Total banded work is N*(1 + 2*band/T): at T=1024
shrinking the band to 1280 removes ~22% of the outlier stage's window
columns.  Protocol:

1. fidelity: banded kNN means at bands 1024..3584 on the authentic
   window; the widest band is the reference (banded converges to exact
   monotonically as the window grows — every row whose true neighbor set
   the window covers produces the BITWISE-identical mean, so diffs are
   exactly 0 for covered rows).  Report perturbed-mean fraction AND
   keep-mask disagreement (the filter's actual output).
2. timing: chained 3-vs-1 prefix marginals (crop+voxel+outlier),
   interleaved A/B, for the preset band vs the knee candidate.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


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
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        knn_mean_distances,
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((128, 128))
    np.asarray(jnp.sum(x @ x))
    log("probe ok")

    cfg = REFERENCE_FULLSCALE_CONFIG

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
    window = Cloud(points=jnp.asarray(fcloud_np), valid=jnp.asarray(fvalid))
    log(f"window: {len(fpts)} points")

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))

    @jax.jit
    def voxelize(cloud):
        seed = crop_and_seed(cloud, cfg)
        return voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )

    vox = voxelize(window)
    nvox = int(vox.num_voxels)
    log(f"voxels: {nvox}")
    vc = vox.cloud

    # ---- 1. fidelity: banded means vs widest-band reference ---------------
    k = cfg.statistical_outlier_mean_k
    mult = cfg.statistical_outlier_std_dev_thresh
    # Reference = T=448 + band=3328: every row's window covers at least
    # +-3328 ranks, a strict superset of any candidate's maximum coverage
    # (band + T - 1 <= 2815 at T=1024).  T=448 is deliberately NOT a
    # 128-multiple: that routes the selection onto the XLA sortnet (no
    # VMEM scoped limit — the Pallas kernel OOMs for any band >= 2560),
    # and the XLA net is bitwise-identical to the Pallas one anyway.
    bands = (1024, 1280, 1536, 1792)

    def means_at(band, row_tile=cfg.knn_row_tile):
        f = jax.jit(
            lambda c: knn_mean_distances(
                c, k, row_tile=row_tile, backend="banded", band=band,
                skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
        )
        return np.asarray(f(vc))

    def keep_at(d, valid):
        n = max(valid.sum(), 2.0)
        mu = (d * valid).sum() / n
        var = max(((d * d * valid).sum() - n * mu * mu) / (n - 1.0), 0.0)
        thr = mu + mult * np.sqrt(var)
        return valid.astype(bool) & (d <= thr)

    valid_np = np.asarray(vc.valid)
    ref_band = 3328
    d_ref = means_at(ref_band, row_tile=448)
    keep_ref = keep_at(d_ref.astype(np.float64), valid_np.astype(np.float64))
    for band in bands:
        d = means_at(band)
        diff = d[valid_np] != d_ref[valid_np]
        keep = keep_at(d.astype(np.float64), valid_np.astype(np.float64))
        flips = int((keep != keep_ref).sum())
        log(
            f"[band={band} vs {ref_band}] perturbed means: {diff.mean():.4%} "
            f"(count {int(diff.sum())}/{int(valid_np.sum())}); "
            f"keep-mask flips: {flips}"
        )

    # ---- 2. timing: prefix-3 chained marginals, interleaved ---------------
    def prefix3(band):
        def run(cloud):
            seed = crop_and_seed(cloud, cfg)
            vx = voxel_downsample(
                seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
                cfg.voxel_payload_packing,
            )
            outl = remove_statistical_outliers(
                vx.cloud, k, mult, backend="banded", band=band,
                row_tile=cfg.knn_row_tile,
                skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
            return jnp.sum(outl.mean_distances) + jnp.sum(
                outl.cloud.valid.astype(jnp.float32)
            )

        def make(m):
            def chained(cloud):
                def body(carry, _):
                    cc = Cloud(
                        points=cloud.points + 0.0 * carry, valid=cloud.valid
                    )
                    return run(cc), None

                out, _ = lax.scan(body, jnp.float32(0), None, length=m)
                return out

            return jax.jit(chained)

        return make

    cand = (1792, 1280, 1536)
    makes = {b: prefix3(b) for b in cand}
    # warm all programs first (compile outside the timing loop)
    fns = {b: (makes[b](1), makes[b](4)) for b in cand}
    for b in cand:
        for f in fns[b]:
            np.asarray(f(window))
    for rnd in range(3):
        for b in cand:
            f1, f4 = fns[b]
            t1, t4 = timed(f1, window), timed(f4, window)
            log(
                f"[round {rnd} band={b}] prefix3 marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/window (t1 {t1*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
