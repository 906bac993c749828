"""Round-3 perf experiments, part 59: is the FULLSCALE outlier stage
HBM-bound on the d2-plane materialization?

The banded stage computes per query tile a [16, nc, T] d2-plane tensor in
XLA (bitwise-critical arithmetic) and hands it to the Pallas sortnet
kernel — an opaque boundary that forces an HBM round trip (~14.3 MB/tile
at the fullscale W=3584, T=1024; ~161 live tiles => ~2.3 GB written +
read per window, ~5.6 ms at 819 GB/s if not overlapped).  At the FLAGSHIP
shape the fused-distance kernel measured nothing (tpu_experiments27: the
round trip was hidden behind VPU compute), but fullscale windows are 2.5x
wider per query.  Dissection, all at REFERENCE_FULLSCALE_CONFIG on the
authentic window (chained 3-vs-1 marginals):

(a) full stage (Pallas sortnet selection)           — baseline
(b) selection -> jnp.min over planes, NO barrier    — XLA may fuse d2
    production into the reduce: distances-without-materialization floor
(c) selection -> barrier(d2p) then jnp.min          — forced round trip
(a)-(c) ~ selection cost; (c)-(b) ~ the HBM round-trip cost.  If
(c)-(b) is milliseconds, a fused-distance kernel (with FMA-contraction
defeated via scratch stores for bit-parity) is the next lever.
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
    from pointcloud_obstacle_processing_tpu.ops import outliers as outliers_mod
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
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

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    k = cfg.statistical_outlier_mean_k

    @jax.jit
    def voxelize(cloud):
        seed = crop_and_seed(cloud, cfg)
        return voxel_downsample(
            seed.cloud, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
            cfg.voxel_sum_precision, cfg.voxel_binning, cfg.voxel_order,
            cfg.voxel_payload_packing,
        )

    vox = voxelize(window)
    vc = jax.block_until_ready(vox.cloud)
    log(f"voxels: {int(vox.num_voxels)}")

    orig_net = outliers_mod._sortnet_mean_pallas

    def min_no_barrier(d2p, kk, big):
        return jnp.min(d2p, axis=(0, 1))

    def min_with_barrier(d2p, kk, big):
        d2p = lax.optimization_barrier(d2p)
        return jnp.min(d2p, axis=(0, 1))

    variants = {
        "a_full_pallas_sortnet": orig_net,
        "b_min_fused": min_no_barrier,
        "c_min_barrier": min_with_barrier,
    }

    def make_fns(net):
        outliers_mod._sortnet_mean_pallas = net

        def run(cloud):
            d = outliers_mod.knn_mean_distances(
                cloud, k, row_tile=cfg.knn_row_tile, backend="banded",
                band=cfg.knn_band, skip_dead_tiles=cfg.knn_skip_dead_tiles,
            )
            return jnp.sum(d)

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

        f1, f4 = make(1), make(4)
        np.asarray(f1(vc))
        np.asarray(f4(vc))
        outliers_mod._sortnet_mean_pallas = orig_net
        return f1, f4

    fns = {}
    for name, net in variants.items():
        try:
            fns[name] = make_fns(net)
        except Exception as e:
            log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}")

    for rnd in range(3):
        for name, (f1, f4) in fns.items():
            t1, t4 = timed(f1, vc), timed(f4, vc)
            log(
                f"[round {rnd} {name}] outlier marginal: "
                f"{(t4 - t1) / 3 * 1e3:.2f} ms/window (t1 {t1*1e3:.1f})"
            )


if __name__ == "__main__":
    main()
