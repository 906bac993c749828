"""TPU micro-experiments, round 8: banded kNN shape sweep.

Outlier removal is 1.2 ms/scan (37 ms/batch) with (row_tile=512, band=512,
approx_min_k).  approx_min_k cost is row-width-sensitive (2560 slower than
4096 measured in round 1); sweep (row_tile, band) and the selection
backend (approx vs exact two-level top_k) on the banded window.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def log(*a):
    print(*a, flush=True)


NULL = [0.0]


def timed(fn, *args, iters=5, label=""):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    log(f"  {label:<56s} {t*1e3:9.2f} ms/batch  (true ~{t*1e3-NULL[0]:8.2f})")
    return t


def main():
    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.models import FLAGSHIP_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import knn_mean_distances
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from tpu_experiments import make_inputs

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    cfg = FLAGSHIP_CONFIG
    clouds = make_inputs(cfg)
    small = jnp.ones((8, 8), jnp.float32)
    NULL[0] = timed(jax.jit(lambda s: jnp.sum(s)), small, iters=8, label="null (RPC)") * 1e3

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds,
                cfg.voxel_sum_precision,
            )
        )
    )(seeded.cloud)
    k = cfg.statistical_outlier_mean_k
    log(f"k={k}  N={cfg.max_voxels}  valid~{int(np.asarray(jnp.sum(vox.cloud.valid))/32)}")

    ref = None
    for rt, band, backend in [
        (512, 512, "banded"),      # production today
        (512, 256, "banded"),
        (256, 256, "banded"),
        (256, 512, "banded"),
        (512, 1024, "banded"),
        (1024, 512, "banded"),
        (1024, 1024, "banded"),
        (2048, 1024, "banded"),
        (2048, 512, "banded"),
        (512, 512, "banded_approx"),
        (256, 256, "banded_approx"),
        (512, 512, "approx"),      # full-width baseline
    ]:
        be = backend
        exact_sel = backend == "banded_exact"

        def f(c, rt=rt, band=band, be=be):
            def one(cc):
                return knn_mean_distances(cc, k, rt, be, band)
            return jnp.sum(jax.vmap(one)(c))

        try:
            t = timed(jax.jit(f), vox.cloud, label=f"rt={rt} band={band} {backend}")
        except Exception as e:
            log(f"  rt={rt} band={band} {backend}: FAILED {type(e).__name__}: {e}")
            continue

    # fidelity: banded settings vs exact full kNN (mean |delta|, frac changed)
    exact = jax.jit(
        lambda c: jax.vmap(lambda cc: knn_mean_distances(cc, k, 512, "exact"))(c)
    )(vox.cloud)
    exact = np.asarray(exact)
    for rt, band in [(512, 256), (512, 512), (1024, 512), (2048, 1024)]:
        got = jax.jit(
            lambda c: jax.vmap(
                lambda cc: knn_mean_distances(cc, k, rt, "banded", band)
            )(c)
        )(vox.cloud)
        got = np.asarray(got)
        m = np.asarray(jnp.asarray(vox.cloud.valid))
        d = np.abs(got - exact)[m]
        log(
            f"fidelity rt={rt} band={band}: frac_changed={np.mean(d > 1e-7):.4%} "
            f"max={d.max():.3e} rel_mean={d.mean()/max(exact[m].mean(),1e-9):.2e}"
        )


if __name__ == "__main__":
    main()
