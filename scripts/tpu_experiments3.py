"""TPU micro-experiments, round 3: end-to-end with the productionized ops.

After wiring in the MXU-gather compaction, the fused Pallas sweep+jump
cluster, and the banded kNN default, measure:
  - the full batched pipeline (banded vs approx kNN),
  - the new voxel stage total and its residual parts (loc-only vs
    loc+value-gather) to see whether bins[loc] is worth fusing,
  - cluster with/without the Shiloach-Vishkin hook,
  - the leftover stages (shadow+centroid+mark).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

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
    log(f"  {label:<46s} {t*1e3:9.2f} ms/batch  (true ~{t*1e3-NULL[0]:8.2f})")
    return t


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from jax import lax

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.cluster import (
        cluster_centroids,
        euclidean_cluster,
    )
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.mxu_histogram import (
        compact_occupied_blocks,
        weighted_histogram_blocks,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import (
        crop_and_seed,
        mark_obstacles,
    )
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
    from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec, voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from tpu_experiments import make_inputs

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    base = REFERENCE_YAML_CONFIG.replace(
        max_points=131072, max_voxels=16384, cluster_capacity=4096,
        max_clusters=64, downsample_leaf_size=0.04,
    )
    clouds = make_inputs(base)
    B = clouds.valid.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    small = jnp.ones((8, 8), jnp.float32)
    NULL[0] = timed(jax.jit(lambda s: jnp.sum(s)), small, iters=8, label="null (RPC)") * 1e3

    # ---- full pipeline, banded vs approx ----------------------------------
    for backend in ("banded", "approx"):
        cfg = base.replace(knn_backend=backend)

        def full(c, k):
            r = jax.vmap(lambda cc, kk: process_scan(cc, kk, cfg))(c, k)
            return jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(
                r.clusters.num_clusters
            )

        t = timed(jax.jit(full), clouds, keys, label=f"full pipeline knn={backend}")
        log(f"    -> {B / t:.1f} scans/s")

    cfg = base.replace(knn_backend="banded")
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)

    # ---- voxel stage residuals ---------------------------------------------
    def vfull(c):
        r = jax.vmap(lambda cc: voxel_downsample(cc, leaf, cfg.max_voxels, bounds, "fast"))(c)
        return jnp.sum(r.cloud.points)

    timed(jax.jit(vfull), seeded.cloud, label="voxel_downsample total (new compaction)")

    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]

    def v_loc_only(c):
        def one(cc):
            pts = cc.points
            valid = cc.valid & jnp.all(jnp.isfinite(pts), axis=-1)
            ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
            ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
            iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
            iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
            packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
            corner = ijk.astype(jnp.float32) * jnp.float32(leaf)
            off = jnp.where(valid[:, None], pts - corner, 0.0)
            upd = jnp.concatenate([off, valid.astype(jnp.float32)[:, None]], -1)
            blocks, a, b = weighted_histogram_blocks(packed, upd, valid, K, exact_f32=False)
            occ2d = blocks[:, :, 3] > 0.0
            loc, num = compact_occupied_blocks(occ2d, cfg.max_voxels)
            return jnp.sum(loc) + num
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(v_loc_only), seeded.cloud, label="voxel binning+compaction (no value gather)")

    vox = jax.jit(
        jax.vmap(lambda cc: voxel_downsample(cc, leaf, cfg.max_voxels, bounds, "fast").cloud)
    )(seeded.cloud)

    # ---- outlier + ransac + compact (current path) -------------------------
    def orun(c):
        return jnp.sum(
            jax.vmap(
                lambda cc: remove_statistical_outliers(
                    cc, 15, 4.0, backend="banded", band=cfg.knn_band
                ).cloud.valid
            )(c)
        )

    timed(jax.jit(orun), vox, label="outlier banded (stage)")
    outl = jax.jit(
        jax.vmap(
            lambda cc: remove_statistical_outliers(
                cc, 15, 4.0, backend="banded", band=cfg.knn_band
            ).cloud
        )
    )(vox)

    def srun(c, k):
        return jnp.sum(
            jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg).nonplane_cloud.valid)(c, k)
        )

    timed(jax.jit(srun), outl, keys, label="ransac (stage)")
    seg = jax.jit(jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg)))(outl, keys)

    def crun(c):
        return jnp.sum(jax.vmap(lambda cc: compact(cc, cfg.cluster_capacity).cloud.points)(c))

    timed(jax.jit(crun), seg.nonplane_cloud, label="compact (stage)")
    comp = jax.jit(jax.vmap(lambda cc: compact(cc, cfg.cluster_capacity)))(seg.nonplane_cloud)

    # ---- cluster: new structure, hook on (current code) --------------------
    def clrun(c):
        r = jax.vmap(
            lambda cc: euclidean_cluster(
                cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )(c)
        return jnp.sum(r.clusters.sizes)

    timed(jax.jit(clrun), comp.cloud, label="cluster new (hook + fused jump)")
    clus = jax.jit(
        jax.vmap(
            lambda cc: euclidean_cluster(
                cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )
    )(comp.cloud)

    # ---- shadow + centroids + mark (tail stages) ---------------------------
    tfid = RigidTransform.identity()

    def tailrun(args):
        comp_c, clus_c, grid_c, nonp_c = args

        def one(cc, pc, sz, vl, nc, g, npts, nval):
            from pointcloud_obstacle_processing_tpu.types import ClusterSet, Cloud

            cl = ClusterSet(point_cluster=pc, sizes=sz, valid=vl, num_clusters=nc)
            cents = cluster_centroids(cc, cl)
            sh = cast_shadows(g, cc, cl, tfid, cfg)
            g2 = mark_obstacles(sh.grid, Cloud(points=npts, valid=nval), cfg)
            return jnp.sum(g2.astype(jnp.int32)) + jnp.sum(cents.points.xyzr)

        return jnp.sum(
            jax.vmap(one)(
                comp_c.cloud, clus_c.clusters.point_cluster, clus_c.clusters.sizes,
                clus_c.clusters.valid, clus_c.clusters.num_clusters,
                grid_c, nonp_c.points, nonp_c.valid,
            )
        )

    timed(
        jax.jit(tailrun),
        (comp, clus, seeded.hole_grid, seg.nonplane_cloud),
        label="tail: centroids+shadow+mark",
    )

    # ---- crop stage --------------------------------------------------------
    def croprun(c):
        return jnp.sum(jax.vmap(lambda cc: crop_and_seed(cc, cfg).counts)(c))

    timed(jax.jit(croprun), clouds, label="crop+seed (stage)")


if __name__ == "__main__":
    main()
