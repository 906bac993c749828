"""TPU micro-experiments for round-2 optimization decisions.

Run ON the TPU (no args = all groups; or pass group names: voxel knn
cluster).  Every timed program reduces to a scalar on device (the axon
tunnel makes block_until_ready unreliable and transfers slow — see
CLAUDE.md).  Results are printed as one line per variant; winners get
productionized into ops/.

Variants probed (rationale in docs/PERFORMANCE.md round-2 log):
  voxel   v0 current pipeline binning (per-channel bf16 one-hot matmuls)
          v1 int8 one-hot x int8-quantized weights -> s32 (half traffic,
             2x MXU int8 rate; quantization error == current "fast" mode)
          v2 concatenated-channel int8 (one matmul, chunked over N)
          v3 dense [K,4] scatter-add reference point
          c0 occupied-block compaction alone
  knn     k0 current full-width approx_min_k
          k1/k2 banded rank-window (band 512 / 1024)
  cluster cl0 current euclidean_cluster
          cl1 one XLA neighbor-min sweep
          cl2 one pointer-jump gather l[l]
          cl3 one scatter-min hook
          cl4 one Pallas VMEM sweep (fused distance+min, no HBM d2)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, iters=5, label=""):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    log(f"  {label:<44s} {t*1e3:9.2f} ms/batch")
    return t


def make_inputs(cfg, B=32):
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.types import Cloud
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = np.zeros((B, cfg.max_points, 3), np.float32)
    valid = np.zeros((B, cfg.max_points), bool)
    uniq = min(B, 8)
    scenes = [make_scene(seed=i, spec=spec).points[: cfg.max_points] for i in range(uniq)]
    for i in range(B):
        p = scenes[i % uniq]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    return Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))


# --------------------------------------------------------------------- voxel
def exp_voxel(cfg, clouds):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu.ops.mxu_histogram import (
        compact_occupied_blocks,
        weighted_histogram_blocks,
    )
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec, voxel_downsample

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]
    log(f"voxel: dims={dims} K={K}")

    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    cloud = seeded.cloud
    n = cfg.max_points

    def ids_and_off(cc):
        pts = cc.points
        valid = cc.valid & jnp.all(jnp.isfinite(pts), axis=-1)
        ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        corner = ijk.astype(jnp.float32) * jnp.float32(leaf)
        off = jnp.where(valid[:, None], pts - corner, 0.0)
        return packed, off, valid

    # v0: current full downsample (binning + compaction)
    def v0(c):
        r = jax.vmap(lambda cc: voxel_downsample(cc, leaf, cfg.max_voxels, bounds, "fast"))(c)
        return jnp.sum(r.cloud.points)

    timed(jax.jit(v0), cloud, label="v0 current voxel_downsample (fast)")

    # v0b: binning only (current)
    def v0b(c):
        def one(cc):
            packed, off, valid = ids_and_off(cc)
            upd = jnp.concatenate([off, valid.astype(jnp.float32)[:, None]], -1)
            blocks, a, b = weighted_histogram_blocks(packed, upd, valid, K, exact_f32=False)
            return jnp.sum(blocks[0])
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(v0b), cloud, label="v0b binning only, per-channel bf16")

    # v1: int8 per-channel
    import math
    A = max(128, min(512, int(math.sqrt(K / 2) / 64 + 0.5) * 64))
    Bdim = -(-K // A)

    def onehot_i8(ids, k):
        cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)
        return (ids[:, None] == cols).astype(jnp.int8)

    def v1(c):
        def one(cc):
            packed, off, valid = ids_and_off(cc)
            q = jnp.clip(jnp.floor(off / jnp.float32(leaf) * 256.0), 0, 255.0)
            q = (q - 128.0).astype(jnp.int8)  # [N,3] in [-128,127]
            w4 = jnp.concatenate([q, valid.astype(jnp.int8)[:, None]], -1)
            hi = onehot_i8(packed // Bdim, A)
            lo = onehot_i8(packed % Bdim, Bdim)
            out = jnp.zeros((A, Bdim, 4), jnp.int32)
            for ci in range(4):
                whi = hi * w4[:, ci][:, None]
                part = lax.dot_general(
                    whi, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out = out.at[:, :, ci].add(part)
            return jnp.sum(out[0])
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(v1), cloud, label="v1 binning int8 per-channel")

    # v2: int8 concatenated channels, chunked over N
    def v2(c, chunks=4):
        def one(cc):
            packed, off, valid = ids_and_off(cc)
            q = jnp.clip(jnp.floor(off / jnp.float32(leaf) * 256.0), 0, 255.0)
            q = (q - 128.0).astype(jnp.int8)
            w4 = jnp.concatenate([q, valid.astype(jnp.int8)[:, None]], -1)  # [N,4]
            cn = n // chunks

            def chunk(carry, args):
                pk, w = args  # [cn], [cn,4]
                hi = onehot_i8(pk // Bdim, A)  # [cn, A]
                lo = onehot_i8(pk % Bdim, Bdim)
                whi = (hi[:, :, None] * w[:, None, :]).reshape(cn, A * 4)
                part = lax.dot_general(
                    whi, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [4A, B]
                return carry + part, 0.0

            out, _ = lax.scan(
                chunk,
                jnp.zeros((A * 4, Bdim), jnp.int32),
                (packed.reshape(chunks, cn), w4.reshape(chunks, cn, 4)),
            )
            return jnp.sum(out[0])
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(v2), cloud, label="v2 binning int8 concat-channel chunked")

    # v3: dense scatter-add
    def v3(c):
        def one(cc):
            packed, off, valid = ids_and_off(cc)
            w = valid.astype(jnp.float32)
            upd = jnp.concatenate([cc.points * w[:, None], w[:, None]], -1)
            kp = -(-K // 128) * 128
            bins = jnp.zeros((kp, 4), jnp.float32).at[packed].add(upd, mode="drop")
            return jnp.sum(bins[0])
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(v3), cloud, label="v3 dense [K,4] scatter-add")

    # c0: compaction alone
    occ = jax.jit(
        jax.vmap(
            lambda cc: (
                lambda packed, off, valid: jnp.zeros(
                    (-(-K // 128) * 128,), jnp.float32
                ).at[packed].add(valid.astype(jnp.float32), mode="drop")
            )(*ids_and_off(cc))
        )
    )(cloud)
    occ2d = occ > 0

    def c0(o):
        def one(oo):
            loc, num = compact_occupied_blocks(oo.reshape(-1, 128), cfg.max_voxels)
            return jnp.sum(loc) + num
        return jnp.sum(jax.vmap(one)(o))

    timed(jax.jit(c0), occ2d, label="c0 compact_occupied_blocks alone")


# ----------------------------------------------------------------------- knn
def exp_knn(cfg, clouds):
    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import knn_mean_distances
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds, "fast"
            ).cloud
        )
    )(seeded.cloud)
    k = cfg.statistical_outlier_mean_k

    def run(backend, band):
        def f(c):
            return jnp.sum(
                jax.vmap(
                    lambda cc: knn_mean_distances(cc, k, backend=backend, band=band)
                )(c)
            )
        return f

    timed(jax.jit(run("approx", 0)), vox, label="k0 approx full width")
    timed(jax.jit(run("banded", 512)), vox, label="k1 banded band=512")
    timed(jax.jit(run("banded", 1024)), vox, label="k2 banded band=1024")
    timed(jax.jit(run("banded", 1792)), vox, label="k3 banded band=1792")

    # recall sanity on TPU data (vs exact), scan 0
    import jax.tree_util as jtu

    c0 = jtu.tree_map(lambda x: x[0], vox)
    de = np.asarray(knn_mean_distances(c0, k, backend="exact"))
    for band in (512, 1024):
        db = np.asarray(knn_mean_distances(c0, k, backend="banded", band=band))
        v = np.asarray(c0.valid)
        rel = np.abs(db[v] - de[v]) / np.maximum(de[v], 1e-9)
        log(f"  banded band={band}: mean rel err {rel.mean():.2e}, frac>1e-6 {(rel>1e-6).mean():.4f}")


# ------------------------------------------------------------------- cluster
def cl0_b(clouds):
    return clouds.valid.shape[0]


def exp_cluster(cfg, clouds):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointcloud_obstacle_processing_tpu.ops.cluster import (
        _neighbor_min_sweep,
        euclidean_cluster,
    )
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(
                cc, cfg.downsample_leaf_size, cfg.max_voxels, bounds, "fast"
            ).cloud
        )
    )(seeded.cloud)
    outl = jax.jit(
        jax.vmap(lambda cc: remove_statistical_outliers(cc, 15, 4.0).cloud)
    )(vox)
    keys = jax.random.split(jax.random.PRNGKey(0), cl0_b(clouds))
    seg = jax.jit(jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg)))(outl, keys)
    comp = jax.jit(jax.vmap(lambda cc: compact(cc, cfg.cluster_capacity)))(seg.nonplane_cloud)
    cl = comp.cloud
    C = cfg.cluster_capacity
    tol2 = jnp.float32(cfg.euc_cluster_tolerance) ** 2
    log(f"cluster: capacity={C}")

    def cl0(c):
        r = jax.vmap(
            lambda cc: euclidean_cluster(
                cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )(c)
        return jnp.sum(r.clusters.sizes)

    timed(jax.jit(cl0), cl, label="cl0 current euclidean_cluster")

    idx0 = jnp.arange(C, dtype=jnp.int32)

    def cl1(c):
        def one(cc):
            nm = _neighbor_min_sweep(cc.points, cc.valid, idx0, tol2, 512)
            return jnp.sum(nm)
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(cl1), cl, label="cl1 one XLA sweep")

    labels = jnp.tile(idx0[None], (32, 1))

    def cl2(l):
        def one(ll):
            return jnp.sum(jnp.minimum(ll, ll[ll]))
        return jnp.sum(jax.vmap(one)(l))

    timed(jax.jit(cl2), labels, label="cl2 one jump gather l[l]")

    def cl3(l):
        def one(ll):
            return jnp.sum(ll.at[ll].min(ll))
        return jnp.sum(jax.vmap(one)(l))

    timed(jax.jit(cl3), labels, label="cl3 one scatter-min hook")

    # cl4: Pallas VMEM sweep
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        interpret = jax.devices()[0].platform != "tpu"
        T = 256

        def sweep_kernel(xs_ref, ys_ref, zs_ref, xr_ref, yr_ref, zr_ref,
                         sqc_ref, sqr_ref, lr_ref, vc_ref, vr_ref, out_ref):
            # query tile [T,1] columns vs full row [1,C]
            cross = (
                xs_ref[:] * xr_ref[:]
                + ys_ref[:] * yr_ref[:]
                + zs_ref[:] * zr_ref[:]
            )  # [T, C]
            d2 = sqc_ref[:] + sqr_ref[:] - 2.0 * cross
            adj = (d2 <= tol2) & (vr_ref[:] > 0) & (vc_ref[:] > 0)
            cand = jnp.where(adj, lr_ref[:], jnp.int32(C))
            out_ref[:] = jnp.min(cand, axis=1, keepdims=True)

        def pallas_sweep(pts, valid, lab):
            xs = pts[:, 0:1]
            ys = pts[:, 1:2]
            zs = pts[:, 2:3]
            sq = jnp.sum(pts * pts, axis=-1)
            vi = valid.astype(jnp.int32)
            labr = jnp.where(valid, lab, jnp.int32(C))
            out = pl.pallas_call(
                sweep_kernel,
                out_shape=jax.ShapeDtypeStruct((C, 1), jnp.int32),
                grid=(C // T,),
                in_specs=[
                    pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                interpret=interpret,
            )(
                xs, ys, zs,
                pts[:, 0].reshape(1, C), pts[:, 1].reshape(1, C), pts[:, 2].reshape(1, C),
                sq.reshape(C, 1), sq.reshape(1, C),
                labr.reshape(1, C), vi.reshape(C, 1), vi.reshape(1, C),
            )
            nm = out[:, 0]
            return jnp.minimum(nm, lab)

        def cl4(c):
            def one(cc):
                return jnp.sum(pallas_sweep(cc.points, cc.valid, idx0))
            return jnp.sum(jax.vmap(one)(c))

        # correctness check vs XLA sweep on scan 0
        import jax.tree_util as jtu

        c0 = jtu.tree_map(lambda x: x[0], cl)
        want = np.asarray(
            jnp.minimum(_neighbor_min_sweep(c0.points, c0.valid, idx0, tol2, 512), idx0)
        )
        got = np.asarray(pallas_sweep(c0.points, c0.valid, idx0))
        ok = (want == got).mean()
        log(f"  cl4 pallas sweep correctness vs XLA: {ok:.6f}")
        timed(jax.jit(cl4), cl, label="cl4 one Pallas VMEM sweep")
    except Exception as e:
        log(f"  cl4 pallas sweep FAILED: {type(e).__name__}: {e}")


def main():
    import jax

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    # probe: tiny matmul first (a wedged tunnel should fail fast here)
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    np.asarray(x @ x)
    log("probe matmul ok")

    cfg = REFERENCE_YAML_CONFIG.replace(
        max_points=131072, max_voxels=16384, cluster_capacity=4096,
        max_clusters=64, downsample_leaf_size=0.04,
    )
    groups = sys.argv[1:] or ["voxel", "knn", "cluster"]
    clouds = make_inputs(cfg)
    for g in groups:
        log(f"== {g} ==")
        t0 = time.perf_counter()
        dict(voxel=exp_voxel, knn=exp_knn, cluster=exp_cluster)[g](cfg, clouds)
        log(f"   ({g} group took {time.perf_counter()-t0:.1f}s incl. compiles)")


if __name__ == "__main__":
    main()
