"""TPU micro-experiments, round 4.

  - full pipeline after the round-3 productionizations (fused value gather,
    128-lane compaction shape, MXU mark_obstacles, slot-centric compact)
  - knn: Pallas banded kernel with in-kernel k-extraction (no HBM d2, no
    approx_min_k) vs the XLA banded backend
  - cluster: hook/jump variants of the convergence loop
"""

from __future__ import annotations

import functools
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


# ---------------------------------------------------------- pallas banded knn
def make_pallas_knn(N: int, k: int, T: int, band: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = min(N, T + 2 * band)
    BIG = 3.0e38

    def kernel(xq, yq, zq, sqq, xr, yr, zr, sqr, vr, out):
        i = pl.program_id(0)
        start = jnp.clip(i * T - band, 0, N - W)
        start = pl.multiple_of(start, min(T, band) if band else T)
        xs = xr[:, pl.ds(start, W)]
        ys = yr[:, pl.ds(start, W)]
        zs = zr[:, pl.ds(start, W)]
        sqs = sqr[:, pl.ds(start, W)]
        vs = vr[:, pl.ds(start, W)]
        cross = xq[:] * xs + yq[:] * ys + zq[:] * zs  # [T, W]
        d2 = sqq[:] + sqs - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        lane = lax.broadcasted_iota(jnp.int32, (T, W), 1) + start
        row = lax.broadcasted_iota(jnp.int32, (T, W), 0) + i * T
        d2 = jnp.where((vs > 0) & (lane != row), d2, BIG)

        def body(_, carry):
            s, taken, prev = carry
            m = jnp.min(jnp.where(d2 > prev, d2, BIG), axis=1, keepdims=True)
            real = m < BIG * 0.5
            c = jnp.sum((d2 == m).astype(jnp.float32), axis=1, keepdims=True)
            take = jnp.where(real, jnp.minimum(c, k - taken), 0.0)
            s = s + jnp.sqrt(jnp.where(real, m, 0.0)) * take
            return (s, taken + take, m)

        init = (
            jnp.zeros((T, 1), jnp.float32),
            jnp.zeros((T, 1), jnp.float32),
            jnp.full((T, 1), -1.0, jnp.float32),
        )
        s, taken, _ = lax.fori_loop(0, k, body, init)
        out[:] = s / jnp.maximum(taken, 1.0)

    col = lambda: pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def knn(pts, valid):
        sq = jnp.sum(pts * pts, axis=-1)
        vi = valid.astype(jnp.int32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            grid=(N // T,),
            in_specs=[col(), col(), col(), col(),
                      row(), row(), row(), row(), row()],
            out_specs=col(),
            interpret=interpret,
        )(
            pts[:, 0:1], pts[:, 1:2], pts[:, 2:3], sq.reshape(N, 1),
            pts[:, 0].reshape(1, N), pts[:, 1].reshape(1, N),
            pts[:, 2].reshape(1, N), sq.reshape(1, N), vi.reshape(1, N),
        )
        return jnp.where(valid, out[:, 0], 0.0)

    return knn


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.cluster import _neighbor_min_sweep
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        knn_mean_distances,
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
    from pointcloud_obstacle_processing_tpu.pipeline import process_scan
    from tpu_experiments import make_inputs

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    interpret = dev.platform != "tpu"
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))

    base = REFERENCE_YAML_CONFIG.replace(
        max_points=131072, max_voxels=16384, cluster_capacity=4096,
        max_clusters=64, downsample_leaf_size=0.04, knn_backend="banded",
    )
    clouds = make_inputs(base)
    B = clouds.valid.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    small = jnp.ones((8, 8), jnp.float32)
    NULL[0] = timed(jax.jit(lambda s: jnp.sum(s)), small, iters=8, label="null (RPC)") * 1e3

    def full(c, k):
        r = jax.vmap(lambda cc, kk: process_scan(cc, kk, base))(c, k)
        return jnp.sum(r.grid.data.astype(jnp.int32)) + jnp.sum(r.clusters.num_clusters)

    t = timed(jax.jit(full), clouds, keys, label="full pipeline (round-3 ops)")
    log(f"    -> {B / t:.1f} scans/s")

    bounds = ((base.x_min, base.y_min, base.z_min), (base.x_max, base.y_max, base.z_max))
    leaf = base.downsample_leaf_size
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, base)))(clouds)

    def vfull(c):
        r = jax.vmap(lambda cc: voxel_downsample(cc, leaf, base.max_voxels, bounds, "fast"))(c)
        return jnp.sum(r.cloud.points)

    timed(jax.jit(vfull), seeded.cloud, label="voxel total (fused value gather)")
    vox = jax.jit(
        jax.vmap(lambda cc: voxel_downsample(cc, leaf, base.max_voxels, bounds, "fast").cloud)
    )(seeded.cloud)

    # ---- pallas knn ---------------------------------------------------------
    N = base.max_voxels
    knn = make_pallas_knn(N, 15, T=512, band=512, interpret=interpret)
    c0 = jtu.tree_map(lambda x: x[0], vox)
    d_exact_banded = np.asarray(
        knn_mean_distances(c0, 15, backend="banded", band=512)
    )
    d_pallas = np.asarray(jax.jit(knn)(c0.points, c0.valid))
    v = np.asarray(c0.valid)
    # pallas banded does EXACT k-extraction within the band; XLA banded uses
    # approx_min_k (recall 0.98) — compare both to full exact
    d_full_exact = np.asarray(knn_mean_distances(c0, 15, backend="exact"))
    for nm, d in (("xla banded(approx)", d_exact_banded), ("pallas banded", d_pallas)):
        rel = np.abs(d[v] - d_full_exact[v]) / np.maximum(d_full_exact[v], 1e-9)
        log(f"  {nm}: mean rel {rel.mean():.2e} frac>1e-6 {(rel > 1e-6).mean():.4f}")

    def kx(c):
        return jnp.sum(
            jax.vmap(lambda cc: knn_mean_distances(cc, 15, backend="banded", band=512))(c)
        )

    def kp_(c):
        return jnp.sum(jax.vmap(lambda cc: knn(cc.points, cc.valid))(c))

    timed(jax.jit(kx), vox, label="knn xla banded (band 512)")
    timed(jax.jit(kp_), vox, label="knn pallas banded (band 512)")

    # ---- cluster variants ---------------------------------------------------
    outl = jax.jit(
        jax.vmap(
            lambda cc: remove_statistical_outliers(cc, 15, 4.0, backend="banded").cloud
        )
    )(vox)
    seg = jax.jit(jax.vmap(lambda cc, kk: segment_planes(cc, kk, base)))(outl, keys)
    comp = jax.jit(jax.vmap(lambda cc: compact(cc, base.cluster_capacity)))(seg.nonplane_cloud)
    cl = comp.cloud
    C = base.cluster_capacity
    tol2 = float(base.euc_cluster_tolerance) ** 2

    def cluster_loop(hook: bool, jumps: int):
        import jax.numpy as jnp
        from jax import lax

        def run(cc):
            pts, valid = cc.points, cc.valid
            denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
            p = jnp.where(valid[:, None], pts - center, 0.0)
            idx = lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]

            def cond(s):
                return s[1] & (s[2] < 64)

            def body(s):
                labels, _, it = s
                nbr = _neighbor_min_sweep(p, valid, labels, tol2, 512)
                new = labels.at[labels].min(nbr) if hook else labels
                new = jnp.minimum(new, nbr)
                for _ in range(jumps):
                    new = jnp.minimum(new, new[new])
                return (new, jnp.any(new != labels), it + 1)

            labels, _, iters = lax.while_loop(cond, body, (idx, jnp.bool_(True), jnp.int32(0)))
            return jnp.sum(labels) + iters * 0

        def f(c):
            return jnp.sum(jax.vmap(run)(c))

        return f

    for hook, jumps, nm in (
        (True, 1, "clA hook + 1 jump (current)"),
        (True, 0, "clB hook + 0 jumps"),
        (False, 0, "clC no hook, 0 jumps"),
        (False, 1, "clD no hook, 1 jump"),
    ):
        timed(jax.jit(cluster_loop(hook, jumps)), cl, label=nm)

    # ---- compact + tail re-measure ------------------------------------------
    def crun(c):
        return jnp.sum(jax.vmap(lambda cc: compact(cc, base.cluster_capacity).cloud.points)(c))

    timed(jax.jit(crun), seg.nonplane_cloud, label="compact (slot-centric)")


if __name__ == "__main__":
    main()
