"""TPU micro-experiments, round 2: RPC-corrected timings + candidate fixes.

Findings from round 1 (scripts/tpu_experiments.py, all numbers include a
~26 ms axon-tunnel RPC constant): the voxel stage's hidden hog is
compact_occupied_blocks (71 ms/batch true — the occ_i[blk] row gather),
binning itself is 45 ms; banded kNN (band 512) is 37 ms vs 129 full-width;
a cluster sweep is ~9 ms.  This round probes:

  null  the RPC constant itself
  c1    compaction via comparison-sum blk + one-hot-matmul row gather
        (bf16-exact: occupancy/per-block/offset-digit columns all < 256)
  v4    voxel_downsample with c1 wired in
  cl4   Pallas VMEM sweep (fixed: closure constants as Python scalars)
  cl5   restructured euclidean_cluster (Pallas sweep + fixed jumps)
  k4    banded kNN band=256 / tile variants
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(*a):
    print(*a, flush=True)


NULL_MS = 0.0


def timed(fn, *args, iters=5, label=""):
    import jax

    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    log(f"  {label:<46s} {t*1e3:9.2f} ms/batch  (true ~{t*1e3-NULL_MS:8.2f})")
    return t


# ------------------------------------------------------- candidate compaction
def compact_occupied_blocks_v2(occupied, capacity: int):
    """Indices of the first `capacity` True entries of an [A, B] block grid,
    with NO serialized gathers: the per-slot block id comes from a
    comparison-sum (blk[s] = #{a: offsets[a] < s+1}) and the block row +
    metadata come through ONE bf16 one-hot matmul whose columns are all
    integers < 256 (occupancy 0/1, per-block count <= 128, offset digits
    base-256), hence exact in f32 accumulation."""
    import jax.numpy as jnp
    from jax import lax

    a, b = occupied.shape
    occ_i = occupied.astype(jnp.int32)
    per_block = jnp.sum(occ_i, axis=1)  # [A]
    offsets = jnp.cumsum(per_block)  # inclusive
    num = offsets[-1]

    target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0] + 1  # [S]
    # blk[s] = searchsorted_left(offsets, target[s]) as a comparison sum
    cmp = (offsets[None, :] < target[:, None]).astype(jnp.int32)  # [S, A]
    blk = jnp.minimum(jnp.sum(cmp, axis=1), a - 1)  # [S]

    # gather matrix: [A, B + 4] bf16 — occupancy row, per-block count,
    # inclusive-offset digits (base 256: all columns integer < 256)
    o0 = offsets % 256
    o1 = (offsets // 256) % 256
    o2 = offsets // 65536
    gmat = jnp.concatenate(
        [
            occupied.astype(jnp.bfloat16),
            per_block[:, None].astype(jnp.bfloat16),
            o0[:, None].astype(jnp.bfloat16),
            o1[:, None].astype(jnp.bfloat16),
            o2[:, None].astype(jnp.bfloat16),
        ],
        axis=1,
    )  # [A, B+4]
    cols = lax.broadcasted_iota(jnp.int32, (1, a), 1)
    oh = (blk[:, None] == cols).astype(jnp.bfloat16)  # [S, A]
    g = lax.dot_general(
        oh, gmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, B+4]
    rows = g[:, :b].astype(jnp.int32)  # 0/1 occupancy of the selected block
    pb = g[:, b].astype(jnp.int32)
    offs = (g[:, b + 1] + g[:, b + 2] * 256.0 + g[:, b + 3] * 65536.0).astype(jnp.int32)
    excl = offs - pb  # exclusive offset of the selected block

    local = jnp.cumsum(rows, axis=1)
    tgt = (target - excl)[:, None]
    lane = jnp.argmax((local == tgt) & (rows > 0), axis=1).astype(jnp.int32)
    return blk * b + lane, num


# ------------------------------------------------------- candidate pallas sweep
def make_pallas_sweep(C: int, tol2: float, T: int = 256, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def sweep_kernel(xs_ref, ys_ref, zs_ref, xr_ref, yr_ref, zr_ref,
                     sqc_ref, sqr_ref, lr_ref, vc_ref, vr_ref, out_ref):
        cross = (
            xs_ref[:] * xr_ref[:]
            + ys_ref[:] * yr_ref[:]
            + zs_ref[:] * zr_ref[:]
        )  # [T, C]
        d2 = sqc_ref[:] + sqr_ref[:] - 2.0 * cross
        adj = (d2 <= tol2) & (vr_ref[:] > 0) & (vc_ref[:] > 0)
        cand = jnp.where(adj, lr_ref[:], jnp.int32(C))
        out_ref[:] = jnp.min(cand, axis=1, keepdims=True)

    col = lambda: pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def sweep(pts, valid, lab):
        sq = jnp.sum(pts * pts, axis=-1)
        vi = valid.astype(jnp.int32)
        labr = jnp.where(valid, lab, jnp.int32(C))
        out = pl.pallas_call(
            sweep_kernel,
            out_shape=jax.ShapeDtypeStruct((C, 1), jnp.int32),
            grid=(C // T,),
            in_specs=[col(), col(), col(), row(), row(), row(),
                      col(), row(), row(), col(), row()],
            out_specs=col(),
            interpret=interpret,
        )(
            pts[:, 0:1], pts[:, 1:2], pts[:, 2:3],
            pts[:, 0].reshape(1, C), pts[:, 1].reshape(1, C), pts[:, 2].reshape(1, C),
            sq.reshape(C, 1), sq.reshape(1, C),
            labr.reshape(1, C), vi.reshape(C, 1), vi.reshape(1, C),
        )
        return jnp.minimum(out[:, 0], lab)

    return sweep


def euclidean_cluster_v2(cloud, tolerance, min_size, max_size, max_clusters,
                         max_iters, sweep_fn):
    """Restructured clustering: sweep + hook + FIXED pointer jumps per outer
    iteration (no inner convergence while-loop, no per-jump `any` syncs)."""
    import jax.numpy as jnp
    from jax import lax

    pts = cloud.points
    valid = cloud.valid
    n = cloud.capacity
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
    p = jnp.where(valid[:, None], pts - center, 0.0)

    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        nbr_min = sweep_fn(p, valid, labels)
        new = labels.at[labels].min(nbr_min)
        new = jnp.minimum(new, nbr_min)
        for _ in range(3):  # fixed jumps: path-compress most of the way
            new = jnp.minimum(new, new[new])
        return (new, jnp.any(new != labels), it + 1)

    labels, _, _ = lax.while_loop(cond, body, (idx, jnp.bool_(True), jnp.int32(0)))
    return labels


def main():
    global NULL_MS
    import jax
    import jax.numpy as jnp

    from pointcloud_obstacle_processing_tpu.config import REFERENCE_YAML_CONFIG
    from pointcloud_obstacle_processing_tpu.ops.mxu_histogram import (
        compact_occupied_blocks,
    )
    from tpu_experiments import make_inputs

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    interpret = dev.platform != "tpu"
    x = jnp.ones((128, 128))
    np.asarray(x @ x)

    cfg = REFERENCE_YAML_CONFIG.replace(
        max_points=131072, max_voxels=16384, cluster_capacity=4096,
        max_clusters=64, downsample_leaf_size=0.04,
    )
    clouds = make_inputs(cfg)
    B = clouds.valid.shape[0]

    # ---- null: the tunnel RPC constant -----------------------------------
    small = jnp.ones((8, 8), jnp.float32)
    t_null = timed(jax.jit(lambda s: jnp.sum(s)), small, iters=8, label="null (RPC constant)")
    NULL_MS = t_null * 1e3

    # ---- compaction -------------------------------------------------------
    import jax.tree_util as jtu
    from pointcloud_obstacle_processing_tpu.ops.occupancy import crop_and_seed
    from pointcloud_obstacle_processing_tpu.ops.voxel import _pack_spec

    from tpu_experiments import exp_voxel  # noqa: F401  (reuse ids_and_off inline)

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    leaf = cfg.downsample_leaf_size
    imin, dims = _pack_spec(bounds, leaf)
    K = dims[0] * dims[1] * dims[2]
    kp = -(-K // 128) * 128
    seeded = jax.jit(jax.vmap(lambda cc: crop_and_seed(cc, cfg)))(clouds)
    cloud = seeded.cloud

    def occ_of(cc):
        pts = cc.points
        valid = cc.valid & jnp.all(jnp.isfinite(pts), axis=-1)
        ijk = jnp.floor(pts / jnp.float32(leaf)).astype(jnp.int32)
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, kp)
        return jnp.zeros((kp,), jnp.float32).at[packed].add(1.0, mode="drop") > 0

    occ2d = jax.jit(jax.vmap(lambda cc: occ_of(cc).reshape(kp // 128, 128)))(cloud)

    # correctness: v2 == v0 on scan 0
    o0 = jtu.tree_map(lambda x: x[0], occ2d)
    loc_a, num_a = compact_occupied_blocks(o0, cfg.max_voxels)
    loc_b, num_b = compact_occupied_blocks_v2(o0, cfg.max_voxels)
    same = int(num_a) == int(num_b) and bool(
        np.all(
            np.asarray(loc_a)[: int(num_a)] == np.asarray(loc_b)[: int(num_b)]
        )
    )
    log(f"  c1 correctness vs c0: {same} (num={int(num_a)})")

    def c0(o):
        def one(oo):
            loc, num = compact_occupied_blocks(oo, cfg.max_voxels)
            return jnp.sum(loc) + num
        return jnp.sum(jax.vmap(one)(o))

    def c1(o):
        def one(oo):
            loc, num = compact_occupied_blocks_v2(oo, cfg.max_voxels)
            return jnp.sum(loc) + num
        return jnp.sum(jax.vmap(one)(o))

    timed(jax.jit(c0), occ2d, label="c0 current compaction")
    timed(jax.jit(c1), occ2d, label="c1 mxu-gather compaction")

    # ---- knn band refinement ---------------------------------------------
    from pointcloud_obstacle_processing_tpu.ops.outliers import knn_mean_distances
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample

    vox = jax.jit(
        jax.vmap(
            lambda cc: voxel_downsample(cc, leaf, cfg.max_voxels, bounds, "fast").cloud
        )
    )(cloud)

    def krun(backend, band, row_tile=512):
        def f(c):
            return jnp.sum(
                jax.vmap(
                    lambda cc: knn_mean_distances(
                        cc, 15, row_tile=row_tile, backend=backend, band=band
                    )
                )(c)
            )
        return f

    timed(jax.jit(krun("banded", 512)), vox, label="k1 banded band=512 T=512")
    timed(jax.jit(krun("banded", 256)), vox, label="k4 banded band=256 T=512")
    timed(jax.jit(krun("banded", 768)), vox, label="k5 banded band=768 T=512")
    timed(jax.jit(krun("banded", 640, 256)), vox, label="k6 banded band=640 T=256")
    c0v = jtu.tree_map(lambda x: x[0], vox)
    de = np.asarray(knn_mean_distances(c0v, 15, backend="exact"))
    for band, rt in ((256, 512), (512, 512), (640, 256)):
        db = np.asarray(knn_mean_distances(c0v, 15, backend="banded", band=band, row_tile=rt))
        v = np.asarray(c0v.valid)
        rel = np.abs(db[v] - de[v]) / np.maximum(de[v], 1e-9)
        log(f"  band={band} T={rt}: mean rel {rel.mean():.2e} frac>1e-6 {(rel>1e-6).mean():.4f}")

    # ---- cluster ----------------------------------------------------------
    from pointcloud_obstacle_processing_tpu.ops.cluster import (
        _neighbor_min_sweep,
        euclidean_cluster,
    )
    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.outliers import remove_statistical_outliers
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes

    outl = jax.jit(
        jax.vmap(lambda cc: remove_statistical_outliers(cc, 15, 4.0).cloud)
    )(vox)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    seg = jax.jit(jax.vmap(lambda cc, kk: segment_planes(cc, kk, cfg)))(outl, keys)
    comp = jax.jit(jax.vmap(lambda cc: compact(cc, cfg.cluster_capacity)))(seg.nonplane_cloud)
    cl = comp.cloud
    C = cfg.cluster_capacity
    tol2 = float(cfg.euc_cluster_tolerance) ** 2

    sweep = make_pallas_sweep(C, tol2, T=256, interpret=interpret)

    # correctness of one pallas sweep vs XLA sweep
    c0c = jtu.tree_map(lambda x: x[0], cl)
    idx0 = jnp.arange(C, dtype=jnp.int32)
    want = np.asarray(
        jnp.minimum(
            _neighbor_min_sweep(
                c0c.points, c0c.valid, idx0, jnp.float32(tol2), 512
            ),
            idx0,
        )
    )
    got = np.asarray(jax.jit(sweep)(c0c.points, c0c.valid, idx0))
    log(f"  cl4 pallas sweep agreement: {(want == got).mean():.6f}")

    def cl4(c):
        def one(cc):
            return jnp.sum(sweep(cc.points, cc.valid, idx0))
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(cl4), cl, label="cl4 one Pallas VMEM sweep")

    def cl0(c):
        r = jax.vmap(
            lambda cc: euclidean_cluster(
                cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            )
        )(c)
        return jnp.sum(r.clusters.sizes)

    timed(jax.jit(cl0), cl, label="cl0 current euclidean_cluster")

    def cl5(c):
        def one(cc):
            return jnp.sum(
                euclidean_cluster_v2(
                    cc, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
                    cfg.euc_max_cluster_size, cfg.max_clusters,
                    cfg.cluster_max_iters, sweep,
                )
            )
        return jnp.sum(jax.vmap(one)(c))

    timed(jax.jit(cl5), cl, label="cl5 v2 cluster (pallas sweep, fixed jumps)")

    # label agreement cl5 vs current
    lab_cur = None
    r_cur = euclidean_cluster(
        c0c, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
        cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
    )
    lab5 = np.asarray(
        euclidean_cluster_v2(
            c0c, cfg.euc_cluster_tolerance, cfg.euc_min_cluster_size,
            cfg.euc_max_cluster_size, cfg.max_clusters, cfg.cluster_max_iters,
            sweep,
        )
    )
    log(f"  cl5 label agreement vs current: {(np.asarray(r_cur.labels) == lab5).mean():.6f}")


if __name__ == "__main__":
    main()
