"""Host-side probe: true-kNN RANK SPAN under candidate point orders.

The banded kNN engine's band must cover how far a point's true k nearest
neighbors stray from it in RANK — the order's spatial locality is the
whole game.  Lattice (row-major (ix, iy, iz)) is the shipped order;
Morton measured far worse (Z-curve discontinuities).  A HILBERT curve has
no discontinuities (consecutive cells are always face-adjacent), so its
worst-case locality is categorically better than Morton's — this probe
measures whether it beats LATTICE on the authentic workloads before any
implementation is attempted.

Pure NumPy/SciPy (no TPU): builds the exact post-voxel clouds of both
bench configs (the NumPy voxel oracle), computes each point's true
k+1-NN set (cKDTree), and reports the distribution of
max |rank(neighbor) - rank(query)| under each order.  A band B covers a
query iff its span <= B (tile placement adds slack, so this is the
conservative bound the engine's fidelity follows).

Hilbert: Skilling's transpose algorithm (J. Skilling, "Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004), vectorized; anisotropic dims
are padded to the cube (compact-Hilbert packing is an implementation
detail that does not change the ORDER of occupied cells within the box).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
from scipy.spatial import cKDTree


def hilbert_index(ix, iy, iz, bits: int):
    """Vectorized Skilling transform: (ix, iy, iz) -> Hilbert index.

    Verified by the __main__ self-test: consecutive indices differ by
    exactly one unit step along one axis (curve continuity)."""
    X = [ix.astype(np.int64), iy.astype(np.int64), iz.astype(np.int64)]
    n = 3
    M = 1 << (bits - 1)
    # inverse undo excess work
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            mask = (X[i] & Q) != 0
            X[0] = np.where(mask, X[0] ^ P, X[0])
            t = np.where(~mask, (X[0] ^ X[i]) & P, 0)
            X[0] ^= t
            X[i] ^= t
        Q >>= 1
    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > 1:
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    # interleave transpose bits: X[0] contributes the highest bit of each
    # 3-bit group
    h = np.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> b) & 1)
    return h


def _hilbert_self_test():
    bits = 3
    side = 1 << bits
    g = np.arange(side)
    ix, iy, iz = np.meshgrid(g, g, g, indexing="ij")
    h = hilbert_index(ix.ravel(), iy.ravel(), iz.ravel(), bits)
    assert sorted(h) == list(range(side**3)), "not a permutation"
    order = np.argsort(h)
    pts = np.stack([ix.ravel(), iy.ravel(), iz.ravel()], -1)[order]
    d = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    assert (d == 1).all(), "curve not continuous"


def span_stats(rank_of_point, nn_idx):
    """rank_of_point: [N] rank of point i under the order; nn_idx: [N, k]
    true-neighbor indices.  Returns per-query max rank distance."""
    q = rank_of_point[:, None]
    nb = rank_of_point[nn_idx]
    return np.abs(nb - q).max(axis=1)


def analyze(name, pts, leaf, k, bands):
    ijk = np.floor(pts / leaf).astype(np.int64)
    ijk -= ijk.min(axis=0)
    dims = ijk.max(axis=0) + 1
    n = len(pts)
    print(f"\n== {name}: {n} pts, lattice dims {dims.tolist()} ==", flush=True)

    tree = cKDTree(pts)
    _, nn = tree.query(pts, k=k + 1, workers=-1)
    nn = nn[:, 1:]  # drop self

    orders = {}
    lat = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    orders["lattice"] = lat
    bits = int(dims.max() - 1).bit_length()
    orders["hilbert"] = hilbert_index(ijk[:, 0], ijk[:, 1], ijk[:, 2], bits)
    # morton for context (known bad)
    m = np.zeros(n, np.int64)
    for b in range(bits):
        for a in range(3):
            m |= ((ijk[:, a] >> b) & 1) << (3 * b + (2 - a))
    orders["morton"] = m

    for oname, key in orders.items():
        order = np.argsort(key, kind="stable")
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        spans = span_stats(rank, nn)
        qs = np.percentile(spans, [50, 90, 99, 99.9, 100])
        cover = {b: float((spans <= b).mean()) for b in bands}
        cov = " ".join(f"B{b}:{100*c:.2f}%" for b, c in cover.items())
        print(
            f"[{oname:8s}] span p50={qs[0]:.0f} p90={qs[1]:.0f} "
            f"p99={qs[2]:.0f} p99.9={qs[3]:.0f} max={qs[4]:.0f} | covered {cov}",
            flush=True,
        )


def main():
    _hilbert_self_test()
    print("hilbert self-test ok", flush=True)

    from pointcloud_obstacle_processing_tpu.models import (
        FLAGSHIP_CONFIG,
        REFERENCE_FULLSCALE_CONFIG,
    )
    from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene
    from tests.oracle import voxel_downsample as voxel_downsample_oracle

    # flagship shape
    cfg = FLAGSHIP_CONFIG
    spec = SceneSpec(n_ground=90_000, n_rocks=4, points_per_rock=2_000, n_noise=500)
    pts = make_scene(seed=0, spec=spec).points[: cfg.max_points]
    box = (
        (pts[:, 0] >= cfg.x_min) & (pts[:, 0] <= cfg.x_max)
        & (pts[:, 1] >= cfg.y_min) & (pts[:, 1] <= cfg.y_max)
        & (pts[:, 2] >= cfg.z_min) & (pts[:, 2] <= cfg.z_max)
    )
    cents = voxel_downsample_oracle(pts[box], cfg.downsample_leaf_size)
    analyze(
        "flagship leaf 0.04", cents, cfg.downsample_leaf_size,
        cfg.statistical_outlier_mean_k, bands=(128, 256, 384, 512, 768),
    )

    # fullscale shape
    fcfg = REFERENCE_FULLSCALE_CONFIG
    fspec = SceneSpec(n_ground=230_000, n_rocks=6, points_per_rock=3_000, n_noise=2_000)
    base = make_scene(seed=100, spec=fspec).points
    rng = np.random.default_rng(7)
    parts = [base + rng.normal(0, 0.003, base.shape).astype(np.float32) for _ in range(8)]
    fpts = np.concatenate(parts)[: fcfg.max_points]
    box = (
        (fpts[:, 0] >= fcfg.x_min) & (fpts[:, 0] <= fcfg.x_max)
        & (fpts[:, 1] >= fcfg.y_min) & (fpts[:, 1] <= fcfg.y_max)
        & (fpts[:, 2] >= fcfg.z_min) & (fpts[:, 2] <= fcfg.z_max)
    )
    cents = voxel_downsample_oracle(fpts[box], fcfg.downsample_leaf_size)
    analyze(
        "fullscale leaf 0.015", cents, fcfg.downsample_leaf_size,
        fcfg.statistical_outlier_mean_k,
        bands=(512, 640, 1024, 1280, 1792, 2560),
    )


if __name__ == "__main__":
    main()
