"""Segmented inclusive scan + the sort-based voxel reduction path.

The scan is the heart of the default voxel engine (ops/voxel.py
``_sort_segment_partials``): after a stable key sort, per-voxel sums are
the scan values at run ends.  Oracle is a literal per-segment running sum.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_obstacle_processing_tpu.ops.segscan import (
    segmented_inclusive_scan,
)
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_partials
from pointcloud_obstacle_processing_tpu.types import Cloud

BOUNDS = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))


@pytest.mark.parametrize("n,c,density", [(128, 1, 0.1), (384, 3, 0.3), (1000, 4, 0.02)])
def test_segscan_matches_running_sum(n, c, density):
    rng = np.random.default_rng(n + c)
    v = rng.standard_normal((c, n)).astype(np.float32)
    h = rng.random(n) < density
    got = np.asarray(segmented_inclusive_scan(jnp.asarray(v), jnp.asarray(h)))
    exp = np.zeros_like(v)
    acc = np.zeros((c,), np.float64)
    for i in range(n):
        if h[i]:
            acc = np.zeros((c,), np.float64)
        acc = acc + v[:, i]
        exp[:, i] = acc
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_segscan_all_heads_and_no_heads():
    v = jnp.asarray(np.arange(1, 257, dtype=np.float32)[None, :])
    all_heads = jnp.ones((256,), bool)
    np.testing.assert_array_equal(
        np.asarray(segmented_inclusive_scan(v, all_heads)), np.asarray(v)
    )
    no_heads = jnp.zeros((256,), bool)
    got = np.asarray(segmented_inclusive_scan(v, no_heads))[0]
    np.testing.assert_allclose(got, np.cumsum(np.arange(1, 257)), rtol=1e-6)


def _random_cloud(rng, n, frac_valid=0.9):
    pts = np.stack(
        [rng.random(n) * 4.5, rng.random(n) * 3.78, rng.random(n) * 0.75 - 0.5],
        axis=-1,
    ).astype(np.float32)
    valid = rng.random(n) < frac_valid
    return pts, valid


@pytest.mark.parametrize("leaf,n,cap", [(0.04, 4096, 512), (0.1, 2048, 4096)])
def test_voxel_binning_paths_agree(leaf, n, cap):
    """sort (default), mxu, and scatter engines produce identical keys,
    counts, and voxel sets; sums agree to f32 accumulation noise."""
    rng = np.random.default_rng(int(leaf * 1000) + n)
    pts, valid = _random_cloud(rng, n)
    cloud = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    outs = {
        b: voxel_partials(cloud, leaf, cap, BOUNDS, "exact", b)
        for b in ("sort", "mxu", "scatter")
    }
    ref = outs["sort"]
    k = min(int(ref.num_voxels), cap)
    assert k > 0
    for name, o in outs.items():
        assert int(o.num_voxels) == int(ref.num_voxels), name
        assert np.array_equal(np.asarray(o.keys)[:k], np.asarray(ref.keys)[:k]), name
        assert np.array_equal(
            np.asarray(o.counts)[:k], np.asarray(ref.counts)[:k]
        ), name
        np.testing.assert_allclose(
            np.asarray(o.sums)[:k], np.asarray(ref.sums)[:k], atol=1e-4
        )


def test_sort_path_centroids_match_oracle():
    import collections

    rng = np.random.default_rng(3)
    n, cap, leaf = 4096, 4096, 0.04
    pts, valid = _random_cloud(rng, n)
    cloud = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    p = voxel_partials(cloud, leaf, cap, BOUNDS, "exact", "sort")

    occ = collections.defaultdict(list)
    for pt, v in zip(pts, valid):
        if v:
            occ[tuple(np.floor(pt / leaf).astype(int))].append(pt)
    # ascending packed (ix, iy, iz) order, same packing as the crop box
    import math

    imin = [math.floor(b / leaf) for b in BOUNDS[0]]
    imax = [math.floor(b / leaf) for b in BOUNDS[1]]
    dims = [b - a + 2 for a, b in zip(imin, imax)]
    keys_sorted = sorted(
        occ,
        key=lambda t: ((t[0] - imin[0]) * dims[1] + (t[1] - imin[1])) * dims[2]
        + (t[2] - imin[2]),
    )
    assert int(p.num_voxels) == len(keys_sorted)
    cents = np.array([np.mean(occ[t], axis=0) for t in keys_sorted])
    got = np.asarray(p.sums)[: len(cents)] / np.maximum(
        np.asarray(p.counts)[: len(cents), None], 1.0
    )
    np.testing.assert_allclose(got, cents, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(p.keys)[: len(cents)], np.array(keys_sorted)
    )


def test_sort_path_overflow_keeps_ascending_prefix():
    rng = np.random.default_rng(4)
    pts, valid = _random_cloud(rng, 4096)
    cloud = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    small = voxel_partials(cloud, 0.04, 128, BOUNDS, "exact", "sort")
    full = voxel_partials(cloud, 0.04, 4096, BOUNDS, "exact", "sort")
    assert bool(small.overflow)
    assert int(small.num_voxels) == int(full.num_voxels)
    np.testing.assert_array_equal(
        np.asarray(small.keys), np.asarray(full.keys)[:128]
    )
    np.testing.assert_array_equal(
        np.asarray(small.counts), np.asarray(full.counts)[:128]
    )


def test_morton_order_same_voxel_set():
    """voxel_order='morton' produces the same voxel set/counts/sums as
    lattice order, in ascending Z-curve rank; coords roundtrip exactly.
    (Kept as an ORDER option only: measured on v5e, Z-curve discontinuities
    make the banded kNN MISS 11-20% of neighbor sets vs lattice's 0.11%,
    so the flagship stays on lattice order — docs/PERFORMANCE.md.)"""
    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        _morton_decode,
        _morton_encode,
        _morton_schedule,
    )

    rng = np.random.default_rng(5)
    for dims in ([114, 96, 21], [301, 253, 51], [8, 8, 8]):
        sched, tb = _morton_schedule(dims)
        assert tb <= 24
        ix = jnp.asarray(rng.integers(0, dims[0], 500).astype(np.int32))
        iy = jnp.asarray(rng.integers(0, dims[1], 500).astype(np.int32))
        iz = jnp.asarray(rng.integers(0, dims[2], 500).astype(np.int32))
        code = _morton_encode(ix, iy, iz, sched)
        assert int(jnp.max(code)) < (1 << tb)
        dx, dy, dz = _morton_decode(code, sched)
        for got, exp in ((dx, ix), (dy, iy), (dz, iz)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    pts, valid = _random_cloud(rng, 4096)
    cloud = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    pl_ = voxel_partials(cloud, 0.04, 4096, BOUNDS, "exact", "sort", "lattice")
    pm = voxel_partials(cloud, 0.04, 4096, BOUNDS, "exact", "sort", "morton")
    n = int(pl_.num_voxels)
    assert n == int(pm.num_voxels)
    as_map = lambda p: {
        tuple(k): (c, tuple(s))
        for k, c, s in zip(
            np.asarray(p.keys)[:n], np.asarray(p.counts)[:n], np.asarray(p.sums)[:n]
        )
    }
    ml, mm = as_map(pl_), as_map(pm)
    assert ml.keys() == mm.keys()
    for k in ml:
        assert ml[k][0] == mm[k][0]
        np.testing.assert_allclose(ml[k][1], mm[k][1], atol=1e-5)
