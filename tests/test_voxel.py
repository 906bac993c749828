import jax
import numpy as np
import pytest

import oracle
from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_downsample
from pointcloud_obstacle_processing_tpu.utils.scene import make_scene


def _sorted_rows(a, leaf=None):
    """Sort rows for comparison.  With `leaf`, sort by the (exact) integer
    voxel key each centroid belongs to — centroid coords themselves can
    differ by float summation order, which would make a coordinate lexsort
    pair rows up wrongly."""
    a = np.asarray(a)
    if leaf is not None:
        k = np.floor(a / np.float32(leaf)).astype(np.int64)
        return a[np.lexsort((k[:, 2], k[:, 1], k[:, 0]))]
    return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]


def test_voxel_matches_oracle(rng):
    pts = rng.uniform(-2, 2, size=(5000, 3)).astype(np.float32)
    cloud = Cloud.pad_to(pts, 8192)
    res = jax.jit(lambda c: voxel_downsample(c, 0.25, 4096))(cloud)

    want = oracle.voxel_downsample(pts, 0.25)
    n = int(res.num_voxels)
    assert n == len(want)
    assert not bool(res.overflow)
    got = np.asarray(res.cloud.points)[np.asarray(res.cloud.valid)]
    np.testing.assert_allclose(_sorted_rows(got, 0.25), _sorted_rows(want, 0.25), atol=1e-4)


def test_voxel_with_invalid_and_nan(rng):
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    pts[10] = np.nan
    valid = np.ones(100, bool)
    valid[50:] = False
    cloud = Cloud.from_points(pts, valid)
    res = voxel_downsample(cloud, 0.1, 128)
    want = oracle.voxel_downsample(pts[:50][np.arange(50) != 10], 0.1)
    assert int(res.num_voxels) == len(want)
    got = np.asarray(res.cloud.points)[np.asarray(res.cloud.valid)]
    np.testing.assert_allclose(_sorted_rows(got, 0.1), _sorted_rows(want, 0.1), atol=1e-5)


def test_voxel_overflow_drops_extras(rng):
    pts = rng.uniform(0, 10, size=(512, 3)).astype(np.float32)
    cloud = Cloud.pad_to(pts, 512)
    res = voxel_downsample(cloud, 0.01, 64)  # tiny leaves: every point its own voxel
    assert bool(res.overflow)
    assert int(res.cloud.count()) == 64
    assert int(res.num_voxels) >= 64


def test_voxel_empty():
    cloud = Cloud(points=np.zeros((64, 3), np.float32), valid=np.zeros(64, bool))
    res = voxel_downsample(cloud, 0.1, 32)
    assert int(res.num_voxels) == 0
    assert int(res.cloud.count()) == 0


def test_voxel_negative_coords():
    # floor() binning on absolute coords: -0.01 and +0.01 are different leaves
    pts = np.array([[-0.01, 0, 0], [0.01, 0, 0], [-0.02, 0, 0]], np.float32)
    res = voxel_downsample(Cloud.pad_to(pts, 8), 0.1, 8)
    assert int(res.num_voxels) == 2
    got = _sorted_rows(np.asarray(res.cloud.points)[np.asarray(res.cloud.valid)], 0.1)
    want = _sorted_rows(oracle.voxel_downsample(pts, 0.1), 0.1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_voxel_bounded_paths_match_oracle(rng):
    """All three binning paths (MXU matmul, dense scatter, 3-key sort) must
    produce identical voxel sets."""
    pts = rng.uniform([0, 0, -0.5], [4.5, 3.78, 0.25], size=(4000, 3)).astype(np.float32)
    cloud = Cloud.pad_to(pts, 4096)
    bounds = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))
    for leaf in (0.06, 0.02):  # 0.06 -> MXU path (K~60k); 0.02 -> scatter (K~1.7M)
        want = oracle.voxel_downsample(pts, leaf)
        res_b = voxel_downsample(cloud, leaf, 4096, bounds)
        res_s = voxel_downsample(cloud, leaf, 4096)  # sort fallback
        assert int(res_b.num_voxels) == len(want), leaf
        assert int(res_s.num_voxels) == len(want), leaf
        got_b = np.asarray(res_b.cloud.points)[np.asarray(res_b.cloud.valid)]
        got_s = np.asarray(res_s.cloud.points)[np.asarray(res_s.cloud.valid)]
        np.testing.assert_allclose(
            _sorted_rows(got_b, leaf), _sorted_rows(want, leaf), atol=1e-4
        )
        np.testing.assert_allclose(
            _sorted_rows(got_s, leaf), _sorted_rows(want, leaf), atol=1e-4
        )


def test_voxel_payload_packing_matches_oracle(rng):
    """The packed-payload sort path (x|y/z offsets as 16-bit fixed point)
    must keep voxel SET semantics exact (keys/counts) and centroids within
    one quantum (= leaf/65536) of the unpacked engine and the oracle."""
    pts = rng.uniform([0, 0, -0.5], [4.5, 3.78, 0.25], size=(4000, 3)).astype(
        np.float32
    )
    cloud = Cloud.pad_to(pts, 4096)
    bounds = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))
    leaf = 0.06
    want = oracle.voxel_downsample(pts, leaf)
    res_p = jax.jit(
        lambda c: voxel_downsample(
            c, leaf, 4096, bounds, payload_packing=True
        )
    )(cloud)
    res_u = voxel_downsample(cloud, leaf, 4096, bounds)
    assert int(res_p.num_voxels) == int(res_u.num_voxels) == len(want)
    got_p = np.asarray(res_p.cloud.points)[np.asarray(res_p.cloud.valid)]
    got_u = np.asarray(res_u.cloud.points)[np.asarray(res_u.cloud.valid)]
    quantum = leaf / 65536.0
    np.testing.assert_allclose(
        _sorted_rows(got_p, leaf), _sorted_rows(got_u, leaf),
        atol=2 * quantum,
    )
    np.testing.assert_allclose(
        _sorted_rows(got_p, leaf), _sorted_rows(want, leaf), atol=1e-4
    )


def test_voxel_payload_packing_requires_sort_engine():
    cloud = Cloud(points=np.zeros((100, 3), np.float32), valid=np.zeros(100, bool))
    with pytest.raises(ValueError, match="payload packing"):
        # capacity 100 is not a multiple of 128 => sort engine unavailable
        voxel_downsample(cloud, 0.1, 32, payload_packing=True)


def test_explicit_engine_requests_never_silently_substitute():
    """An EXPLICIT binning= request must run the engine it names or raise
    (review r5d finding #1): silent substitution changes sum-precision
    semantics.  Only 'auto' may fall through between engines."""
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_partials

    cloud = Cloud(
        points=np.zeros((128, 3), np.float32), valid=np.zeros(128, bool)
    )
    # unknown engine string
    with pytest.raises(ValueError, match="unknown voxel binning"):
        voxel_partials(cloud, 0.1, 128, bounds=None, binning="Sort")
    # explicit dense engines without packable bounds
    for eng in ("mxu", "scatter"):
        with pytest.raises(ValueError, match="packable bounds"):
            voxel_partials(cloud, 0.1, 128, bounds=None, binning=eng)
    # explicit mxu beyond its one-hot bin ceiling (0.015 leaf over the
    # full crop box: ~3.9M bins >> 2^19)
    big_bounds = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))
    with pytest.raises(ValueError, match="one-hot bins"):
        voxel_partials(cloud, 0.015, 128, bounds=big_bounds, binning="mxu")
    # 'auto' still falls through to the unbounded fallback without error
    out = voxel_partials(cloud, 0.1, 128, bounds=None, binning="auto")
    assert int(out.num_voxels) == 0


def test_voxel_scene_reduces_ground(rng):
    scene = make_scene(seed=1)
    cloud = Cloud.pad_to(scene.points, 131072)
    res = jax.jit(lambda c: voxel_downsample(c, 0.05, 16384))(cloud)
    n = int(res.num_voxels)
    assert 0 < n <= 16384
    want = oracle.voxel_downsample(scene.points, 0.05)
    assert n == len(want)


def test_merge_partials_sort_free_matches_sort(rng):
    """The bounded dense-bin merge (the SP path's sort-free reduction) must
    produce exactly the sort fallback's table (VERDICT r1 weak #3)."""
    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        VoxelPartials,
        merge_voxel_partials,
        voxel_partials,
    )

    bounds = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))
    leaf = 0.05
    # two overlapping "shard" clouds => duplicate keys across tables
    pts1 = rng.uniform([0, 0, -0.5], [4.5, 3.78, 0.25], (4000, 3)).astype(np.float32)
    pts2 = pts1 + rng.normal(0, 0.02, pts1.shape).astype(np.float32)
    pts2 = np.clip(pts2, [0, 0, -0.5], [4.49, 3.77, 0.249]).astype(np.float32)
    p1 = voxel_partials(Cloud.pad_to(pts1, 4096), leaf, 4096, bounds)
    p2 = voxel_partials(Cloud.pad_to(pts2, 4096), leaf, 4096, bounds)
    cat = VoxelPartials(
        keys=np.concatenate([np.asarray(p1.keys), np.asarray(p2.keys)]),
        sums=np.concatenate([np.asarray(p1.sums), np.asarray(p2.sums)]),
        counts=np.concatenate([np.asarray(p1.counts), np.asarray(p2.counts)]),
        num_voxels=p1.num_voxels,
        overflow=p1.overflow,
    )
    dense = merge_voxel_partials(cat, 8192, bounds=bounds, leaf_size=leaf)
    sorted_ = merge_voxel_partials(cat, 8192)  # lax.sort fallback
    assert int(dense.num_voxels) == int(sorted_.num_voxels)
    np.testing.assert_array_equal(np.asarray(dense.keys), np.asarray(sorted_.keys))
    np.testing.assert_array_equal(np.asarray(dense.counts), np.asarray(sorted_.counts))
    np.testing.assert_allclose(
        np.asarray(dense.sums), np.asarray(sorted_.sums), rtol=1e-6, atol=1e-6
    )


def test_voxel_output_is_ascending_lattice_order(rng):
    """The banded kNN engine and the cluster stage's monotone-x envelope
    windows REQUIRE the voxel cloud in ascending packed (ix, iy, iz) key
    order (ops/outliers.py knn_backend='banded'; ops/cluster.py
    cluster_band_window) — pin the emission order on every engine and
    payload layout, not just the voxel SET."""
    pts = rng.uniform([0, 0, -0.5], [4.5, 3.78, 0.25], size=(4000, 3)).astype(
        np.float32
    )
    cloud = Cloud.pad_to(pts, 4096)
    bounds = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))
    leaf = 0.06
    variants = {
        "sort": dict(bounds=bounds, binning="sort"),
        "sort_packed": dict(bounds=bounds, binning="sort", payload_packing=True),
        "mxu": dict(bounds=bounds, binning="mxu"),
        "scatter": dict(bounds=bounds, binning="scatter"),
        "unbounded_3key": dict(),
    }
    for name, kw in variants.items():
        res = jax.jit(
            lambda c, kw=kw: voxel_downsample(c, leaf, 4096, **kw)
        )(cloud)
        got = np.asarray(res.cloud.points)[np.asarray(res.cloud.valid)]
        k = np.floor(got / np.float32(leaf)).astype(np.int64)
        packed = (k[:, 0] * (1 << 20)) + (k[:, 1] * (1 << 10)) + k[:, 2]
        assert (np.diff(packed) > 0).all(), f"{name}: not ascending lattice order"


def test_merge_partials_large_table_sort_path_matches_densebin(rng, monkeypatch):
    """The large-table merge path (packed 1-key sort + run-reduce; the
    fullscale SP gather takes it — scripts/tpu_experiments66.py priced the
    dense-bin scatter at 93.8 vs 12.9 ms there) must produce the dense-bin
    path's table: identical keys/counts/num (counts are integer-valued f32,
    exact in any summation order), coordinate sums to f32 tolerance (the
    two paths sum runs in different orders; the sort path is FULL f32 —
    tighter than dense fast-mode's bf16 corner-relative terms)."""
    import pointcloud_obstacle_processing_tpu.ops.voxel as voxel_mod
    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        VoxelPartials,
        merge_voxel_partials,
        voxel_partials,
    )

    bounds = ((0.0, 0.0, -0.5), (4.5, 3.78, 0.25))
    leaf = 0.05
    pts1 = rng.uniform([0, 0, -0.5], [4.5, 3.78, 0.25], (4000, 3)).astype(np.float32)
    pts2 = pts1 + rng.normal(0, 0.02, pts1.shape).astype(np.float32)
    pts2 = np.clip(pts2, [0, 0, -0.5], [4.49, 3.77, 0.249]).astype(np.float32)
    p1 = voxel_partials(Cloud.pad_to(pts1, 4096), leaf, 4096, bounds)
    p2 = voxel_partials(Cloud.pad_to(pts2, 4096), leaf, 4096, bounds)
    cat = VoxelPartials(
        keys=np.concatenate([np.asarray(p1.keys), np.asarray(p2.keys)]),
        sums=np.concatenate([np.asarray(p1.sums), np.asarray(p2.sums)]),
        counts=np.concatenate([np.asarray(p1.counts), np.asarray(p2.counts)]),
        num_voxels=p1.num_voxels,
        overflow=p1.overflow,
    )
    dense = merge_voxel_partials(cat, 8192, bounds=bounds, leaf_size=leaf)
    # force the large-table threshold down so the same small table takes
    # the sort path (8192 rows >= 64)
    monkeypatch.setattr(voxel_mod, "_SORT_MERGE_MIN_ROWS", 64)
    sortp = merge_voxel_partials(cat, 8192, bounds=bounds, leaf_size=leaf)
    assert int(dense.num_voxels) == int(sortp.num_voxels)
    np.testing.assert_array_equal(np.asarray(dense.keys), np.asarray(sortp.keys))
    np.testing.assert_array_equal(np.asarray(dense.counts), np.asarray(sortp.counts))
    np.testing.assert_allclose(
        np.asarray(dense.sums), np.asarray(sortp.sums), rtol=1e-5, atol=1e-5
    )
