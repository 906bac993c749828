"""Degenerate-input robustness (SURVEY.md §5 failure-detection parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_obstacle_processing_tpu import Cloud, PipelineConfig, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.pipeline import jit_pipeline

CFG = REFERENCE_YAML_CONFIG.replace(
    max_points=4096, max_voxels=1024, cluster_capacity=256, max_clusters=8,
    downsample_leaf_size=0.1,
)


def _run(pts, valid=None):
    cloud = (
        Cloud.pad_to(pts, CFG.max_points)
        if valid is None
        else Cloud.from_points(pts, valid)
    )
    return jit_pipeline(CFG)(cloud, jax.random.PRNGKey(0))


def test_empty_cloud():
    r = _run(np.zeros((0, 3), np.float32))
    s = r.stats
    assert int(s.cropped_points) == 0
    assert int(s.num_planes) == 0
    assert int(s.num_clusters) == 0
    grid = np.asarray(r.grid.data)
    assert grid.shape == (CFG.grid_height, CFG.grid_width)
    # no points: every row average is 0, so no holes are flagged (cpp:258
    # comparison is strict <; 0 < 0*x is false)
    assert (grid == 0).all()


def test_all_nan():
    pts = np.full((1000, 3), np.nan, np.float32)
    r = _run(pts)
    assert int(r.stats.cropped_points) == 0
    assert int(r.stats.num_clusters) == 0


def test_all_out_of_bounds():
    pts = np.full((1000, 3), 99.0, np.float32)
    r = _run(pts)
    assert int(r.stats.cropped_points) == 0


def test_single_voxel_cloud():
    # everything lands in one voxel -> 1 voxel, no plane, one tiny cluster
    rng = np.random.default_rng(0)
    pts = (np.array([2.0, 2.0, 0.1]) + rng.normal(0, 0.005, (500, 3))).astype(np.float32)
    r = _run(pts)
    assert int(r.stats.voxel_points) >= 1
    assert int(r.stats.voxel_points) <= 8  # a few leaves at most


def test_cpp_default_crop_rejects_everything():
    # the C++ defaults have z_min=0 > z_max=-0.5 (cpp:952-953): every point
    # fails the z gate unless YAML overrides — reproduce that quirk
    cfg = PipelineConfig().replace(
        max_points=1024, max_voxels=256, cluster_capacity=64, max_clusters=4
    )
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    r = jit_pipeline(cfg)(Cloud.pad_to(pts, cfg.max_points), jax.random.PRNGKey(0))
    assert int(r.stats.cropped_points) == 0


def test_validate_rejects_bad_config():
    with pytest.raises(ValueError):
        REFERENCE_YAML_CONFIG.replace(max_voxels=1001).validate()  # not /8
    with pytest.raises(ValueError):
        REFERENCE_YAML_CONFIG.replace(x_min=5.0, x_max=1.0).validate()


def test_plane_only_scene():
    # pure ground plane: everything is plane inliers, nothing to cluster
    rng = np.random.default_rng(1)
    pts = np.stack(
        [
            rng.uniform(0, 4.5, 3000),
            rng.uniform(0, 3.78, 3000),
            rng.normal(0, 0.005, 3000),
        ],
        axis=1,
    ).astype(np.float32)
    r = _run(pts)
    assert int(r.stats.num_planes) >= 1
    assert int(r.stats.num_clusters) == 0
    # the 30%-remaining rule means <= 30% of the cloud survives
    assert int(r.stats.nonplane_points) <= 0.35 * int(r.stats.inlier_points)


def test_cluster_capacity_overflow_is_observable(rng):
    """More non-plane points than cluster_capacity: the compaction truncates,
    and stats.cluster_overflow must say so (VERDICT r1 weak #4)."""
    cfg = CFG.replace(cluster_capacity=32)
    # a tall dense box of points: no dominant plane, lots of non-plane points
    pts = rng.uniform(0.5, 1.5, size=(1500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.4, 0.2, size=1500)
    r = jit_pipeline(cfg)(Cloud.pad_to(pts, cfg.max_points), jax.random.PRNGKey(0))
    s = r.stats
    if int(s.nonplane_points) > cfg.cluster_capacity:
        assert bool(s.cluster_overflow)
        # the debug nonplane cloud still carries every surviving point
        assert int(r.nonplane_cloud.count()) == int(s.nonplane_points)
    else:  # RANSAC swallowed the box: force the assertion the direct way
        from pointcloud_obstacle_processing_tpu.ops.compaction import compact

        big = Cloud.from_points(np.zeros((64, 3), np.float32))
        assert bool(compact(big, 32).overflow)


def test_wide_cluster_shadow_sweep_is_complete(rng):
    """The shadow sweep has NO static line bound: a wide (~1.5 m, 43 sweep
    lines at the reference block size — beyond the old 32-line cap)
    cluster's shadow must match the reference's unbounded per-line loop
    (cpp:650-669) exactly — the closed-form union rasterizer replaces the
    old shadow_max_lines truncation (VERDICT r2 weak #2).  The cluster is
    sized so the whole sweep stays in-grid: out-of-grid columns hit the
    C++ flat-index row-wrap, a documented deliberate deviation
    (docs/PARITY.md) where we drop instead of wrapping."""
    import oracle
    from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
    from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
    from pointcloud_obstacle_processing_tpu.types import ClusterSet

    cfg = CFG.replace(grid_opacity=50)
    # A pose whose sensor y axis (the reference's width axis, cpp:612-620)
    # aligns with world y, so the slab's 2.8 m world-y extent drives the
    # ceil(width/block)+3 = 78-line sweep: sensor at the arena edge,
    # looking +x, rolled so sensor-x is world -z.
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = [0.0, 0.0, -1.0]  # sensor x (right)
    m[:3, 1] = [0.0, 1.0, 0.0]  # sensor y (width axis)
    m[:3, 2] = [1.0, 0.0, 0.0]  # sensor z (view ray)
    m[:3, 3] = [-0.2, 1.9, 1.5]
    tf = RigidTransform.from_matrix(m)

    # one wide, flat obstacle slab: ~1.5 m wide in y, centered in the arena
    rock = np.stack(
        [
            rng.normal(2.5, 0.05, 400),
            rng.uniform(1.15, 2.65, 400),
            rng.normal(0.0, 0.03, 400),
        ],
        axis=1,
    ).astype(np.float32)
    cap = 512
    cloud = Cloud.pad_to(rock, cap)
    pc = np.full(cap, -1, np.int32)
    pc[: len(rock)] = 0
    clusters = ClusterSet(
        point_cluster=jnp.asarray(pc),
        sizes=jnp.asarray(np.array([len(rock), 0, 0, 0], np.int32)),
        valid=jnp.asarray(np.array([True, False, False, False])),
        num_clusters=jnp.int32(1),
    )
    grid0 = np.zeros((cfg.grid_height, cfg.grid_width), np.int8)
    res = jax.jit(lambda g, c, cl, t: cast_shadows(g, c, cl, t, cfg))(
        jnp.asarray(grid0), cloud, clusters, tf
    )
    got = np.asarray(res.grid)

    want = oracle.handle_shadow_casting(
        rock.astype(np.float64), m, grid0.copy(), cfg
    )
    # sanity: this sweep really is wider than the old 32-line cap — the
    # painted band must span more than 36 grid columns
    assert int(np.ceil(1.5 / cfg.block_size)) + 3 > 32 + 3
    cols_painted = np.nonzero(want)[1]
    assert cols_painted.size > 100, "oracle must paint a wide shadow band"
    assert cols_painted.max() - cols_painted.min() > 36
    mismatch = np.mean(got != want)
    # float32 device vs float64 oracle: only ~cell-boundary rounding differs
    assert mismatch < 0.005, f"{mismatch:.4%} cells differ"
    assert (got != 0).sum() > 0.95 * (want != 0).sum()


def test_voxel_overflow_is_observable_in_pipeline(rng):
    """Overflowing max_voxels must surface in stats.voxel_overflow (and
    from there in node metrics) instead of a silently clamped count
    (VERDICT r2 weak #3)."""
    cfg = CFG.replace(max_voxels=64)  # tiny cap: any real scene overflows
    pts = np.stack(
        [
            rng.uniform(0.2, 4.3, 4000),
            rng.uniform(0.2, 3.6, 4000),
            rng.uniform(-0.45, 0.2, 4000),
        ],
        axis=1,
    ).astype(np.float32)
    r = jit_pipeline(cfg)(Cloud.pad_to(pts, cfg.max_points), jax.random.PRNGKey(0))
    assert bool(r.stats.voxel_overflow)
    assert int(r.stats.voxel_points) == cfg.max_voxels
    # an adequate capacity does not flag (this uniform scene occupies
    # ~3.3k voxels at leaf 0.1 — beyond the test CFG's tight 1024 cap)
    cfg2 = CFG.replace(max_voxels=4096)
    r2 = jit_pipeline(cfg2)(Cloud.pad_to(pts, cfg2.max_points), jax.random.PRNGKey(0))
    assert not bool(r2.stats.voxel_overflow)


def test_planes_truncated_is_observable(rng):
    """When max_planes stops the loop while >30% of points remain and the
    last round still found a plane, stats.planes_truncated must flag the
    divergence from the reference's unbounded loop (cpp:379-387)."""
    # a staircase of large horizontal planes: every round finds one.
    # Interleaved (shuffled) so any capacity truncation keeps all layers.
    layers = []
    for i in range(5):
        n = 800
        layers.append(
            np.stack(
                [
                    rng.uniform(0.2, 4.3, n),
                    rng.uniform(0.2, 3.6, n),
                    np.full(n, -0.45 + 0.12 * i) + rng.normal(0, 0.002, n),
                ],
                axis=1,
            )
        )
    pts = np.concatenate(layers).astype(np.float32)
    pts = pts[rng.permutation(len(pts))]
    cfg = CFG.replace(max_planes=1, downsample_input_data=False)
    r = jit_pipeline(cfg)(Cloud.pad_to(pts, cfg.max_points), jax.random.PRNGKey(0))
    assert int(r.stats.num_planes) == 1
    assert bool(r.stats.planes_truncated)
    # with headroom the loop exits on its own terms (<=30% remaining or no
    # plane found) and must not flag
    cfg2 = CFG.replace(max_planes=8, downsample_input_data=False)
    r2 = jit_pipeline(cfg2)(Cloud.pad_to(pts, cfg2.max_points), jax.random.PRNGKey(0))
    assert not bool(r2.stats.planes_truncated)
