"""Multi-chip layout tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.parallel.sharding import (
    batched_pipeline,
    data_parallel_pipeline,
    dp_sp_pipeline,
    make_mesh,
)
from pointcloud_obstacle_processing_tpu.pipeline import process_scan
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

CFG = REFERENCE_YAML_CONFIG.replace(
    max_points=8192,
    max_voxels=2048,
    cluster_capacity=512,
    max_clusters=8,
    downsample_leaf_size=0.1,
)

SPEC = SceneSpec(n_ground=6000, n_rocks=2, points_per_rock=400, n_noise=80)


def _batch(bs, seed0=0):
    pts = np.zeros((bs, CFG.max_points, 3), np.float32)
    valid = np.zeros((bs, CFG.max_points), bool)
    for i in range(bs):
        p = make_scene(seed=seed0 + i, spec=SPEC).points[: CFG.max_points]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    return Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))


@pytest.mark.slow  # ~150 s; dryrun_multichip mesh 1 asserts pure-DP
# bit-equality vs single device on every round's MULTICHIP artifact
def test_data_parallel_matches_single(rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh({"data": 8})
    clouds = _batch(8)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    fn = data_parallel_pipeline(CFG, mesh)
    out = fn(clouds, keys)
    for i in (0, 3, 7):
        single = jax.jit(lambda c, k: process_scan(c, k, CFG))(
            jax.tree_util.tree_map(lambda x: x[i], clouds), keys[i]
        )
        np.testing.assert_array_equal(
            np.asarray(out.grid.data[i]), np.asarray(single.grid.data)
        )
        np.testing.assert_array_equal(
            np.asarray(out.clusters.point_cluster[i]),
            np.asarray(single.clusters.point_cluster),
        )


def test_point_sharded_matches_single(rng):
    mesh = make_mesh({"data": 1, "points": 8})
    clouds = _batch(1)
    keys = jax.random.split(jax.random.PRNGKey(1), 1)
    fn = dp_sp_pipeline(CFG, mesh)
    out = fn(clouds, keys)

    single = jax.jit(lambda c, k: process_scan(c, k, CFG))(
        jax.tree_util.tree_map(lambda x: x[0], clouds), keys[0]
    )
    # histogram/hole grid must be exactly equal; voxel centroids can differ
    # by float summation order across shards, which may perturb RANSAC's
    # inlier boundary — compare the structural outputs.
    np.testing.assert_array_equal(
        np.asarray(out.stats.cropped_points[0]), np.asarray(single.stats.cropped_points)
    )
    assert int(out.stats.voxel_points[0]) == int(single.stats.voxel_points)
    got_grid = np.asarray(out.grid.data[0])
    want_grid = np.asarray(single.grid.data)
    assert np.mean(got_grid != want_grid) < 0.01
    assert int(out.clusters.num_clusters[0]) == int(single.clusters.num_clusters)
    got_c = np.asarray(out.centroids.points.xyzr[0])
    want_c = np.asarray(single.centroids.points.xyzr)
    np.testing.assert_allclose(got_c, want_c, atol=5e-2)


@pytest.mark.slow  # ~110 s; the 2x4 mesh stays covered per-commit by the
# bitwise post-voxel and distributed-merge 2x4 tests below (~60 s each)
def test_dp_sp_2x4(rng):
    mesh = make_mesh({"data": 2, "points": 4})
    clouds = _batch(2, seed0=5)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    fn = dp_sp_pipeline(CFG, mesh)
    out = fn(clouds, keys)
    assert out.grid.data.shape == (2, CFG.grid_height, CFG.grid_width)
    for i in range(2):
        single = jax.jit(lambda c, k: process_scan(c, k, CFG))(
            jax.tree_util.tree_map(lambda x: x[i], clouds), keys[i]
        )
        assert int(out.stats.cropped_points[i]) == int(single.stats.cropped_points)
        assert int(out.stats.voxel_points[i]) == int(single.stats.voxel_points)
        assert int(out.clusters.num_clusters[i]) == int(single.clusters.num_clusters)


def test_batched_pipeline_shapes(rng):
    clouds = _batch(4)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    out = batched_pipeline(CFG)(clouds, keys)
    assert out.grid.data.shape == (4, CFG.grid_height, CFG.grid_width)
    assert out.centroids.points.xyzr.shape == (4, CFG.max_clusters, 4)


@pytest.mark.slow
def test_point_sharded_fullscale_window(rng):
    """SP at the authentic fullscale shape (VERDICT r2 next #8): an 8-shard
    CPU mesh pushes a REFERENCE_FULLSCALE_CONFIG-shaped window (2M-point
    capacity, 0.015 leaf => 3.8M-bin lattice on the scatter merge path,
    262144-voxel table, 16384-point cluster stage) through dp_sp_pipeline
    end-to-end — the >HBM motivation path — and bounds its disagreement
    against the single-chip run like the small-scale test below."""
    from pointcloud_obstacle_processing_tpu.models import REFERENCE_FULLSCALE_CONFIG

    fcfg = REFERENCE_FULLSCALE_CONFIG
    assert fcfg.max_points == 2 * 1024 * 1024
    # a scaled scene (~0.4M valid points): shapes/capacities stay authentic,
    # the data volume keeps CPU runtime tractable
    spec = SceneSpec(n_ground=180_000, n_rocks=4, points_per_rock=2_000, n_noise=1_000)
    parts = [make_scene(seed=40 + i, spec=spec).points for i in range(2)]
    fpts = np.concatenate(parts)[: fcfg.max_points]
    pts = np.zeros((1, fcfg.max_points, 3), np.float32)
    valid = np.zeros((1, fcfg.max_points), bool)
    pts[0, : len(fpts)] = fpts
    valid[0, : len(fpts)] = True
    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(7), 1)

    mesh = make_mesh({"data": 1, "points": 8})
    out = dp_sp_pipeline(fcfg, mesh)(clouds, keys)

    single = jax.jit(lambda c, k: process_scan(c, k, fcfg))(
        jax.tree_util.tree_map(lambda x: x[0], clouds), keys[0]
    )
    assert int(out.stats.cropped_points[0]) == int(single.stats.cropped_points)
    assert int(out.stats.voxel_points[0]) == int(single.stats.voxel_points)
    assert not bool(out.stats.voxel_overflow[0])
    assert int(out.clusters.num_clusters[0]) == int(single.clusters.num_clusters)
    frac = float(np.mean(np.asarray(out.grid.data[0]) != np.asarray(single.grid.data)))
    print(f"fullscale SP grid disagreement: {frac:.5f}")
    assert frac < 0.01


@pytest.mark.slow  # ~160 s (three mesh compiles); the single-shard-count
# SP-vs-single contract stays in the not-slow set via
# test_point_sharded_matches_single
def test_point_shard_count_disagreement_scaling(rng):
    """Quantify float-summation-order disagreement on the point-sharded
    path as the shard count grows (VERDICT r1 weak #6): per-shard voxel
    sums merge in shard order, which can perturb RANSAC's inlier boundary
    and flip isolated grid cells.  The structural outputs must stay exact
    and the grid-cell disagreement bounded (and not blow up with shards)."""
    clouds = _batch(1, seed0=9)
    keys = jax.random.split(jax.random.PRNGKey(3), 1)
    single = jax.jit(lambda c, k: process_scan(c, k, CFG))(
        jax.tree_util.tree_map(lambda x: x[0], clouds), keys[0]
    )
    want_grid = np.asarray(single.grid.data)
    fracs = {}
    for shards in (2, 4, 8):
        mesh = make_mesh(
            {"data": 1, "points": shards}, devices=jax.devices()[:shards]
        )
        out = dp_sp_pipeline(CFG, mesh)(clouds, keys)
        assert int(out.stats.cropped_points[0]) == int(single.stats.cropped_points)
        assert int(out.stats.voxel_points[0]) == int(single.stats.voxel_points)
        assert int(out.clusters.num_clusters[0]) == int(
            single.clusters.num_clusters
        )
        fracs[shards] = float(np.mean(np.asarray(out.grid.data[0]) != want_grid))
    print(f"SP grid disagreement by shard count: {fracs}")
    assert all(f < 0.01 for f in fracs.values()), fracs
    # growing the shard count must not qualitatively degrade agreement
    assert fracs[8] <= max(fracs[2], fracs[4]) + 0.005, fracs


# A config whose banded kNN and banded cluster sweep actually BIND at toy
# scale (band < table; window < capacity) and shard evenly over 8 devices:
# kNN tiles = 2048/128 = 16 (2 per shard), cluster rows 1024 -> 128/shard
# (= the banded sweep's 128-row tile).
SHARD_CFG = CFG.replace(
    cluster_capacity=1024,
    knn_row_tile=128,
    knn_band=192,
    cluster_band_window=256,
)


def test_shard_post_voxel_bitwise_matches_replicated(rng):
    """Round 4 (VERDICT r3 missing #1): the distributed post-voxel stages
    — banded kNN query tiles and cluster sweep tiles split over the
    'points' axis — must be BITWISE equal to the replicated form on the
    same mesh: each query tile's program and operands are unchanged, only
    WHERE it runs moves (ops/outliers.py::knn_mean_distances,
    ops/cluster.py::_neighbor_min_sweep)."""
    mesh = make_mesh({"data": 1, "points": 8})
    clouds = _batch(1, seed0=3)
    keys = jax.random.split(jax.random.PRNGKey(4), 1)
    rep = dp_sp_pipeline(SHARD_CFG, mesh, shard_post_voxel=False)(clouds, keys)
    sh = dp_sp_pipeline(SHARD_CFG, mesh, shard_post_voxel=True)(clouds, keys)
    # every output leaf identical: grids, cluster labels, centroids, stats
    for a, b in zip(jax.tree_util.tree_leaves(rep), jax.tree_util.tree_leaves(sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(sh.clusters.num_clusters[0]) >= 1  # the scene has rocks


def test_shard_post_voxel_bitwise_matches_replicated_2x4(rng):
    """Same bitwise contract on the 2-D (data x points) mesh."""
    mesh = make_mesh({"data": 2, "points": 4})
    clouds = _batch(2, seed0=11)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    rep = dp_sp_pipeline(SHARD_CFG, mesh, shard_post_voxel=False)(clouds, keys)
    sh = dp_sp_pipeline(SHARD_CFG, mesh, shard_post_voxel=True)(clouds, keys)
    for a, b in zip(jax.tree_util.tree_leaves(rep), jax.tree_util.tree_leaves(sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shard_post_voxel_per_shard_work_drops(rng, monkeypatch):
    """The distribution must actually REMOVE work from each chip, not just
    reshuffle it (VERDICT r3 missing #1 'done' criterion).  XLA's
    cost_analysis cannot see it — it counts a while/scan BODY once,
    independent of trip count, so the replicated and sharded programs
    report near-identical flops — but the per-shard work is a static
    trace-time property: both heavy stages tile their query rows through
    ``lax.map``, whose leading operand dim IS the per-shard tile count.
    Record those lengths while tracing the per-device program: with 8
    shards the kNN map must run tiles/8 trips and the cluster sweep map
    rows/8 rows per shard — which, combined with the bitwise-equality
    test above (identical per-tile programs), is exactly 'per-shard
    compiled cost drops ~n_shards x on the post-voxel stages'."""
    import pointcloud_obstacle_processing_tpu.ops.cluster as cluster_mod
    import pointcloud_obstacle_processing_tpu.ops.outliers as outliers_mod

    mesh = make_mesh({"data": 1, "points": 8})
    clouds = _batch(1, seed0=3)
    keys = jax.random.split(jax.random.PRNGKey(4), 1)

    def record_maps(module, sink):
        real_lax = module.lax

        class LaxProxy:
            def __getattr__(self, name):
                return getattr(real_lax, name)

            @staticmethod
            def map(f, xs):
                sink.append(jax.tree_util.tree_leaves(xs)[0].shape[0])
                return real_lax.map(f, xs)

        monkeypatch.setattr(module, "lax", LaxProxy())
        return real_lax

    def trace_lengths(shard_post_voxel):
        knn_maps, sweep_maps = [], []
        real_o = record_maps(outliers_mod, knn_maps)
        real_c = record_maps(cluster_mod, sweep_maps)
        try:
            fn = dp_sp_pipeline(SHARD_CFG, mesh, shard_post_voxel=shard_post_voxel)
            fn.lower(clouds, keys)  # trace only — no compile needed
        finally:
            monkeypatch.setattr(outliers_mod, "lax", real_o)
            monkeypatch.setattr(cluster_mod, "lax", real_c)
        return knn_maps, sweep_maps

    knn_rep, sweep_rep = trace_lengths(False)
    knn_sh, sweep_sh = trace_lengths(True)

    tiles = SHARD_CFG.max_voxels // SHARD_CFG.knn_row_tile  # 16
    assert max(knn_rep) == tiles, knn_rep
    assert max(knn_sh) == tiles // 8, knn_sh  # 8x fewer kNN tiles per shard
    # cluster sweeps tile at 128 query rows (banded): 1024 -> 8 tiles
    # replicated, 1 tile per shard
    rows = SHARD_CFG.cluster_capacity
    assert max(sweep_rep) == rows // 128, sweep_rep
    assert max(sweep_sh) == rows // 128 // 8, sweep_sh
    print(
        f"per-shard map lengths: kNN {max(knn_rep)} -> {max(knn_sh)}, "
        f"cluster sweep {max(sweep_rep)} -> {max(sweep_sh)} (8 shards)"
    )


def test_distributed_merge_matches_replicated_merge(rng):
    """The key-range distributed merge (all_to_all range chunks +
    per-range sort/reduce + gather; round-5 target #1 landed early) must
    reproduce the replicated merge's table: keys/counts/num EXACT (same
    runs, integer-valued f32 counts), coordinate sums to f32
    re-association tolerance."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pointcloud_obstacle_processing_tpu.ops.voxel import (
        VoxelPartials,
        finalize_voxels,
        merge_voxel_partials,
        voxel_partials,
    )
    from pointcloud_obstacle_processing_tpu.parallel.sharding import (
        _distributed_merge,
    )

    # max_voxels roomy enough that the scene's ~2.8k distinct voxels
    # don't overflow the table (overflow semantics are covered separately)
    cfg = SHARD_CFG.replace(max_voxels=4096)
    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    mesh = make_mesh({"points": 8})
    clouds = _batch(1, seed0=6)
    pts = clouds.points[0].reshape(8, cfg.max_points // 8, 3)
    valid = clouds.valid[0].reshape(8, cfg.max_points // 8)

    def local_parts(p, v):
        return voxel_partials(
            Cloud(points=p, valid=v), cfg.downsample_leaf_size,
            cfg.max_voxels, bounds,
        )

    def body(p, v):
        parts = local_parts(p[0], v[0])
        return _distributed_merge(parts, cfg, "points", 8)

    dist = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("points"), P("points")),
            out_specs=P(),
            check_vma=False,
        )
    )(pts, valid)

    sp = jax.jit(jax.vmap(local_parts))(pts, valid)
    gathered = VoxelPartials(
        keys=np.asarray(sp.keys).reshape(-1, 3),
        sums=np.asarray(sp.sums).reshape(-1, 3),
        counts=np.asarray(sp.counts).reshape(-1),
        num_voxels=sp.num_voxels[0],
        overflow=sp.overflow[0],
    )
    rep = merge_voxel_partials(
        gathered, cfg.max_voxels, bounds=bounds,
        leaf_size=cfg.downsample_leaf_size,
    )

    assert int(dist.num_voxels) == int(rep.num_voxels)
    assert not bool(dist.overflow)
    n = int(rep.num_voxels)
    np.testing.assert_array_equal(
        np.asarray(dist.keys)[:n], np.asarray(rep.keys)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dist.counts)[:n], np.asarray(rep.counts)[:n]
    )
    np.testing.assert_allclose(
        np.asarray(dist.sums)[:n], np.asarray(rep.sums)[:n], rtol=1e-5, atol=1e-5
    )
    # and the finalized centroid clouds agree
    fd = finalize_voxels(dist)
    fr = finalize_voxels(rep)
    np.testing.assert_allclose(
        np.asarray(fd.cloud.points)[:n], np.asarray(fr.cloud.points)[:n],
        rtol=1e-5, atol=1e-5,
    )


def test_dp_sp_pipeline_with_distributed_merge(rng):
    """End-to-end SP with the key-range distributed merge (the round-5
    default in its measured-win regime; forced on here — the toy table is
    below the sort-merge threshold) stays inside the SP disagreement
    bounds vs the forced-replicated-merge SP run (structural outputs
    exact; isolated grid cells may flip with f32 sum re-association, like
    the existing shard-count scaling contract)."""
    mesh = make_mesh({"data": 1, "points": 8})
    clouds = _batch(1, seed0=7)
    keys = jax.random.split(jax.random.PRNGKey(9), 1)
    cfg = SHARD_CFG.replace(max_voxels=4096)  # scene fits: no voxel overflow
    rep = dp_sp_pipeline(cfg, mesh, distribute_merge=False)(clouds, keys)
    dm = dp_sp_pipeline(cfg, mesh, distribute_merge=True)(clouds, keys)
    assert int(dm.stats.voxel_points[0]) == int(rep.stats.voxel_points[0])
    assert not bool(dm.stats.voxel_overflow[0])
    assert int(dm.clusters.num_clusters[0]) == int(rep.clusters.num_clusters[0])
    frac = float(
        np.mean(np.asarray(dm.grid.data[0]) != np.asarray(rep.grid.data[0]))
    )
    assert frac < 0.01, frac


def test_dp_sp_2x4_with_distributed_merge(rng):
    """distribute_merge on the 2-D (data x points) mesh: the all_to_all /
    all_gather collectives run under the local-batch vmap — the layout a
    v5e-8 serving both axes uses."""
    mesh = make_mesh({"data": 2, "points": 4})
    clouds = _batch(2, seed0=13)
    keys = jax.random.split(jax.random.PRNGKey(11), 2)
    cfg = SHARD_CFG.replace(max_voxels=4096)
    rep = dp_sp_pipeline(cfg, mesh, distribute_merge=False)(clouds, keys)
    dm = dp_sp_pipeline(cfg, mesh, distribute_merge=True)(clouds, keys)
    for i in range(2):
        assert int(dm.stats.voxel_points[i]) == int(rep.stats.voxel_points[i])
        assert not bool(dm.stats.voxel_overflow[i])
        assert int(dm.clusters.num_clusters[i]) == int(rep.clusters.num_clusters[i])
        frac = float(
            np.mean(np.asarray(dm.grid.data[i]) != np.asarray(rep.grid.data[i]))
        )
        assert frac < 0.01, (i, frac)


def test_distribute_merge_default_gate(rng):
    """The distribute_merge=None default binds only in the measured-win
    regime: >2 shards AND a gathered table at the sort-merge threshold
    (review r5c finding #2: at S=2 the range sort covers the whole table,
    and small tables dense-scatter faster replicated).  Asserted at trace
    level: the distributed merge is the only all_to_all in the program."""
    from pointcloud_obstacle_processing_tpu.ops.voxel import _SORT_MERGE_MIN_ROWS

    clouds = _batch(1, seed0=3)
    keys = jax.random.split(jax.random.PRNGKey(4), 1)

    def has_all_to_all(cfg, mesh, **kw):
        txt = dp_sp_pipeline(cfg, mesh, **kw).lower(clouds, keys).as_text()
        return ("all_to_all" in txt) or ("all-to-all" in txt)

    mesh8 = make_mesh({"data": 1, "points": 8})
    # toy table (8 x 2048 rows << threshold): default stays replicated,
    # explicit True forces the distributed path
    assert not has_all_to_all(SHARD_CFG, mesh8)
    assert has_all_to_all(SHARD_CFG, mesh8, distribute_merge=True)
    # sort-scale table (8 x 65536 = 2^19 gathered rows): default ON
    big = SHARD_CFG.replace(max_voxels=_SORT_MERGE_MIN_ROWS // 8)
    assert has_all_to_all(big, mesh8)
    # S=2: zero work saved — default stays replicated even at sort scale
    mesh2 = make_mesh({"data": 4, "points": 2})
    big2 = SHARD_CFG.replace(max_voxels=_SORT_MERGE_MIN_ROWS // 2)
    clouds4 = _batch(4, seed0=3)
    keys4 = jax.random.split(jax.random.PRNGKey(4), 4)
    txt = dp_sp_pipeline(big2, mesh2).lower(clouds4, keys4).as_text()
    assert not (("all_to_all" in txt) or ("all-to-all" in txt))


def _slab_parts_fn(cfg, bounds):
    """Per-shard voxel partials for hand-crafted point sets (overflow
    forcing helpers below)."""
    from pointcloud_obstacle_processing_tpu.ops.voxel import voxel_partials

    def local_parts(p, v):
        return voxel_partials(
            Cloud(points=p, valid=v), cfg.downsample_leaf_size,
            cfg.max_voxels, bounds,
        )

    return local_parts


def _run_distributed_merge(cfg, pts, valid):
    """shard_map wrapper: pts [8, n, 3] / valid [8, n] -> merged partials."""
    from jax.sharding import PartitionSpec as P

    from pointcloud_obstacle_processing_tpu.parallel.sharding import (
        _distributed_merge,
    )

    bounds = ((cfg.x_min, cfg.y_min, cfg.z_min), (cfg.x_max, cfg.y_max, cfg.z_max))
    local_parts = _slab_parts_fn(cfg, bounds)
    mesh = make_mesh({"points": 8})

    def body(p, v):
        return _distributed_merge(local_parts(p[0], v[0]), cfg, "points", 8)

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("points"), P("points")),
            out_specs=P(),
            check_vma=False,
        )
    )(jnp.asarray(pts), jnp.asarray(valid))


def _voxel_grid_points(cfg, n_y, n_z, x=0.05, y0=0.0, z0=None):
    """One point per (y, z) voxel center in a single x-slab: n_y * n_z
    distinct voxels, all sharing one packed-key range."""
    leaf = cfg.downsample_leaf_size
    if z0 is None:
        z0 = cfg.z_min + leaf / 2
    ys = y0 + (np.arange(n_y) + 0.5) * leaf
    zs = z0 + np.arange(n_z) * leaf
    yy, zz = np.meshgrid(ys, zs, indexing="ij")
    pts = np.stack(
        [np.full(yy.size, x, np.float32), yy.ravel(), zz.ravel()], axis=-1
    ).astype(np.float32)
    return pts


def test_distributed_merge_chunk_overflow_is_observable(rng):
    """Skewed key distribution: every shard's voxels land in ONE key range
    (a narrow x-slab), each local table holding more rows in that range
    than the fixed all_to_all chunk capacity (2*max_voxels/S).  The merge
    must RAISE its overflow flag instead of silently truncating — the
    contract every other capacity knob has (VERDICT r4 weak #1)."""
    cfg = SHARD_CFG.replace(max_voxels=512)  # chunk_cap = 2*512/8 = 128
    leaf = cfg.downsample_leaf_size
    # each shard: >128 distinct voxels in the x=[0, leaf) slab (one range)
    n = cfg.max_points // 8
    pts = np.zeros((8, n, 3), np.float32)
    valid = np.zeros((8, n), bool)
    for s in range(8):
        p = _voxel_grid_points(cfg, n_y=30, n_z=6, x=leaf / 2)  # 180 voxels
        pts[s, : len(p)] = p
        valid[s, : len(p)] = True
    merged = _run_distributed_merge(cfg, pts, valid)
    assert bool(merged.overflow), "chunk overflow must raise the flag"


def test_distributed_merge_range_overflow_is_observable(rng):
    """Each shard's chunk FITS (disjoint voxel sets <= chunk_cap rows) but
    the union of one key range across shards exceeds the per-range merged
    capacity: the receiving shard's run-reduce must flag it."""
    cfg = SHARD_CFG.replace(max_voxels=512)  # chunk_cap = range_cap = 128
    leaf = cfg.downsample_leaf_size
    n = cfg.max_points // 8
    pts = np.zeros((8, n, 3), np.float32)
    valid = np.zeros((8, n), bool)
    # 8 shards x 28 DISJOINT voxels (distinct y rows per shard), all in the
    # x=[0, leaf) slab: per-shard chunk 28 <= 128 rows, union 224 > 128
    for s in range(8):
        p = _voxel_grid_points(cfg, n_y=4, n_z=7, x=leaf / 2, y0=s * 4 * leaf)
        pts[s, : len(p)] = p
        valid[s, : len(p)] = True
    merged = _run_distributed_merge(cfg, pts, valid)
    assert bool(merged.overflow), "range overflow must raise the flag"


def test_distributed_merge_overflow_reaches_pipeline_stats(rng):
    """The same skewed workload through the FULL SP pipeline with the
    distributed merge forced on: stats.voxel_overflow must be observable,
    and the forced-replicated run over the identical input must NOT flag
    — proving the flag comes from the distributed capacities, not the
    table size."""
    cfg = SHARD_CFG.replace(max_voxels=512)
    leaf = cfg.downsample_leaf_size
    mesh = make_mesh({"data": 1, "points": 8})
    # ~400 distinct voxels in one x-slab: below max_voxels (no table
    # overflow) but far above the 128-row chunk/range capacities
    base = _voxel_grid_points(cfg, n_y=36, n_z=7, x=leaf / 2)  # 252 voxels
    extra = _voxel_grid_points(cfg, n_y=36, n_z=4, x=3 * leaf / 2)  # 144 more
    allp = np.concatenate([base, extra])
    reps = int(np.ceil(cfg.max_points / len(allp)))
    tiled = np.tile(allp, (reps, 1))[: cfg.max_points]
    pts = tiled[None].astype(np.float32)
    valid = np.ones((1, cfg.max_points), bool)
    clouds = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    keys = jax.random.split(jax.random.PRNGKey(21), 1)

    dm = dp_sp_pipeline(cfg, mesh, distribute_merge=True)(clouds, keys)
    rep = dp_sp_pipeline(cfg, mesh, distribute_merge=False)(clouds, keys)
    assert not bool(rep.stats.voxel_overflow[0]), (
        "replicated merge fits: the table itself does not overflow"
    )
    assert bool(dm.stats.voxel_overflow[0]), (
        "distributed-merge chunk/range overflow must surface in "
        "stats.voxel_overflow"
    )
