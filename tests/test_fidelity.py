"""Full-pipeline fidelity vs the stage-chained NumPy/SciPy oracle.

BASELINE.json config #4 golden test: run the oracle pipeline
(crop -> voxel -> outlier -> multi-plane RANSAC -> clustering -> centroids)
and the device pipeline on the same scene and compare outputs stage by
stage.  RANSAC RNG streams differ by design, so inlier sets are compared
set-wise (SURVEY.md §7 hard part (c)) with a small disagreement budget for
threshold-boundary points.
"""

import jax
import numpy as np
import pytest

import oracle
from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.pipeline import jit_pipeline
from pointcloud_obstacle_processing_tpu.runtime.calibration import (
    load_calibration,
    save_calibration,
)
from pointcloud_obstacle_processing_tpu.utils.scene import SceneSpec, make_scene

CFG = REFERENCE_YAML_CONFIG.replace(
    max_points=32768,
    max_voxels=16384,
    cluster_capacity=2048,
    max_clusters=16,
    downsample_leaf_size=0.06,
    knn_backend="exact",  # bit-level PCL kNN semantics for the golden run
    # distinguishable shadow value (params.yaml ships 0 == free): makes every
    # final grid value attributable to exactly one writer — hole(100),
    # shadow(50), obstacle(100) — so the hole-fidelity check below is exact
    grid_opacity=50,
)


@pytest.fixture(scope="module")
def scene():
    return make_scene(
        seed=21,
        spec=SceneSpec(n_ground=20000, n_rocks=3, points_per_rock=1200, n_noise=100),
    )


def test_full_pipeline_fidelity(scene):
    pts = scene.points
    result = jit_pipeline(CFG)(Cloud.pad_to(pts, CFG.max_points), jax.random.PRNGKey(3))

    # ---- oracle chain -------------------------------------------------
    kept, counts, row_avgs, holes = oracle.crop_and_seed(pts, CFG)
    vox = oracle.voxel_downsample(kept, CFG.downsample_leaf_size)
    keep_mask = oracle.statistical_outlier_mask(
        vox, CFG.statistical_outlier_mean_k, CFG.statistical_outlier_std_dev_thresh
    )
    inl = vox[keep_mask]
    planes, remaining = oracle.multi_plane_removal(
        inl.astype(np.float64),
        CFG.plane_segment_dist_thresh,
        CFG.eps_angle_radians,
        CFG.plane_min_remaining_frac,
        CFG.max_planes,
        seed=9,
    )
    nonplane = inl[remaining]
    clusters = oracle.euclidean_clusters(
        nonplane, CFG.euc_cluster_tolerance,
        CFG.euc_min_cluster_size, CFG.euc_max_cluster_size,
    )
    want_rows = oracle.cluster_centroids_radii(nonplane, clusters)

    # ---- stage-count agreement -----------------------------------------
    s = result.stats
    assert int(s.cropped_points) == len(kept)
    assert int(s.voxel_points) == len(vox)
    # outlier keep-set: small budget for threshold-boundary disagreement
    assert abs(int(s.inlier_points) - int(keep_mask.sum())) <= 0.005 * len(vox)
    # plane removal: same number of planes, similar survivor count
    assert int(s.num_planes) == len(planes)
    assert abs(int(s.nonplane_points) - len(nonplane)) <= 0.02 * len(inl) + 30

    # ---- cluster-level agreement ---------------------------------------
    assert int(s.num_clusters) == len(clusters)
    got_rows = np.asarray(result.centroids.points.xyzr)[np.asarray(result.centroids.valid)]
    assert len(got_rows) == len(want_rows)
    # match by nearest centroid (ordering may differ on equal-size ties)
    for row in want_rows:
        d = np.linalg.norm(got_rows[:, :3] - row[:3], axis=1)
        j = int(np.argmin(d))
        assert d[j] < 0.05, (row, got_rows[j])
        assert abs(got_rows[j, 3] - row[3]) < 0.1

    # ---- grid-level agreement -------------------------------------------
    # Write order is holes(100) -> shadows(grid_opacity=50) -> obstacles(100),
    # so with a distinct grid_opacity every cell value has one explanation:
    #   100 <=> obstacle cell, or oracle hole not overwritten by a shadow
    #    50 <=> shadow cell not overwritten by an obstacle
    # This check FAILS if hole detection regresses (a hole cell would read 0).
    grid = np.asarray(result.grid.data)
    flat = grid.reshape(-1)
    hole_flat = holes.reshape(-1) == 100

    nonp_dev = np.asarray(result.nonplane_cloud.points)[
        np.asarray(result.nonplane_cloud.valid)
    ]
    obst_cells = np.zeros(flat.shape, bool)
    for idx in oracle.grid_cell_index(nonp_dev, CFG):
        if 0 <= idx < CFG.grid_size:
            obst_cells[int(idx)] = True

    # every device obstacle write landed
    assert (flat[obst_cells] == 100).all()
    # away from obstacle cells: 100 iff oracle-hole and not shadow-overwritten
    non_obst = ~obst_cells
    np.testing.assert_array_equal(
        flat[non_obst] == 100, hole_flat[non_obst] & (flat[non_obst] != 50)
    )
    assert hole_flat.sum() > 0  # the scene must actually exercise holes
    # every oracle obstacle cell is occupied in the device grid
    occ_cells = set()
    for idx in oracle.grid_cell_index(nonplane, CFG):
        if idx < CFG.grid_size:
            occ_cells.add(int(idx))
    flat = grid.reshape(-1)
    hit = sum(1 for i in occ_cells if flat[i] == 100)
    assert hit >= 0.97 * len(occ_cells)


def test_calibration_roundtrip(tmp_path, scene):
    from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform

    p = str(tmp_path / "calib.json")
    tf = RigidTransform.from_quat_trans([0.5, -0.5, 0.5, -0.5], [1, 2, 3])
    save_calibration(p, CFG, tf)
    cfg2, tf2, wf, sf = load_calibration(p)
    assert cfg2 == CFG
    assert wf == "world" and sf == "kinect2_link"
    np.testing.assert_allclose(np.asarray(tf2.quat_xyzw), [0.5, -0.5, 0.5, -0.5])
    np.testing.assert_allclose(np.asarray(tf2.translation), [1, 2, 3])

    # saved calibration reproduces the exact pipeline result
    r1 = jit_pipeline(CFG)(Cloud.pad_to(scene.points, CFG.max_points), jax.random.PRNGKey(0))
    r2 = jit_pipeline(cfg2)(Cloud.pad_to(scene.points, cfg2.max_points), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(r1.grid.data), np.asarray(r2.grid.data))
