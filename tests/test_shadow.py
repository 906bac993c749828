import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from pointcloud_obstacle_processing_tpu import Cloud, REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.ops.cluster import euclidean_cluster
from pointcloud_obstacle_processing_tpu.ops.shadow import cast_shadows
from pointcloud_obstacle_processing_tpu.ops.transforms import RigidTransform
from pointcloud_obstacle_processing_tpu.types import ClusterSet

# visible opacity so shadow writes are observable (params.yaml ships 0!)
CFG = REFERENCE_YAML_CONFIG.replace(grid_opacity=50)


def _sensor_pose():
    """A Kinect-like pose: sensor at the arena edge, looking +x, tilted down.

    Mirrors the commented static tf in main.launch:12-13 in spirit: the
    sensor z axis (view ray) points into the arena.
    """
    # sensor frame: z forward (view), x down-range tilt; world: z up
    # build from matrix: sensor axes expressed in world
    fwd = np.array([1.0, 0.0, -0.35])  # looking +x, pitched down
    fwd /= np.linalg.norm(fwd)
    right = np.array([0.0, -1.0, 0.0])
    up = np.cross(fwd, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = up
    m[:3, 2] = fwd  # sensor z = view direction
    m[:3, 3] = [-0.2, 1.9, 1.5]  # behind x_min, centered in y, elevated
    return m


def _cluster_setup(pts_world, n_slots=4):
    """Build a one-cluster ClusterSet over a padded cloud."""
    n = len(pts_world)
    cap = 64
    cloud = Cloud.pad_to(pts_world, cap)
    pc = np.full(cap, -1, np.int32)
    pc[:n] = 0
    sizes = np.zeros(n_slots, np.int32)
    sizes[0] = n
    valid = np.zeros(n_slots, bool)
    valid[0] = True
    clusters = ClusterSet(
        point_cluster=jnp.asarray(pc),
        sizes=jnp.asarray(sizes),
        valid=jnp.asarray(valid),
        num_clusters=jnp.int32(1),
    )
    return cloud, clusters


def test_shadow_matches_oracle_single_cluster(rng):
    m = _sensor_pose()
    tf = RigidTransform.from_matrix(m)
    # a rock-ish cluster in the middle of the arena
    pts = (rng.normal([2.2, 1.9, 0.12], 0.05, size=(40, 3))).astype(np.float32)
    cloud, clusters = _cluster_setup(pts)

    grid0 = np.zeros((CFG.grid_height, CFG.grid_width), np.int8)
    res = jax.jit(lambda g, c, cl, t: cast_shadows(g, c, cl, t, CFG))(
        jnp.asarray(grid0), cloud, clusters, tf
    )
    got = np.asarray(res.grid)

    want = oracle.handle_shadow_casting(pts.astype(np.float64), m, grid0.copy(), CFG)
    mismatch = np.flatnonzero(got != want)
    assert got.sum() > 0, "shadow must write something"
    assert mismatch.size == 0, f"{mismatch.size} differing cells"


def test_shadow_multiple_clusters(rng):
    m = _sensor_pose()
    tf = RigidTransform.from_matrix(m)
    pts1 = (rng.normal([1.5, 1.0, 0.1], 0.04, size=(30, 3))).astype(np.float32)
    pts2 = (rng.normal([3.0, 2.8, 0.15], 0.06, size=(30, 3))).astype(np.float32)
    cap = 128
    pts = np.concatenate([pts1, pts2])
    cloud = Cloud.pad_to(pts, cap)
    pc = np.full(cap, -1, np.int32)
    pc[:30] = 0
    pc[30:60] = 1
    clusters = ClusterSet(
        point_cluster=jnp.asarray(pc),
        sizes=jnp.asarray(np.array([30, 30, 0, 0], np.int32)),
        valid=jnp.asarray(np.array([True, True, False, False])),
        num_clusters=jnp.int32(2),
    )
    grid0 = np.zeros((CFG.grid_height, CFG.grid_width), np.int8)
    got = np.asarray(cast_shadows(jnp.asarray(grid0), cloud, clusters, tf, CFG).grid)

    want = grid0.copy()
    for p in (pts1, pts2):
        want = oracle.handle_shadow_casting(p.astype(np.float64), m, want, CFG)
    # The oracle runs the trig/transform chain in float64; the device code is
    # float32 like the C++.  A value landing within ~1e-6 of a cell boundary
    # can round to the adjacent cell — allow a small fraction of edge cells.
    mismatch = np.mean(got != want)
    assert mismatch < 0.005, f"{mismatch:.4%} cells differ"
    assert (got != 0).sum() > 0.9 * (want != 0).sum()


def test_single_point_cluster_skipped(rng):
    m = _sensor_pose()
    tf = RigidTransform.from_matrix(m)
    pts = np.array([[2.0, 2.0, 0.1]], np.float32)
    cloud, clusters = _cluster_setup(pts)
    clusters = clusters.replace(sizes=clusters.sizes.at[0].set(1))
    grid0 = jnp.zeros((CFG.grid_height, CFG.grid_width), jnp.int8)
    got = np.asarray(cast_shadows(grid0, cloud, clusters, tf, CFG).grid)
    assert got.sum() == 0  # cpp:586-589: clusters of <2 points skipped


def test_shadow_overwrites_holes_and_is_overwritten_by_obstacles(rng):
    # stage-order semantics: holes(100) -> shadow(opacity) -> obstacles(100)
    from pointcloud_obstacle_processing_tpu.ops.occupancy import mark_obstacles

    m = _sensor_pose()
    tf = RigidTransform.from_matrix(m)
    pts = (rng.normal([2.2, 1.9, 0.12], 0.05, size=(40, 3))).astype(np.float32)
    cloud, clusters = _cluster_setup(pts)
    grid_holes = jnp.full((CFG.grid_height, CFG.grid_width), 100, jnp.int8)
    shadowed = cast_shadows(grid_holes, cloud, clusters, tf, CFG).grid
    assert (np.asarray(shadowed) == CFG.grid_opacity).any()
    final = np.asarray(mark_obstacles(shadowed, cloud, CFG))
    idx = oracle.grid_cell_index(pts, CFG)
    assert all(final.reshape(-1)[i] == 100 for i in idx)
