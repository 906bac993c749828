"""NumPy/SciPy oracle implementations of every pipeline stage.

These are straight, readable ports of the *semantics* of the reference node
(minibot_cr18/src/obstacle_detection.cpp) and of the PCL algorithms it wraps
(SURVEY.md §2.2), used as golden references for the JAX/TPU implementations.
They intentionally favor clarity over speed and never import the package
under test.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.spatial import cKDTree


# ---------------------------------------------------------------- stage 1
def crop_mask(points, cfg):
    """NaN/bounds rejection (obstacle_detection.cpp:197-200)."""
    finite = np.all(np.isfinite(points), axis=-1)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    return (
        finite
        & (x >= cfg.x_min) & (x <= cfg.x_max)
        & (y >= cfg.y_min) & (y <= cfg.y_max)
        & (z >= cfg.z_min) & (z <= cfg.z_max)
    )


def grid_cell_xy_scalar(x, y, x_min, y_max, block_size):
    """Literal port of get_occupancy_grid_x_y (cpp:134-150)."""
    x_count = 0
    y_count = 0
    while x_min + (x_count + 1) * block_size < x:
        x_count += 1
    while y_max - (y_count + 1) * block_size > y:
        y_count += 1
    return x_count, y_count


def grid_cell_index(points, cfg):
    """get_occupancy_grid_location (cpp:153-157) — note the call site swaps
    arguments: (y, x, y_min, x_max) (cpp:203)."""
    out = np.empty(len(points), np.int64)
    for i, p in enumerate(points):
        col, row = grid_cell_xy_scalar(
            np.float32(p[1]), np.float32(p[0]),
            np.float32(cfg.y_min), np.float32(cfg.x_max), np.float32(cfg.block_size),
        )
        out[i] = row * cfg.grid_width + col
    return out


def crop_and_seed(points, cfg):
    """build_initial_occupancy_grid_dataset (cpp:175-269)."""
    H, W = cfg.grid_height, cfg.grid_width
    keep = crop_mask(points, cfg)
    kept = points[keep]
    counts = np.zeros(H * W, np.int64)
    for idx in grid_cell_index(kept, cfg):
        if idx < H * W:
            counts[idx] += 1
    row_avgs = np.array([counts[r * W:(r + 1) * W].sum() // W for r in range(H)])
    grid = np.zeros(H * W, np.int8)
    for i in range(H * W):
        if counts[i] < row_avgs[i // W] * (1.0 - np.float32(cfg.dev_percent)):
            grid[i] = 100
    return kept, counts.reshape(H, W), row_avgs, grid.reshape(H, W)


# ---------------------------------------------------------------- stage 2
def voxel_downsample(points, leaf):
    """pcl::VoxelGrid semantics: per-leaf centroid, floor(coord/leaf) bins."""
    pts = points[np.all(np.isfinite(points), axis=-1)]
    keys = np.floor(pts / np.float32(leaf)).astype(np.int64)
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    keys, pts = keys[order], pts[order]
    uniq, first, counts = np.unique(keys, axis=0, return_index=True, return_counts=True)
    sums = np.add.reduceat(pts, first, axis=0)
    return (sums / counts[:, None]).astype(np.float32)


# ---------------------------------------------------------------- stage 3
def statistical_outlier_mask(points, mean_k, std_mul):
    """pcl::StatisticalOutlierRemoval (cpp:316-340).

    For each point: mean distance to its mean_k nearest neighbors (excluding
    itself); keep iff mean_dist <= mu + sigma * std_mul where mu/sigma are the
    sample mean/stddev over all points (PCL uses the n-1 variance estimator).
    """
    n = len(points)
    tree = cKDTree(points)
    d, _ = tree.query(points, k=mean_k + 1)
    mean_dists = d[:, 1:].mean(axis=1)
    mu = mean_dists.mean()
    var = (np.sum(mean_dists**2) - n * mu * mu) / (n - 1)
    sigma = math.sqrt(max(var, 0.0))
    return mean_dists <= mu + std_mul * sigma


# ---------------------------------------------------------------- stage 4
def fit_plane_lsq(pts):
    """Least-squares plane through points: unit normal + d (n·p + d = 0)."""
    c = pts.mean(axis=0)
    q = pts - c
    cov = q.T @ q
    w, v = np.linalg.eigh(cov)
    n = v[:, 0]
    n = n / np.linalg.norm(n)
    return n, -float(n @ c)


def ransac_plane(points, dist_thresh, axis=(0, 0, 1), eps_angle=20.0,
                 iters=256, seed=0, refine=True):
    """SACMODEL_PERPENDICULAR_PLANE + SAC_RANSAC semantics (cpp:364-387):
    random 3-point hypotheses; inlier = |point-plane distance| < thresh;
    normal within eps_angle (radians, per the reference bug) of axis;
    least-squares refinement on inliers (setOptimizeCoefficients)."""
    rng = np.random.default_rng(seed)
    n_pts = len(points)
    axis = np.asarray(axis, np.float64)
    best = None
    best_count = -1
    for _ in range(iters):
        idx = rng.choice(n_pts, 3, replace=False)
        p0, p1, p2 = points[idx]
        n = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(n)
        if norm < 1e-12:
            continue
        n = n / norm
        ang = math.acos(min(1.0, abs(float(n @ axis))))
        if ang > eps_angle:
            continue
        d = -float(n @ p0)
        count = int(np.sum(np.abs(points @ n + d) < dist_thresh))
        if count > best_count:
            best_count = count
            best = (n, d)
    if best is None or best_count <= 0:
        return None, np.zeros(n_pts, bool)
    n, d = best
    inliers = np.abs(points @ n + d) < dist_thresh
    if refine:
        for _ in range(2):
            if inliers.sum() < 3:
                break
            n, d = fit_plane_lsq(points[inliers])
            inliers = np.abs(points @ n + d) < dist_thresh
    return (n, d), inliers


def multi_plane_removal(points, dist_thresh, eps_angle, min_remaining_frac=0.3,
                        max_planes=4, seed=0):
    """The multi-plane while loop (cpp:376-399): extract planes while more
    than min_remaining_frac of the original cloud remains."""
    remaining = np.ones(len(points), bool)
    n0 = len(points)
    planes = []
    while remaining.sum() > min_remaining_frac * n0 and len(planes) < max_planes:
        model, inl = ransac_plane(
            points[remaining], dist_thresh, eps_angle=eps_angle, seed=seed + len(planes)
        )
        if model is None or inl.sum() == 0:
            break
        idx = np.flatnonzero(remaining)
        remaining[idx[inl]] = False
        planes.append(model)
    return planes, remaining


# ---------------------------------------------------------------- stage 5
def euclidean_clusters(points, tolerance, min_size, max_size):
    """pcl::EuclideanClusterExtraction (cpp:430-455): BFS flood fill over
    radius neighbors (dist <= tolerance), size gate, clusters sorted by size
    descending (PCL sorts at extraction end)."""
    n = len(points)
    tree = cKDTree(points)
    processed = np.zeros(n, bool)
    clusters = []
    for i in range(n):
        if processed[i]:
            continue
        queue = [i]
        processed[i] = True
        members = []
        while queue:
            j = queue.pop()
            members.append(j)
            for k in tree.query_ball_point(points[j], tolerance):
                if not processed[k]:
                    processed[k] = True
                    queue.append(k)
        if min_size <= len(members) <= max_size:
            clusters.append(sorted(members))
    clusters.sort(key=len, reverse=True)
    return clusters


def cluster_centroids_radii(points, clusters):
    """The dormant create_cluster_cloud/centroids API (cpp:806-814):
    per-cluster centroid + bounding radius -> PointWithRad rows."""
    rows = []
    for members in clusters:
        p = points[members]
        c = p.mean(axis=0)
        r = float(np.max(np.linalg.norm(p - c, axis=1))) if len(p) else 0.0
        rows.append([c[0], c[1], c[2], r])
    return np.asarray(rows, np.float32).reshape(-1, 4)


# ---------------------------------------------------------------- stage 6
def trace_shadow(v1, v2, grid, opacity):
    """Literal port of traceShadow (cpp:467-538)."""
    H, W = grid.shape
    size = H * W
    flat = grid.reshape(-1)
    x0, x1, y0, y1 = int(v1[0]), int(v2[0]), int(v1[1]), int(v2[1])
    steep = abs(y1 - y0) > abs(x1 - x0)
    if steep:
        x0, y0 = y0, x0
        x1, y1 = y1, x1
    if x0 > x1:
        x0, x1 = x1, x0
        y0, y1 = y1, y0
    dx = float(x1 - x0)
    dy = float(y1 - y0)
    gradient = dy / dx if dx != 0.0 else 1.0
    intersect_y = float(y0)
    for x in range(x0, x1 + 1):
        if steep:
            gy, gx = x, int(math.floor(intersect_y))
        else:
            gy, gx = int(math.floor(intersect_y)), x
        idx = gy * W + gx
        if 0 <= idx < size:
            flat[idx] = opacity
        idx += 1
        if 0 <= idx < size:
            flat[idx] = opacity
        intersect_y += gradient
    return grid


def shadow_cast_cells(cluster_pts_world, world_from_sensor, cfg):
    """handle_shadow_casting geometry (cpp:584-669) in NumPy.

    cluster_pts_world: [n,3] world-frame cluster points.
    world_from_sensor: 4x4 matrix mapping sensor -> world.
    Returns (start_cell, end_cell, width) with cells as (col, row), or None
    when the cluster has < 2 points (cpp:586-589).
    """
    if len(cluster_pts_world) < 2:
        return None
    m = np.asarray(world_from_sensor, np.float64)
    inv = np.linalg.inv(m)
    pts = (inv[:3, :3] @ cluster_pts_world.T).T + inv[:3, 3]

    i_min = int(np.argmin(pts[:, 0]))
    vmin = pts[i_min]  # vertical_axis_min_pt
    vmax = float(np.max(pts[:, 0]))
    hmin = float(np.min(pts[:, 1]))
    hmax = float(np.max(pts[:, 1]))
    width = abs(hmax - hmin)

    a = vmin[2]
    b = abs(vmin[0])
    c = math.sqrt(a * a + b * b)
    e = abs(vmax) - abs(vmin[0]) + 0.04
    D = math.asin(a / c) if c > 0 else 0.0
    d = math.tan(D) * e + 0.25

    v_len = math.sqrt(vmin @ vmin)
    norm_v = vmin / v_len * d
    end_sensor = norm_v + vmin
    end_world = m[:3, :3] @ end_sensor + m[:3, 3]
    start_world = m[:3, :3] @ vmin + m[:3, 3]

    end_cell = grid_cell_xy_scalar(
        np.float32(end_world[1]), np.float32(end_world[0]),
        np.float32(cfg.y_min), np.float32(cfg.x_max), np.float32(cfg.block_size),
    )
    start_cell = grid_cell_xy_scalar(
        np.float32(start_world[1]), np.float32(start_world[0]),
        np.float32(cfg.y_min), np.float32(cfg.x_max), np.float32(cfg.block_size),
    )
    return start_cell, end_cell, width


def handle_shadow_casting(cluster_pts_world, world_from_sensor, grid, cfg):
    """Full per-cluster shadow sweep (cpp:631-669)."""
    res = shadow_cast_cells(cluster_pts_world, world_from_sensor, cfg)
    if res is None:
        return grid
    (sx, sy), (ex, ey), width = res
    shift = math.ceil((width / cfg.block_size) / 2)
    sx += shift
    ex += shift
    n_lines = int(math.ceil(width / cfg.block_size)) + 3
    for _ in range(n_lines):
        trace_shadow((sx, sy), (ex, ey), grid, cfg.grid_opacity)
        sx -= 1
        ex -= 1
    return grid
