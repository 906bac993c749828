"""RANSAC perpendicular-plane segmentation (pcl::SACSegmentation equivalent).

Reference: segment_plane_and_extract_indices (obstacle_detection.cpp:342-428)
configures ``SACMODEL_PERPENDICULAR_PLANE`` + ``SAC_RANSAC`` with axis
(0,0,1) (cpp:769), ``setOptimizeCoefficients(true)`` (cpp:365), eps angle
(cpp:371 — fed *radians*; see config.pcl_compat_eps_angle_bug) and a distance
threshold, then loops "extract plane, remove inliers" while more than 30% of
the original cloud remains (cpp:379) or until no plane is found (cpp:383-387).

TPU-native design (SURVEY.md §7 step 6):

* PCL's *sequential* RANSAC iterations become **K batched hypotheses**: K
  3-point samples drawn at once, all K plane models scored against all N
  points with a single [N,3]x[3,K] matmul on the MXU, argmax by inlier count.
* ``setOptimizeCoefficients`` becomes a masked least-squares refit: weighted
  centroid + 3x3 scatter matrix (one more MXU contraction), smallest
  eigenvector by power iteration on ``trace(C) I - C`` seeded with the RANSAC
  normal (converges in a handful of 3x3 matvecs; no lax eigensolver needed).
* the multi-plane loop is a ``lax.while_loop`` over the validity mask with a
  static ``max_planes`` bound.

Randomness is an explicit PRNGKey: fixed key => bit-identical plane sequence
(the determinism the reference's rand()-driven PCL RANSAC never had).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import PipelineConfig
from ..types import Cloud, PlaneModel

__all__ = [
    "ransac_plane_once",
    "segment_planes",
    "hypotheses_for_confidence",
    "PlaneOnceResult",
    "SegmentPlanesResult",
]


def hypotheses_for_confidence(
    inlier_fraction: float, confidence: float = 0.99, multiple_of: int = 64
) -> int:
    """Batch size K equivalent to PCL's adaptive RANSAC iteration count.

    PCL's SAC_RANSAC runs sequential hypotheses until
    ``k = log(1 - confidence) / log(1 - w^3)`` draws have been made (w =
    current inlier fraction; RandomSampleConsensus::computeModel) or
    ``setMaxIterations`` is hit.  The TPU design scores all hypotheses in
    one batched matmul instead, so PCL's stopping rule becomes a STATIC
    batch-size choice: size ``ransac_hypotheses`` with the worst inlier
    fraction the deployment must handle.  The shipped default K=128 covers
    w >= 0.33 at 99% confidence; low-inlier scenes (w ~ 0.15) need K ~ 1350
    (see tests/test_ransac.py::test_low_inlier_fraction_matches_sequential_oracle).
    """
    import math

    w3 = max(min(inlier_fraction, 1.0), 1e-6) ** 3
    if w3 >= 1.0:
        return multiple_of
    k = math.log(max(1.0 - confidence, 1e-12)) / math.log(1.0 - w3)
    return max(multiple_of, int(math.ceil(k / multiple_of)) * multiple_of)


def _smallest_eigvec_3x3(cov: jax.Array, init: jax.Array, iters: int = 24) -> jax.Array:
    """Smallest eigenvector of a symmetric 3x3 via power iteration on
    ``trace(cov) I - cov`` (largest-eig flip), seeded with ``init``."""
    m = jnp.trace(cov) * jnp.eye(3, dtype=cov.dtype) - cov

    def body(_, v):
        w = m @ v
        nrm = jnp.linalg.norm(w)
        # degenerate matrix (e.g. zero covariance): keep the previous vector
        return jnp.where(nrm > 1e-20, w / jnp.maximum(nrm, 1e-20), v)

    return lax.fori_loop(0, iters, body, init)


class PlaneOnceResult(NamedTuple):
    normal: jax.Array  # [3] unit normal
    d: jax.Array  # [] plane offset (n·p + d = 0)
    inliers: jax.Array  # [N] bool (subset of input valid mask)
    found: jax.Array  # [] bool


def ransac_plane_once(
    cloud: Cloud, key: jax.Array, config: PipelineConfig, axis=(0.0, 0.0, 1.0)
) -> PlaneOnceResult:
    """One plane extraction: K batched hypotheses + LSQ refinement."""
    pts = cloud.points
    valid = cloud.valid
    n = cloud.capacity
    K = config.ransac_hypotheses
    thresh = jnp.float32(config.plane_segment_dist_thresh)
    eps_angle = jnp.float32(config.eps_angle_radians)
    axis = jnp.asarray(axis, jnp.float32)

    # CHANNEL-WISE throughout: every [N, .] op runs on the three [N]
    # channel vectors, never the [N, 3] channel-minor stack (3 -> 128
    # lane padding, 32x bloat; materialized once per while-loop iteration
    # otherwise).  Measured in pipeline context: segment_planes marginal
    # 8.02 -> 1.75 ms/batch-of-32 (scripts/tpu_experiments43.py), with a
    # bit-identical prefix checksum.  The [K]-sized hypothesis math is
    # channel-wise too so the sampled-point gathers are 1-D.
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]

    # --- sample K valid triples -------------------------------------------
    # valid-first index permutation so a uniform draw over [0, n_valid)
    # indexes only real points (PCL samples uniformly from the index set).
    # Built with a stable 1-key sort: batched sorts are nearly free on v5e
    # while the previous cumsum+scatter serialized at ~20 cycles/element
    # (~6 ms/batch-of-32 at n=24576); the first n_valid entries — the only
    # ones a draw can hit — are identical either way.
    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    _, perm = lax.sort((~valid, idx), num_keys=1, is_stable=True)
    n_valid = jnp.sum(valid.astype(jnp.int32))

    u = jax.random.randint(key, (K, 3), 0, jnp.maximum(n_valid, 1))
    tri = perm[u]  # [K, 3] indices of sampled points
    i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
    p0x, p0y, p0z = x[i0], y[i0], z[i0]
    p1x, p1y, p1z = x[i1], y[i1], z[i1]
    p2x, p2y, p2z = x[i2], y[i2], z[i2]

    # cross(p1 - p0, p2 - p0), written out per channel
    ux, uy, uz = p1x - p0x, p1y - p0y, p1z - p0z
    vx, vy, vz = p2x - p0x, p2y - p0y, p2z - p0z
    nx = uy * vz - uz * vy
    ny = uz * vx - ux * vz
    nz = ux * vy - uy * vx
    norms = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    degenerate = norms < 1e-12
    inv = 1.0 / jnp.maximum(norms, 1e-20)
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    ds = -(nx * p0x + ny * p0y + nz * p0z)  # [K]

    # perpendicular-plane axis gate: angle(normal, axis) folded to [0, pi/2]
    cosang = jnp.clip(jnp.abs(nx * axis[0] + ny * axis[1] + nz * axis[2]), 0.0, 1.0)
    ang = jnp.arccos(cosang)
    axis_ok = ang <= eps_angle

    # --- score all hypotheses -----------------------------------------------
    # Explicit full-f32 VPU mul-adds, not a dot: a K=3 contraction is too
    # narrow for the MXU — the dot either truncates to bf16 (default
    # precision, blurs point-plane distances beyond the 0.04 threshold's
    # resolution) or pays HIGHEST's multi-pass cost on a 128-padded
    # contraction.  Same expression tree on every backend — the pattern
    # the outlier distance tiles use (ops/outliers.py).
    dists = jnp.abs(
        x[:, None] * nx[None, :]
        + y[:, None] * ny[None, :]
        + z[:, None] * nz[None, :]
        + ds[None, :]
    )  # [N, K]
    inl = (dists < thresh) & valid[:, None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=0)  # [K]
    counts = jnp.where(axis_ok & ~degenerate & (n_valid >= 3), counts, -1)

    best = jnp.argmax(counts)
    found = counts[best] > 0
    normal = jnp.stack([nx[best], ny[best], nz[best]])
    d = ds[best]
    inliers = inl[:, best]

    # --- coefficient refinement (setOptimizeCoefficients) ------------------
    def refine(carry, _):
        normal, d, inliers = carry
        w = inliers.astype(jnp.float32)
        n_inl = jnp.sum(w)
        cnt = jnp.maximum(n_inl, 3.0)
        cx = jnp.sum(x * w) / cnt
        cy = jnp.sum(y * w) / cnt
        cz = jnp.sum(z * w) / cnt
        dx, dy, dz = x - cx, y - cy, z - cz
        qx, qy, qz = dx * w, dy * w, dz * w
        # 3x3 scatter matrix as nine explicit [N] mul-reductions (the
        # former [3,N]x[N,3] HIGHEST matmul padded its 3-wide operands to
        # 128 lanes; full-f32 either way)
        cov = jnp.array(
            [
                [jnp.sum(qx * dx), jnp.sum(qx * dy), jnp.sum(qx * dz)],
                [jnp.sum(qy * dx), jnp.sum(qy * dy), jnp.sum(qy * dz)],
                [jnp.sum(qz * dx), jnp.sum(qz * dy), jnp.sum(qz * dz)],
            ]
        )
        nrm = _smallest_eigvec_3x3(cov, normal)
        nrm = nrm * jnp.sign(jnp.sum(nrm * normal) + 1e-30)  # keep orientation
        nd = -(nrm[0] * cx + nrm[1] * cy + nrm[2] * cz)
        new_in = (
            jnp.abs(x * nrm[0] + y * nrm[1] + z * nrm[2] + nd) < thresh
        ) & valid
        # PCL skips coefficient optimization below 3 inliers — without this,
        # a degenerate covariance collapses the normal and the zero plane
        # swallows the whole cloud.
        ok = n_inl >= 3.0
        return (
            jnp.where(ok, nrm, normal),
            jnp.where(ok, nd, d),
            jnp.where(ok, new_in, inliers),
        ), None

    def do_refine(args):
        (carry, _) = lax.scan(refine, args, None, length=config.ransac_refine_iters)
        return carry

    normal, d, inliers = lax.cond(
        found, do_refine, lambda c: c, (normal, d, inliers)
    )
    inliers = inliers & found
    return PlaneOnceResult(normal=normal, d=d, inliers=inliers, found=found)


class SegmentPlanesResult(NamedTuple):
    planes: PlaneModel
    nonplane_cloud: Cloud  # the reference's end-state planar_cloud (non-plane pts)
    plane_union: jax.Array  # [N] bool: union of all extracted plane inliers
    last_plane: jax.Array  # [N] bool: the reference's indices_cloud (last plane)
    # [] bool: the static max_planes bound stopped the loop while the
    # reference's unbounded while (cpp:379-387) would have continued —
    # observable truncation, like every other capacity cap in the pipeline.
    truncated: jax.Array


def segment_planes(
    cloud: Cloud, key: jax.Array, config: PipelineConfig, axis=(0.0, 0.0, 1.0)
) -> SegmentPlanesResult:
    """Iterative multi-plane removal (cpp:376-399) as a lax.while_loop."""
    n = cloud.capacity
    n0 = jnp.sum(cloud.valid.astype(jnp.int32))
    max_planes = config.max_planes
    frac = jnp.float32(config.plane_min_remaining_frac)

    coeffs0 = jnp.zeros((max_planes, 4), jnp.float32)
    pvalid0 = jnp.zeros((max_planes,), bool)
    state = (
        cloud.valid,  # remaining mask
        key,
        coeffs0,
        pvalid0,
        jnp.int32(0),  # planes extracted
        jnp.bool_(True),  # last round found a plane
        jnp.zeros((n,), bool),  # plane union
        jnp.zeros((n,), bool),  # last plane
    )

    def cond(state):
        valid, _, _, _, i, found, _, _ = state
        remaining = jnp.sum(valid.astype(jnp.int32))
        return (remaining > frac * n0.astype(jnp.float32)) & found & (i < max_planes)

    def body(state):
        valid, key, coeffs, pvalid, i, _, union, _ = state
        key, sub = jax.random.split(key)
        res = ransac_plane_once(Cloud(points=cloud.points, valid=valid), sub, config, axis)
        coeffs = lax.cond(
            res.found,
            lambda c: c.at[i].set(jnp.concatenate([res.normal, res.d[None]])),
            lambda c: c,
            coeffs,
        )
        pvalid = pvalid.at[i].set(res.found)
        valid = valid & ~res.inliers
        union = union | res.inliers
        i = i + res.found.astype(jnp.int32)
        return (valid, key, coeffs, pvalid, i, res.found, union, res.inliers)

    valid, _, coeffs, pvalid, i, found, union, last = lax.while_loop(cond, body, state)
    # the loop stopped ONLY because of the static bound: >30% of points
    # remain, the last round still found a plane, but i hit max_planes —
    # the reference would have extracted another plane (cpp:379).
    remaining = jnp.sum(valid.astype(jnp.int32))
    truncated = (
        (remaining.astype(jnp.float32) > frac * n0.astype(jnp.float32))
        & found
        & (i >= max_planes)
    )
    return SegmentPlanesResult(
        planes=PlaneModel(coeffs=coeffs, valid=pvalid, num_planes=i),
        nonplane_cloud=Cloud(points=cloud.points, valid=valid),
        plane_union=union,
        last_plane=last,
        truncated=truncated,
    )
