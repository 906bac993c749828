"""Statistical outlier removal (pcl::StatisticalOutlierRemoval equivalent).

Reference: remove_statistical_outliers (obstacle_detection.cpp:316-340) wraps
PCL's two-pass algorithm (SURVEY.md §2.2):

1. for every point, the mean distance to its ``meanK`` nearest neighbors
   (KD-tree search of k+1 including self, self excluded from the mean);
2. global sample mean mu and stddev sigma (n-1 estimator) of those mean
   distances; keep points with ``mean_dist <= mu + stdDevThres * sigma``.

TPU-native design: no KD-tree.  The k-nearest distances are computed by
**tiled brute force on the MXU** — for a row tile Q of queries,
``D2 = |q|^2 + |p|^2 - 2 Q P^T`` is one [T, N] matmul at HIGHEST precision,
and the per-row k-smallest reduction is either ``lax.approx_min_k`` (the
TPU-native PartialReduce; default, 28x faster than sort-based top-k at
recall 0.98) or an exact hierarchical two-level ``lax.top_k``.  At the
post-voxel cloud sizes this pipeline runs (N <= max_voxels = 16k), the N^2
distances are milliseconds versus PCL's pointer-chasing KD-tree over the
same cloud.  The cloud is centered first: the expansion's cross-term
cancellation error scales with coordinate magnitude, and centering keeps
|p|^2 small.

The [T, N] tiles are produced by a ``lax.map`` over row tiles so the full
[N, N] distance matrix never materializes in HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud

__all__ = ["knn_mean_distances", "remove_statistical_outliers", "OutlierResult"]

try:  # pallas kept lazy-safe for backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _kmin_mean_xla(d2: jax.Array, k: int, big: float) -> jax.Array:
    """[T, W] squared distances -> [T] mean of the k smallest sqrt'd,
    excluding sentinel entries (>= big/2), by iterative exact extraction.

    One element is removed per pass (ties broken by lowest lane), so the
    result equals sort-take-k INCLUDING duplicates — PCL's semantics.
    Every op is exact (min/compare) or applied in a fixed sequence
    (<= k sqrt additions), so results are bitwise identical across
    backends — including against the Pallas kernel below, which runs this
    same loop body in VMEM.  (A mutation-free threshold variant was
    measured ~20% slower on v5e: recomputing the (value, lane) exclusion
    mask each pass costs more than the masked rewrite.)"""
    t, w = d2.shape
    lane = lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def body(_, state):
        scratch, s, c = state
        m = jnp.min(scratch, axis=1, keepdims=True)  # [T, 1]
        real = m < big * 0.5
        dk = jnp.sqrt(jnp.maximum(m, 0.0))
        s = s + jnp.where(real, dk, 0.0)
        c = c + real.astype(jnp.float32)
        eq = scratch == m
        first = jnp.min(jnp.where(eq, lane, w), axis=1, keepdims=True)
        scratch = jnp.where(eq & (lane == first), jnp.float32(big), scratch)
        return scratch, s, c

    _, s, c = lax.fori_loop(
        0, k, body,
        (d2, jnp.zeros((t, 1), jnp.float32), jnp.zeros((t, 1), jnp.float32)),
    )
    return s[:, 0] / jnp.maximum(c[:, 0], 1.0)


def _kmin_mean_pallas(d2: jax.Array, k: int, big: float) -> jax.Array:
    """Pallas form of ``_kmin_mean_xla``: the [T, W] tile lives in VMEM and
    the k extraction passes never touch HBM.  Arithmetic is op-for-op the
    XLA loop (min / eq / sqrt / fixed-order adds — all exact or
    order-fixed), so outputs are bit-identical to the fallback and the
    TPU<->CPU crosscheck is preserved (unlike a fused distance kernel,
    whose FMA contraction would perturb d2 itself)."""
    t, w = d2.shape

    def kernel(d2_ref, out_ref, scratch):
        scratch[:] = d2_ref[:]
        lane = lax.broadcasted_iota(jnp.int32, (1, w), 1)

        def body(_, state):
            s, c = state
            cur = scratch[:]
            m = jnp.min(cur, axis=1, keepdims=True)
            real = m < big * 0.5
            dk = jnp.sqrt(jnp.maximum(m, 0.0))
            s = s + jnp.where(real, dk, 0.0)
            c = c + real.astype(jnp.float32)
            eq = cur == m
            first = jnp.min(jnp.where(eq, lane, w), axis=1, keepdims=True)
            scratch[:] = jnp.where(eq & (lane == first), jnp.float32(big), cur)
            return s, c

        s, c = lax.fori_loop(
            0, k, body,
            (jnp.zeros((t, 1), jnp.float32), jnp.zeros((t, 1), jnp.float32)),
        )
        out_ref[:] = s / jnp.maximum(c, 1.0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, w), jnp.float32)],
    )(d2)
    return out[:, 0]


def _kmin_mean(d2: jax.Array, k: int, big: float) -> jax.Array:
    if jax.default_backend() == "tpu" and pl is not None:
        return _kmin_mean_pallas(d2, k, big)
    return _kmin_mean_xla(d2, k, big)

def knn_mean_distances(
    cloud: Cloud, k: int, row_tile: int = 512, backend: str = "approx",
    band: int = 1024,
) -> jax.Array:
    """Mean distance to the k nearest valid neighbors for every point.

    Returns [N] float32; entries for invalid points are 0.  Brute force over
    all pairs (distances on the MXU), self-distance excluded, matching
    pcl::StatisticalOutlierRemoval's searchForNeighbors(k+1)/skip-self
    convention.

    ``backend`` selects the per-row k-smallest reduction:
      * "approx": ``lax.approx_min_k`` — the TPU-native PartialReduce top-k
        (measured 6.5x faster than hierarchical sort-based top-k on v5e at
        recall 0.98; ~0.1% mean perturbation of the kNN mean distances,
        noise-level for the mu + mult*sigma statistical gate).
      * "exact": hierarchical two-level ``lax.top_k`` (exact PCL semantics).
      * "banded": the grid-pruned engine (SURVEY.md §7 step 4's candidate
        restriction, rank-space form).  REQUIRES the input to be sorted by
        voxel-lattice key, which is exactly the order ``voxel_downsample``
        emits (ascending packed (ix, iy, iz)): spatial neighbors then sit
        within a bounded RANK window, so query tile t only scores columns
        [tT - band, tT + T + band) — a contiguous slice, no gather.
        Selection within the window is EXACT: iterative k-min extraction
        in VMEM (``_kmin_mean_pallas`` on TPU, the bit-identical XLA loop
        elsewhere) — the same ~N_cand/N work reduction as a 27-cell
        grid-hash walk with zero bucketing overhead and no approx-top-k
        recall loss.  Candidates outside the window are missed, so the
        mean distances are an upper bound for rare boundary points
        (statistically invisible to the mu + m*sigma gate; validated vs
        exact in tests/test_outliers.py).
      * "banded_approx": the band window with ``lax.approx_min_k``
        selection (recall 0.98) — kept for comparison.
    """
    pts = cloud.points
    n = cloud.capacity
    valid = cloud.valid
    row_tile = min(row_tile, n)
    # Pad the QUERY side up to a tile multiple (columns stay at n): an odd
    # capacity must never silently materialize the full [N, N] matrix.
    n_q = -(-n // row_tile) * row_tile

    # Center to tame |p|^2-vs-cross-term cancellation in the expansion.
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
    # Park invalid points at the center: their *columns* are masked out below,
    # and keeping coordinates small avoids inf/nan in the expansion.
    p = jnp.where(valid[:, None], pts - center, 0.0)
    p_sq = jnp.sum(p * p, axis=-1)

    row_ids = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def _k_smallest(d2: jax.Array, kk: int) -> jax.Array:
        """Exact k-smallest per row via hierarchical top-k: chunk-local
        top-k then top-k of the candidate pool.  A flat lax.top_k over the
        full row lowers to a whole-row sort on TPU; the two-level form cuts
        the sorted width from N to 128 + N*k/128."""
        T, N = d2.shape
        chunk = 128
        if N % chunk or N // chunk < 2:
            neg, _ = lax.top_k(-d2, kk)
            return -neg
        c = d2.reshape(T, N // chunk, chunk)
        neg, _ = lax.top_k(-c, kk)  # [T, N/chunk, kk] chunk-local k smallest
        cand = neg.reshape(T, (N // chunk) * kk)
        neg2, _ = lax.top_k(cand, kk)
        return -neg2

    big = 3.0e38  # python float: jnp broadcasts it, and the Pallas
    # k-min kernel needs it as a compile-time literal

    def _score_tile(q, q_sq, q_ids, cols, cols_sq, c_ids, c_valid):
        """[T, C] squared distances on the MXU + k-smallest mean.

        HIGHEST precision: the TPU MXU default truncates inputs to
        bfloat16, which perturbs kNN distances by ~4e-3 relative — enough
        to reorder neighbor sets.  Full-f32 passes keep distances exact.
        Self and invalid columns get a big finite sentinel (not inf: the
        mean masks on the sentinel instead of isfinite)."""
        d2 = q_sq[:, None] + cols_sq[None, :] - 2.0 * jnp.dot(
            q, cols.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(c_valid[None, :], d2, big)
        d2 = jnp.where(q_ids[:, None] == c_ids[None, :], big, d2)
        if backend == "banded":
            # exact k-min extraction in VMEM (Pallas on TPU; identical
            # XLA loop elsewhere) — no approx_min_k recall loss
            return _kmin_mean(d2, k, big)
        if backend == "exact":
            dk2 = _k_smallest(d2, k)
        else:
            dk2, _ = lax.approx_min_k(d2, k, recall_target=0.98)
        real = dk2 < big * 0.5
        dk = jnp.sqrt(jnp.maximum(dk2, 0.0))
        s = jnp.sum(jnp.where(real, dk, 0.0), axis=-1)
        cnt = jnp.sum(real.astype(jnp.float32), axis=-1)
        return s / jnp.maximum(cnt, 1.0)

    tiles = n_q // row_tile
    pad = n_q - n
    q_p = jnp.pad(p, ((0, pad), (0, 0)))
    q_sq = jnp.pad(p_sq, (0, pad))
    # padded query rows get ids >= n: they never match a column and their
    # outputs are sliced off below
    q_ids = jnp.pad(row_ids, (0, pad), constant_values=n)

    if backend in ("banded", "banded_approx") and row_tile + 2 * band < n:
        # rank-window candidates: query tile t scores the contiguous column
        # slice [t*T - band, t*T + T + band), clamped inside the buffer
        width = row_tile + 2 * band
        starts = jnp.clip(
            lax.broadcasted_iota(jnp.int32, (tiles, 1), 0)[:, 0] * row_tile
            - band,
            0,
            n - width,
        )

        def band_tile_fn(args):
            q, qq, qi, start = args
            cols = lax.dynamic_slice(p, (start, 0), (width, 3))
            cols_sq = lax.dynamic_slice(p_sq, (start,), (width,))
            c_ids = lax.dynamic_slice(row_ids, (start,), (width,))
            c_valid = lax.dynamic_slice(valid, (start,), (width,))
            return _score_tile(q, qq, qi, cols, cols_sq, c_ids, c_valid)

        out = lax.map(
            band_tile_fn,
            (
                q_p.reshape(tiles, row_tile, 3),
                q_sq.reshape(tiles, row_tile),
                q_ids.reshape(tiles, row_tile),
                starts,
            ),
        )
    else:

        def tile_fn(args):
            q, qq, qi = args
            return _score_tile(q, qq, qi, p, p_sq, row_ids, valid)

        out = lax.map(
            tile_fn,
            (
                q_p.reshape(tiles, row_tile, 3),
                q_sq.reshape(tiles, row_tile),
                q_ids.reshape(tiles, row_tile),
            ),
        )
    return jnp.where(valid, out.reshape(n_q)[:n], 0.0)


class OutlierResult(NamedTuple):
    cloud: Cloud  # same buffer, mask restricted to inliers
    mean_distances: jax.Array  # [N] float32 per-point kNN mean distance
    threshold: jax.Array  # [] float32 mu + sigma * mult


def remove_statistical_outliers(
    cloud: Cloud, mean_k: int, std_dev_mult: float, row_tile: int = 512,
    backend: str = "approx", band: int = 1024,
) -> OutlierResult:
    """Full filter (obstacle_detection.cpp:326-330 semantics)."""
    d = knn_mean_distances(cloud, mean_k, row_tile, backend, band)
    valid_f = cloud.valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid_f), 2.0)
    s1 = jnp.sum(d * valid_f)
    s2 = jnp.sum(d * d * valid_f)
    mu = s1 / n
    var = jnp.maximum((s2 - n * mu * mu) / (n - 1.0), 0.0)  # PCL's n-1 estimator
    threshold = mu + jnp.float32(std_dev_mult) * jnp.sqrt(var)
    keep = cloud.valid & (d <= threshold)
    return OutlierResult(
        cloud=Cloud(points=cloud.points, valid=keep),
        mean_distances=d,
        threshold=threshold,
    )
