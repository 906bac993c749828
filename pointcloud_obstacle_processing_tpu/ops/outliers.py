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

def _batcher_pairs(n: int) -> list:
    """Batcher odd-even mergesort comparator list for n elements (ascending;
    63 comparators for n=16)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


_BATCHER16 = _batcher_pairs(16)


def _sortnet_mean(planes: list, k: int, big: float) -> jax.Array:
    """Sorting-network k-smallest mean over 16 position planes.

    ``planes``: 16 arrays [T, nc]; plane p, chunk c holds window column
    c*16 + p.  Selection by sorting networks expressed on the POSITION
    axis: every comparator is an elementwise min/max over two whole
    contiguous [T, nc] planes (no gathers, no per-row sorts — the TPU-fatal
    forms).  Three phases:

    1. Batcher-sort each 16-column chunk (63 comparators = ~7.9 ops/elem);
    2. repeatedly merge chunk j of the FIRST half with chunk j of the
       SECOND half (contiguous slices — strided even/odd pairing measured
       ~12% slower in XLA: 39.6 vs 35.0 ms/batch at [24576, W=1280]),
       keeping the 16 smallest of each 32:
       ``min(a_i, b_{15-i})`` (the bitonic half-cleaner) + a 4-stage
       bitonic resort, halving the chunk axis each round (~5 ops/elem of
       output, geometric total ~5 ops/input-elem; any pairing yields the
       k smallest of the union, so the cheapest one wins);
    3. the final 16 sorted values -> masked mean of the k smallest sqrt'd.

    ~13 touches/element total vs the 15-pass extraction's ~45; measured
    stage-level (distances included) on v5e: 31.3 -> 22.8 ms/batch-of-32
    at [16384 rows, W=1280] and 47.0 -> 39.6 at [24576, W=1280]
    (scripts/tpu_experiments11.py) — and, like the extraction, plain XLA
    min/max/sqrt in a fixed order on every backend, so TPU and CPU agree
    bitwise.  Requires k <= 16 (PCL meanK = 15); ``_kmin_mean`` remains
    the general fallback.
    """
    P = _sortnet_comparators(planes, big, concat_axis=planes[0].ndim - 1)
    vals = jnp.stack([p[..., 0] for p in P])  # [16, T] ascending
    return _sortnet_mean_from_sorted(vals, k, big)


def _sortnet_comparators(P: list, big: float, concat_axis: int) -> list:
    """The shared comparator program: Batcher-16 chunk sort, then
    half-vs-half bitonic merges until one chunk remains.  ``P`` is a list
    of 16 same-shaped arrays whose ``concat_axis`` is the chunk axis.
    Pure min/max in a fixed order: every implementation of this sequence
    (XLA on any backend, the Pallas kernel) produces bitwise-identical
    values."""
    P = list(P)
    for i, j in _BATCHER16:
        lo, hi = jnp.minimum(P[i], P[j]), jnp.maximum(P[i], P[j])
        P[i], P[j] = lo, hi
    while P[0].shape[concat_axis] > 1:
        nc = P[0].shape[concat_axis]
        if nc % 2:
            pad_shape = list(P[0].shape)
            pad_shape[concat_axis] = 1
            pad = jnp.full(pad_shape, big, P[0].dtype)
            P = [jnp.concatenate([p, pad], axis=concat_axis) for p in P]
            nc += 1
        h = nc // 2
        lo_sl = [slice(None)] * P[0].ndim
        hi_sl = [slice(None)] * P[0].ndim
        lo_sl[concat_axis] = slice(0, h)
        hi_sl[concat_axis] = slice(h, nc)
        A = [p[tuple(lo_sl)] for p in P]
        B = [p[tuple(hi_sl)] for p in P]
        P = [jnp.minimum(A[i], B[15 - i]) for i in range(16)]
        for d in (8, 4, 2, 1):  # bitonic resort (trivial at the final nc=1)
            for i in range(16):
                if i % (2 * d) < d:
                    lo, hi = jnp.minimum(P[i], P[i + d]), jnp.maximum(P[i], P[i + d])
                    P[i], P[i + d] = lo, hi
    return P


def _sortnet_mean_from_sorted(vals: jax.Array, k: int, big: float) -> jax.Array:
    """[16, T] ascending values -> masked mean of the k smallest sqrt'd."""
    pos = lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    take = (vals < big * 0.5) & (pos < k)
    s = jnp.sum(jnp.where(take, jnp.sqrt(vals), 0.0), axis=0)
    cnt = jnp.sum(take.astype(jnp.float32), axis=0)
    return s / jnp.maximum(cnt, 1.0)


# Test hook: force the Pallas sortnet path in interpret mode on the CPU
# backend (tests/test_outliers.py monkeypatches this to cover the kernel
# end-to-end without TPU hardware).
_FORCE_PALLAS_INTERPRET = False


def _sortnet_mean_pallas(
    d2p: jax.Array, k: int, big: float, q_valid: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas twin of ``_sortnet_mean``: the identical comparator program
    run in VMEM, planes laid out [16, nc, T] with the QUERY axis as lanes.

    The kernel is min/max only — no multiply-add chains, so Mosaic's FMA
    contraction (the usual Pallas bit-parity hazard, docs/PERFORMANCE.md)
    cannot fire: outputs are bitwise identical to the XLA network on every
    input (verified on hardware, scripts/tpu_experiments13.py), keeping
    the TPU<->CPU crosscheck exact.  Measured 12.5 vs 35.0 ms/batch-of-32
    for the full banded stage at [24576 rows, W=1280] (2.8x): the ~420
    tiny plane ops become one resident kernel instead of XLA's
    materialize-per-op chain.

    ``q_valid`` ([T] bool, optional) enables the dead-chunk skip: a lane
    chunk whose queries are ALL invalid (the post-voxel cloud is
    front-compacted, so the capacity tail is pure padding — ~12.5% of the
    flagship's 24576 rows at ~21.5k live voxels) writes the ``big``
    sentinel planes behind ``pl.when`` instead of running the ~420
    comparators.  Downstream, big-sentinel sorted values produce a 0 mean
    — exactly what ``knn_mean_distances``'s final ``where(valid, ., 0)``
    forces for those rows on every path — so outputs are provably
    identical with the skip on or off.  An SMEM flag row + ``pl.when``
    has NO vmap hazard (unlike ``lax.cond``, which lowers to a
    both-branches select under vmap: the batched flagship measured 2x the
    stage that way — vmap just batches the flag row here; the cluster
    sweep kernels use the same idiom).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, nc, t = d2p.shape
    tc = 256 if t % 256 == 0 else 128
    steps = t // tc

    if q_valid is None:
        def kernel(x_ref, o_ref):
            P = _sortnet_comparators([x_ref[i] for i in range(16)], big, 0)
            for i in range(16):
                o_ref[i, :] = P[i][0]

        vals = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((16, nc, tc), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((16, tc), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, t), jnp.float32),
            interpret=interpret,
        )(d2p)
        return _sortnet_mean_from_sorted(vals, k, big)

    live = jnp.any(q_valid.reshape(steps, tc), axis=1).astype(jnp.int32)

    def kernel(live_ref, x_ref, o_ref):
        @pl.when(live_ref[0, pl.program_id(0)] > 0)
        def _compute():
            P = _sortnet_comparators([x_ref[i] for i in range(16)], big, 0)
            for i in range(16):
                o_ref[i, :] = P[i][0]

        @pl.when(live_ref[0, pl.program_id(0)] == 0)
        def _skip():
            for i in range(16):
                o_ref[i, :] = jnp.full((tc,), big, jnp.float32)

    vals = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, steps), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, nc, tc), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tc), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, t), jnp.float32),
        interpret=interpret,
    )(live.reshape(1, steps), d2p)
    return _sortnet_mean_from_sorted(vals, k, big)


def _kmin_mean(d2: jax.Array, k: int, big: float) -> jax.Array:
    """[T, W] squared distances -> [T] mean of the k smallest sqrt'd,
    excluding sentinel entries (>= big/2), by iterative exact extraction.

    Each pass takes the row minimum and ALL its duplicates at once
    (bounded by the remaining quota), so the result equals sort-take-k
    INCLUDING duplicates -- PCL's semantics -- in at most k passes.  The
    tile is bitcast to int32 (non-negative IEEE floats order-identically
    as signed ints), which makes the per-pass work three [T, W] touches:
    an int min-reduce, an equality+count reduce (the compare is CSE'd
    into the masked rewrite), and the INT32_MAX masking store.

    This is plain XLA on every backend on purpose: the arithmetic is
    min/compare/sqrt plus a fixed-order multiply-add sequence on [T, 1]
    scalars-per-row, the same HLO everywhere, so TPU and CPU produce
    bit-identical results (a Pallas twin was measured no faster -- the
    XLA loop already stays resident -- and was removed).

    (Two rejected variants, measured on v5e: one-element-per-pass with a
    first-lane tiebreak reduce was ~25% slower; a mutation-free
    (value, lane) threshold form ~40% slower.)"""
    t, w = d2.shape
    iv0 = lax.bitcast_convert_type(d2, jnp.int32)  # d2 >= 0: order-preserving
    i32_max = jnp.iinfo(jnp.int32).max
    kf = jnp.float32(k)

    def body(_, state):
        iv, s, taken = state
        m = jnp.min(iv, axis=1, keepdims=True)  # [T, 1] int32
        eq = iv == m
        cnt = jnp.sum(eq.astype(jnp.float32), axis=1, keepdims=True)
        mf = lax.bitcast_convert_type(m, jnp.float32)
        real = mf < big * 0.5  # False for sentinels and exhausted rows
        take = jnp.where(real, jnp.minimum(cnt, kf - taken), 0.0)
        # the where guards NaN: an exhausted row's m is INT32_MAX = NaN bits
        s = s + jnp.where(real, take * jnp.sqrt(mf), 0.0)
        taken = taken + take
        iv = jnp.where(eq, i32_max, iv)
        return iv, s, taken

    _, s, taken = lax.fori_loop(
        0, k, body,
        (iv0, jnp.zeros((t, 1), jnp.float32), jnp.zeros((t, 1), jnp.float32)),
    )
    return s[:, 0] / jnp.maximum(taken[:, 0], 1.0)


def knn_mean_distances(
    cloud: Cloud, k: int, row_tile: int = 512, backend: str = "approx",
    band: int = 1024, skip_dead_tiles: bool = False,
    shard_axis: str | None = None, num_shards: int = 1,
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
        (``_kmin_mean``, identical XLA on every backend) — the same
        ~N_cand/N work reduction as a 27-cell
        grid-hash walk with zero bucketing overhead and no approx-top-k
        recall loss.  Candidates outside the window are missed, so the
        mean distances are an upper bound for rare boundary points
        (statistically invisible to the mu + m*sigma gate; validated vs
        exact in tests/test_outliers.py).
      * "banded_approx": the band window with ``lax.approx_min_k``
        selection (recall 0.98) — kept for comparison.

    ``shard_axis``/``num_shards`` (call inside shard_map only): the query
    TILES are split into ``num_shards`` contiguous ranges — shard s runs
    the per-tile program for its range only and the [N] result is
    re-assembled with a tiled ``all_gather``.  The column side (the whole
    cloud) is replicated on every shard, so each tile's computation is
    THE SAME program as the unsharded path on the same operands: results
    are bitwise identical, while per-shard work drops num_shards-fold
    (the multi-chip scaling path, parallel/sharding.py).  Falls back to
    replicated execution when the tile count does not divide.
    """
    pts = cloud.points
    n = cloud.capacity
    valid = cloud.valid
    row_tile = min(row_tile, n)
    # Pad the QUERY side up to a tile multiple (columns stay at n): an odd
    # capacity must never silently materialize the full [N, N] matrix.
    n_q = -(-n // row_tile) * row_tile

    # Center to tame |p|^2-vs-cross-term cancellation in the expansion.
    # CHANNEL-WISE throughout: the post-voxel cloud arrives as three fused
    # [N] channel vectors (the voxel tail's layout discipline,
    # docs/PERFORMANCE.md round 3); 2-D [N, 3] elementwise ops here would
    # force XLA to materialize/relayout the channel-minor stack (~4
    # ms/batch in the pipeline context, scripts/tpu_experiments41/42.py).
    # Per-channel expressions are the same ops in the same order, so
    # values are unchanged on every backend.
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    # Park invalid points at the center: their *columns* are masked out below,
    # and keeping coordinates small avoids inf/nan in the expansion.
    pch = []
    for c in range(3):
        col = pts[:, c]
        center_c = jnp.sum(jnp.where(valid, col, 0.0)) / denom
        pch.append(jnp.where(valid, col - center_c, 0.0))
    p_sq = pch[0] * pch[0] + pch[1] * pch[1] + pch[2] * pch[2]

    row_ids = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def _k_smallest(d2: jax.Array, kk: int) -> jax.Array:
        """Exact k-smallest per row via hierarchical top-k: chunk-local
        top-k then top-k of the candidate pool.  A flat lax.top_k over the
        full row lowers to a whole-row sort on TPU; the two-level form cuts
        the sorted width from N to 128 + N*k/128."""
        T, N = d2.shape
        chunk = 128
        # kk > chunk: a chunk-local top-k can't produce more candidates
        # than the chunk holds — flat top_k handles wide k (review r5f
        # finding #1: backend='exact' with mean_k > 128 previously failed
        # at trace time)
        if N % chunk or N // chunk < 2 or kk > chunk:
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
        """[T, C] squared distances + k-smallest mean.

        The cross term is explicit full-f32 mul-adds, not a dot: a K=3
        contraction is too narrow for the MXU, and the dot form either
        truncates inputs to bf16 (default precision — perturbs kNN
        distances by ~4e-3 relative, enough to reorder neighbor sets) or
        pays HIGHEST's multi-pass cost (~12% slower than the VPU mul-adds,
        measured).  The same expression tree evaluates identically on
        every backend, like the cluster sweep's.  Self and invalid columns
        get a big finite sentinel (not inf: the mean masks on the sentinel
        instead of isfinite)."""
        cross = (
            q[:, 0:1] * cols[:, 0][None, :]
            + q[:, 1:2] * cols[:, 1][None, :]
            + q[:, 2:3] * cols[:, 2][None, :]
        )
        d2 = q_sq[:, None] + cols_sq[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(c_valid[None, :], d2, big)
        d2 = jnp.where(q_ids[:, None] == c_ids[None, :], big, d2)
        if backend == "banded":
            # exact in-window k-min extraction (plain XLA on every
            # backend — see _kmin_mean) — no approx_min_k recall loss
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

    def _map_query_tiles(tile_fn, operands):
        """lax.map over query tiles; optionally sharded over ``shard_axis``
        (contiguous tile ranges + tiled all_gather — see docstring)."""
        if shard_axis is None or num_shards <= 1 or tiles % num_shards:
            return lax.map(tile_fn, operands)
        tl = tiles // num_shards
        s = lax.axis_index(shard_axis)
        local = tuple(
            lax.dynamic_slice_in_dim(a, s * tl, tl, axis=0) for a in operands
        )
        return lax.all_gather(lax.map(tile_fn, local), shard_axis, tiled=True)
    q_ch = [jnp.pad(pc, (0, pad)) for pc in pch]  # three [n_q] channels
    q_sq = jnp.pad(p_sq, (0, pad))
    # padded query rows get ids >= n: they never match a column and their
    # outputs are sliced off below
    q_ids = jnp.pad(row_ids, (0, pad), constant_values=n)
    # Dead-query-tile skip (``skip_dead_tiles``): the post-voxel cloud is
    # front-compacted, so trailing query tiles hold only parked padding
    # whose outputs the final `where(valid, ...)` discards — lax.cond
    # returns zeros for them without the distance/selection work.
    # Identical results by construction.  OFF by default and only for
    # unbatched programs: under vmap the batched cond lowers to a select
    # that measured ~2x the stage cost on the batched flagship (27.1 vs
    # 13.9 ms/batch, scripts/profile_prefix.py A/B) — but the single
    # fullscale window (166k valid in a 262144 buffer, ~37% dead tiles)
    # gains 15.3 -> 11.4 ms (scripts/tpu_experiments47.py).
    tile_live = (
        jnp.any(jnp.pad(valid, (0, pad)).reshape(tiles, row_tile), axis=1)
        if skip_dead_tiles
        else None
    )

    if backend in ("banded", "banded_approx") and row_tile + 2 * band < n:
        # rank-window candidates: query tile t scores a contiguous column
        # slice of ``width`` columns, clamped inside the buffer
        width = row_tile + 2 * band
        starts = jnp.clip(
            lax.broadcasted_iota(jnp.int32, (tiles, 1), 0)[:, 0] * row_tile
            - band,
            0,
            n - width,
        )
        use_sortnet = backend == "banded" and width % 16 == 0 and k <= 16
        # Pallas network: query axis as lanes — needs a 128-multiple tile
        use_pallas_net = (
            use_sortnet
            and row_tile % 128 == 0
            and (jax.default_backend() == "tpu" or _FORCE_PALLAS_INTERPRET)
        )

        def _score_tile_planes(qc, q_sq, q_ids, q_val, colc, cols_sq, c_ids, c_valid):
            """Banded tile in PLANE layout: the [T, W] distance tile is
            computed directly as 16 position planes (plane p, chunk c =
            window column c*16+p) by reshaping the column operands — no
            transpose of the big tile — and selected by the sorting
            network.  On TPU the network runs as the Pallas VMEM kernel
            (``_sortnet_mean_pallas``, planes [16, nc, T] with queries as
            lanes); elsewhere as the XLA form (``_sortnet_mean``, planes
            [16, T, nc]).  Identical comparator sequence + elementwise
            distance expression => bitwise-identical results either way.
            ``qc``/``colc`` are per-channel query/column vectors: the tile
            is channel-wise end to end (same per-element expressions, so
            the values are unchanged — no [., 3] stack to relayout).
            """
            nc = width // 16
            qx, qy, qz = qc

            if use_pallas_net:

                def as_planes(v):  # [W] -> [16, nc, 1]
                    return v.reshape(nc, 16).T[:, :, None]

                cx, cy, cz = (as_planes(c) for c in colc)
                cross = (
                    qx[None, None, :] * cx
                    + qy[None, None, :] * cy
                    + qz[None, None, :] * cz
                )
                d2 = q_sq[None, None, :] + as_planes(cols_sq) - 2.0 * cross
                d2 = jnp.maximum(d2, 0.0)
                d2 = jnp.where(as_planes(c_valid), d2, big)
                d2 = jnp.where(q_ids[None, None, :] == as_planes(c_ids), big, d2)
                return _sortnet_mean_pallas(
                    d2, k, big, q_valid=q_val, interpret=_FORCE_PALLAS_INTERPRET
                )

            def as_planes(v):  # [W] -> [16, 1, nc]
                return v.reshape(nc, 16).T[:, None, :]

            cx, cy, cz = (as_planes(c) for c in colc)
            cross = (
                qx[None, :, None] * cx
                + qy[None, :, None] * cy
                + qz[None, :, None] * cz
            )
            d2 = q_sq[None, :, None] + as_planes(cols_sq) - 2.0 * cross
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(as_planes(c_valid), d2, big)
            d2 = jnp.where(q_ids[None, :, None] == as_planes(c_ids), big, d2)
            return _sortnet_mean([d2[i] for i in range(16)], k, big)

        def band_tile_fn(args):
            qx, qy, qz, qq, qi, qv, start = args[:7]

            def compute(_):
                colc = [lax.dynamic_slice(pc, (start,), (width,)) for pc in pch]
                cols_sq = lax.dynamic_slice(p_sq, (start,), (width,))
                c_ids = lax.dynamic_slice(row_ids, (start,), (width,))
                c_valid = lax.dynamic_slice(valid, (start,), (width,))
                if use_sortnet:
                    return _score_tile_planes(
                        (qx, qy, qz), qq, qi, qv, colc, cols_sq, c_ids, c_valid
                    )
                q = jnp.stack([qx, qy, qz], axis=-1)
                cols = jnp.stack(colc, axis=-1)
                return _score_tile(q, qq, qi, cols, cols_sq, c_ids, c_valid)

            if tile_live is None:
                return compute(0)
            return lax.cond(
                args[7], compute, lambda _: jnp.zeros((row_tile,), jnp.float32), 0
            )

        operands = (
            q_ch[0].reshape(tiles, row_tile),
            q_ch[1].reshape(tiles, row_tile),
            q_ch[2].reshape(tiles, row_tile),
            q_sq.reshape(tiles, row_tile),
            q_ids.reshape(tiles, row_tile),
            jnp.pad(valid, (0, pad)).reshape(tiles, row_tile),
            starts,
        )
        if tile_live is not None:
            operands = operands + (tile_live,)
        out = _map_query_tiles(band_tile_fn, operands)
    else:
        # NOTE (review r5f finding #2): these [*, 3] channel-minor stacks
        # lane-pad 3 -> 128 on TPU (CLAUDE.md layout facts) — a known
        # inefficiency of this NON-default full-width path (the shipped
        # banded path passes channel-separate operands).  Left as-is:
        # re-laying out _score_tile is unmeasured churn on a path only
        # reached via backend='approx'/'exact' overrides.
        p2d = jnp.stack(pch, axis=-1)
        q_p = jnp.stack(q_ch, axis=-1)

        def tile_fn(args):
            q, qq, qi = args[:3]
            if tile_live is None:
                return _score_tile(q, qq, qi, p2d, p_sq, row_ids, valid)
            return lax.cond(
                args[3],
                lambda _: _score_tile(q, qq, qi, p2d, p_sq, row_ids, valid),
                lambda _: jnp.zeros((row_tile,), jnp.float32),
                0,
            )

        operands = (
            q_p.reshape(tiles, row_tile, 3),
            q_sq.reshape(tiles, row_tile),
            q_ids.reshape(tiles, row_tile),
        )
        if tile_live is not None:
            operands = operands + (tile_live,)
        out = _map_query_tiles(tile_fn, operands)
    return jnp.where(valid, out.reshape(n_q)[:n], 0.0)


class OutlierResult(NamedTuple):
    cloud: Cloud  # same buffer, mask restricted to inliers
    mean_distances: jax.Array  # [N] float32 per-point kNN mean distance
    threshold: jax.Array  # [] float32 mu + sigma * mult


def remove_statistical_outliers(
    cloud: Cloud, mean_k: int, std_dev_mult: float, row_tile: int = 512,
    backend: str = "approx", band: int = 1024, skip_dead_tiles: bool = False,
    shard_axis: str | None = None, num_shards: int = 1,
) -> OutlierResult:
    """Full filter (obstacle_detection.cpp:326-330 semantics).

    With ``shard_axis`` set (inside shard_map), the O(N*W) kNN work is
    split over query-tile ranges per shard; the gathered [N] mean-distance
    vector is then replicated, so the cheap O(N) mu/sigma reduction below
    runs the SAME full-array reduce as the unsharded path — keep decisions
    are bitwise identical to single-chip."""
    d = knn_mean_distances(
        cloud, mean_k, row_tile, backend, band, skip_dead_tiles,
        shard_axis=shard_axis, num_shards=num_shards,
    )
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
