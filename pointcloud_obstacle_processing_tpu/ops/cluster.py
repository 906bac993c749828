"""Euclidean cluster extraction (pcl::EuclideanClusterExtraction equivalent).

Reference: extract_euclidian_clusters (obstacle_detection.cpp:430-455) — PCL
BFS flood fill over KD-tree radius neighbors (dist <= tolerance), then a
[min,max] size gate, clusters sorted by size descending (PCL sorts at the end
of extraction).  This is the reference's self-reported slowest stage
(cpp:721, :886-887).

TPU-native design (SURVEY.md §7 step 7): connected components of the
"distance <= tolerance" graph via **min-label propagation with pointer
jumping** over a fixed-capacity compacted buffer:

* every valid point starts labeled with its own index;
* one sweep recomputes ``label[i] = min(label[j])`` over all neighbors j —
  the neighbor test is a tiled [T, C] distance expansion on the MXU (the
  adjacency is never materialized in HBM);
* between sweeps, labels are path-compressed by repeated ``l = min(l, l[l])``
  gathers (pointer jumping), which turns O(diameter) convergence into
  O(log diameter) sweeps;
* a ``lax.while_loop`` runs sweeps until a fixed point (statically bounded
  by ``cluster_max_iters``).

The final label of each point is the minimum point index in its component —
a canonical, order-independent cluster id.  Cluster slots are then assigned
by size descending (ties: smaller root index first — identical to PCL's
stable discovery-order tie behavior).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud, ClusterSet, PointIndicesArray, PointWithRad

# Capacity bound for the one-hot segment-min/count forms below: XLA's
# scatter serializes at ~20+ cycles/element (CLAUDE.md), charging the
# sweep loop ~0.75 ms/batch-of-32 PER SWEEP at C=1024, while a fused
# compare+select+min-reduce over [C, C] is a VPU pass XLA never
# materializes.  min/count over int32 are associative-exact, so both
# forms are bitwise identical; above this bound the [C, C] pass's O(C^2)
# work overtakes the scatter's O(C) (fullscale C=16384 keeps scatters).
ONEHOT_SEGMENT_MAX = 2048

__all__ = ["euclidean_cluster", "cluster_centroids", "ClusterOutput"]


def _sweep_tile_size(n: int, cols: int | None = None) -> int:
    """Query-tile height for the Pallas sweep: the largest divisor of n
    that is a multiple of 8, capped so a [T, cols] f32 tile stays ~4 MB
    (VMEM holds a few such temporaries); 0 if none exists — including
    when even the smallest [8, cols] tile would blow the budget (huge
    column tables fall back to the XLA sweep instead of a Mosaic VMEM
    failure; review r5e finding #5).  ``cols`` defaults to ``n``; the
    SHARDED caller passes the full column-table width, which is what the
    kernel's temporaries actually span — sizing by the per-shard query
    count alone over-tiles (review r5e finding #2)."""
    cols = n if cols is None else cols
    budget = (1 << 20) // max(cols, 1)
    if budget < 8:
        return 0
    cap = min(n, 256, budget)
    for t in range(cap, 7, -1):
        if n % t == 0 and t % 8 == 0:
            return t
    return 0


def _qslice_1d(a: jax.Array, qslice) -> jax.Array:
    """Query-side row slice: ``a[q_off : q_off + q_len]`` (identity when
    ``qslice`` is None).  The sweep variants below use it to run only a
    contiguous query-row range — the unit of multi-chip sharding — while
    the column side stays the full (replicated) cloud, so each query row's
    arithmetic is unchanged and results are bitwise identical to the
    unsliced sweep."""
    if qslice is None:
        return a
    q_off, q_len = qslice
    return lax.dynamic_slice_in_dim(a, q_off, q_len, axis=0)


def _pallas_sweep_jump(
    pts: jax.Array, valid: jax.Array, labels: jax.Array, tol2: float, tile: int,
    qslice=None,
) -> jax.Array:
    """Fused ``min(neighbor labels ∪ {label[label]})`` sweep in VMEM.

    One kernel pass computes, per query tile, the [T, C] squared distances
    (explicit mul-adds on the VPU — the [T,3]x[3,C] contraction is too
    narrow for the MXU anyway), masks to the adjacency ``d2 <= tol2``, ORs
    in the pointer-jump column ``col == label[i]`` (so every sweep also
    path-compresses one hop for free), and lane-min-reduces — with NO [T, C]
    HBM materialization.  Measured 2.7 ms/batch-of-32 at C=4096 on v5e vs
    ~9 ms for the XLA tiled sweep + ~2 ms per separate jump gather.
    ``qslice=(q_off, q_len)`` restricts the QUERY rows (sharding); columns
    stay full, so sliced outputs equal the same rows of the full sweep.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = pts.shape[0]
    Q = C if qslice is None else qslice[1]
    tiles = Q // tile

    def kernel(any_ref, xs, ys, zs, lt, xr, yr, zr, sqc, sqr, lr, vc, vr, out):
        # Valid-tile skip: the cloud arrives front-compacted (ops/compaction),
        # so trailing query tiles are pure padding.  A fully-invalid tile's
        # rows would each compute min(cand) = C (adj is all-false and the
        # jump column lands on the row's own invalid index, whose lab_row
        # entry is the C sentinel) — write that directly and skip the
        # [T, C] distance work.  Bitwise identical by construction.
        @pl.when(any_ref[0, pl.program_id(0)] > 0)
        def _compute():
            cross = xs[:] * xr[:] + ys[:] * yr[:] + zs[:] * zr[:]  # [T, C]
            d2 = sqc[:] + sqr[:] - 2.0 * cross
            adj = (d2 <= tol2) & (vr[:] > 0) & (vc[:] > 0)
            hit = adj | (lt[:] == _col_iota(d2.shape))
            cand = jnp.where(hit, lr[:], jnp.int32(C))
            out[:] = jnp.min(cand, axis=1, keepdims=True)

        @pl.when(any_ref[0, pl.program_id(0)] == 0)
        def _skip():
            out[:] = jnp.full((tile, 1), jnp.int32(C))

    def _col_iota(shape):
        return lax.broadcasted_iota(jnp.int32, shape, 1)

    col = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)

    sq = jnp.sum(pts * pts, axis=-1)
    vi = valid.astype(jnp.int32)
    q_pts = _qslice_1d(pts, qslice)
    q_sq = _qslice_1d(sq, qslice)
    q_vi = _qslice_1d(vi, qslice)
    q_lab = _qslice_1d(labels, qslice)
    tile_any = jnp.any(
        _qslice_1d(valid, qslice).reshape(tiles, tile), axis=1
    ).astype(jnp.int32)
    # invalid points keep their (self) label out of every min: sentinel C
    lab_row = jnp.where(valid, labels, jnp.int32(C))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((1, tiles), lambda i: (0, 0), memory_space=pltpu.SMEM),
                  col(), col(), col(), col(), row(), row(), row(),
                  col(), row(), row(), col(), row()],
        out_specs=col(),
    )(
        tile_any.reshape(1, tiles),
        q_pts[:, 0:1], q_pts[:, 1:2], q_pts[:, 2:3], q_lab[:, None],
        pts[:, 0].reshape(1, C), pts[:, 1].reshape(1, C), pts[:, 2].reshape(1, C),
        q_sq.reshape(Q, 1), sq.reshape(1, C),
        lab_row.reshape(1, C), q_vi.reshape(Q, 1), vi.reshape(1, C),
    )
    return out[:, 0]


def _band_starts(
    pts: jax.Array, valid: jax.Array, tile: int, window: int, tolerance: float
):
    """Per-query-tile column-window starts for the BANDED sweep.

    The compacted non-plane cloud arrives in voxel-lattice order, so x is
    non-decreasing up to intra-voxel jitter.  Every tolerance edge from a
    tile-t query therefore lands in a contiguous rank range; bound it
    soundly with monotone envelopes (no sortedness assumption):

      lo(t) = count of j with runmax_x[j] < min_x(tile) - tol   (all
              earlier j are strictly out of reach: their x < min_x - tol)
      hi(t) = n - count of j with runmin-from-right_x[j] > max_x(tile) + tol

    Starts are clamped into [0, n - window] and aligned DOWN to 128 (DMA
    minor-dim alignment); ``overflow`` flags any tile whose true span
    hi - start exceeds ``window`` — edges past the window are dropped
    (labels may split), so callers surface it (StageStats).  Invalid
    (padding) points are parked at the valid centroid by the caller, so
    they never stretch the envelopes.
    """
    n = pts.shape[0]
    tiles = n // tile
    tol = jnp.float32(tolerance)
    # invalid points (parked at the centroid by the caller) are masked out
    # of the envelopes: they carry no edges, so the window need not cover
    # them — and their parked x would otherwise poison the suffix min
    x_hi = jnp.where(valid, pts[:, 0], -jnp.inf)  # for the prefix max
    x_lo = jnp.where(valid, pts[:, 0], jnp.inf)  # for the suffix min

    runmax = x_hi
    d = 1
    while d < n:  # prefix running max, log-shift steps
        shifted = jnp.concatenate([jnp.full((d,), -jnp.inf, runmax.dtype), runmax[:-d]])
        runmax = jnp.maximum(runmax, shifted)
        d *= 2
    runmin_r = x_lo
    d = 1
    while d < n:  # suffix running min
        shifted = jnp.concatenate([runmin_r[d:], jnp.full((d,), jnp.inf, runmin_r.dtype)])
        runmin_r = jnp.minimum(runmin_r, shifted)
        d *= 2

    xt = pts[:, 0].reshape(tiles, tile)
    vt = valid.reshape(tiles, tile)
    tmin = jnp.min(jnp.where(vt, xt, jnp.inf), axis=1)
    tmax = jnp.max(jnp.where(vt, xt, -jnp.inf), axis=1)
    lo = jnp.sum(
        (runmax[None, :] < (tmin[:, None] - tol)).astype(jnp.int32), axis=1
    )
    hi = n - jnp.sum(
        (runmin_r[None, :] > (tmax[:, None] + tol)).astype(jnp.int32), axis=1
    )
    start = jnp.clip(lo, 0, n - window) // 128 * 128
    # an all-invalid tile has tmin=+inf => lo=n; clamp handled above
    overflow = jnp.any((hi - start) > window)
    return start, overflow


def _xla_sweep_jump(
    pts: jax.Array, valid: jax.Array, labels: jax.Array, tol2, row_tile: int,
    qslice=None,
) -> jax.Array:
    """XLA fallback for the fused sweep+jump, tiled over query rows.

    The distance arithmetic is the SAME explicit mul-add expression as the
    Pallas kernel (not a dot): TPU and CPU backends then evaluate the
    identical f32 expression tree, keeping cluster connectivity — and the
    full-pipeline crosscheck — bit-identical across backends.
    ``qslice=(q_off, q_len)`` restricts the query rows (q_len must be a
    row_tile multiple); columns stay full.
    """
    n = pts.shape[0]
    p_sq = jnp.sum(pts * pts, axis=-1)
    labels_col = jnp.where(valid, labels, jnp.int32(n))  # invalid cols never win
    col_ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def tile_fn(args):
        q, q_sq, q_lab, q_valid = args
        cross = (
            q[:, 0:1] * pts[None, :, 0]
            + q[:, 1:2] * pts[None, :, 1]
            + q[:, 2:3] * pts[None, :, 2]
        )
        d2 = q_sq[:, None] + p_sq[None, :] - 2.0 * cross
        adj = (d2 <= tol2) & valid[None, :] & q_valid[:, None]
        hit = adj | (q_lab[:, None] == col_ids)  # fused pointer jump
        cand = jnp.where(hit, labels_col[None, :], jnp.int32(n))
        return jnp.minimum(jnp.min(cand, axis=1), q_lab)

    if qslice is None:
        n_q = -(-n // row_tile) * row_tile  # query rows padded to a tile multiple
        pad = n_q - n
        q_pts = jnp.pad(pts, ((0, pad), (0, 0)))
        q_sq = jnp.pad(p_sq, (0, pad))
        q_lab = jnp.pad(labels, (0, pad), constant_values=n)
        q_valid = jnp.pad(valid, (0, pad))
    else:
        n_q = qslice[1]
        q_pts = _qslice_1d(pts, qslice)
        q_sq = _qslice_1d(p_sq, qslice)
        q_lab = _qslice_1d(labels, qslice)
        q_valid = _qslice_1d(valid, qslice)
    tiles = n_q // row_tile
    out = lax.map(
        tile_fn,
        (
            q_pts.reshape(tiles, row_tile, 3),
            q_sq.reshape(tiles, row_tile),
            q_lab.reshape(tiles, row_tile),
            q_valid.reshape(tiles, row_tile),
        ),
    )
    return out.reshape(n_q)[: (n if qslice is None else n_q)]


def _xla_sweep_jump_banded(
    pts, valid, labels, tol2, tile: int, window: int, starts, qslice=None
) -> jax.Array:
    """Banded XLA sweep: query tile t scores only its ``window`` columns at
    ``starts[t]`` (the x-envelope window, ``_band_starts``) — the same
    fused expression as ``_xla_sweep_jump`` over a dynamic_slice.
    ``qslice=(q_off, q_len)`` restricts the query rows (q_off/q_len must be
    tile multiples); columns and starts indexing stay global."""
    n = pts.shape[0]
    Q = n if qslice is None else qslice[1]
    tiles = Q // tile
    p_sq = jnp.sum(pts * pts, axis=-1)
    labels_col = jnp.where(valid, labels, jnp.int32(n))

    def tile_fn(args):
        q, q_sq, q_lab, q_valid, start = args
        cols = lax.dynamic_slice(pts, (start, 0), (window, 3))
        cols_sq = lax.dynamic_slice(p_sq, (start,), (window,))
        c_lab = lax.dynamic_slice(labels_col, (start,), (window,))
        c_valid = lax.dynamic_slice(valid, (start,), (window,))
        col_ids = start + lax.broadcasted_iota(jnp.int32, (1, window), 1)
        cross = (
            q[:, 0:1] * cols[None, :, 0]
            + q[:, 1:2] * cols[None, :, 1]
            + q[:, 2:3] * cols[None, :, 2]
        )
        d2 = q_sq[:, None] + cols_sq[None, :] - 2.0 * cross
        adj = (d2 <= tol2) & c_valid[None, :] & q_valid[:, None]
        hit = adj | (q_lab[:, None] == col_ids)
        cand = jnp.where(hit, c_lab[None, :], jnp.int32(n))
        return jnp.minimum(jnp.min(cand, axis=1), q_lab)

    q_starts = (
        starts if qslice is None
        else lax.dynamic_slice_in_dim(starts, qslice[0] // tile, tiles, axis=0)
    )
    out = lax.map(
        tile_fn,
        (
            _qslice_1d(pts, qslice).reshape(tiles, tile, 3),
            _qslice_1d(p_sq, qslice).reshape(tiles, tile),
            _qslice_1d(labels, qslice).reshape(tiles, tile),
            _qslice_1d(valid, qslice).reshape(tiles, tile),
            q_starts,
        ),
    )
    return out.reshape(Q)


def _pallas_sweep_jump_banded(
    pts, valid, labels, tol2: float, tile: int, window: int, starts,
    tile_live=None, qslice=None,
) -> jax.Array:
    """Banded fused sweep as a Pallas kernel: per query tile, one DMA pulls
    the tile's ``window`` columns (x/y/z/|p|²/valid + labels) from HBM at
    the 128-aligned ``starts[t]`` offset into VMEM scratch, then the same
    distance/adjacency/jump/lane-min arithmetic as ``_pallas_sweep_jump``
    runs over W-chunked slabs (the [T, window] tile would blow VMEM at
    window=16k).  Work is C*window instead of C*C — 2.5x at the fullscale
    shape (40960 capacity, 16384 window).  ``qslice=(q_off, q_len)``
    restricts the query tiles (sharding); the column table stays full."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = pts.shape[0]
    Q = C if qslice is None else qslice[1]
    tiles = Q // tile
    sq = jnp.sum(pts * pts, axis=-1)
    # one [8, C] f32 column table (Mosaic DMA slices must be 8-aligned on
    # the sublane dim): x, y, z, |p|^2, valid, label (exact as f32 for
    # C < 2^24), 2 pad rows.  Labels change per sweep; restacking the
    # table is an elementwise copy, trivial next to the sweep itself.
    zero = jnp.zeros_like(sq)
    fcols = jnp.stack(
        [
            pts[:, 0], pts[:, 1], pts[:, 2], sq,
            valid.astype(jnp.float32),
            jnp.where(valid, labels, jnp.int32(C)).astype(jnp.float32),
            zero, zero,
        ],
        axis=0,
    )  # [8, C]
    wchunk = min(window, 2048)

    def kernel(starts_ref, any_ref, xs, ys, zs, lt, sqc, vc, fcols_hbm, out,
               fscr, sem1):
        i = pl.program_id(0)

        # Tile skip, two exactly-equivalent cases behind one flag:
        # (1) padding tiles — the compacted cloud's trailing tiles hold no
        # valid rows (fullscale preset: ~57% of them), and each such row
        # reduces to min(best=C, lt) = lt (adj all-false; the jump column
        # either misses the window or lands on the C sentinel);
        # (2) converged tiles (``tile_live`` from the caller's frontier
        # tracking) — a tile's output depends only on its window's labels,
        # and when none of those changed since the previous sweep, writing
        # the current labels through is equivalent downstream: the hook's
        # scatter of lt_i to labels[i] is a no-op (labels[i] <= i and the
        # scatter's base is labels itself), and min(hook_i, lt_i) ==
        # min(hook_i, true nbr_min_i) because hook_i <= lt_i <= nbr_min_i.
        # Either way: skip the window DMA + distance math, out = lt.
        @pl.when(any_ref[0, i] > 0)
        def _compute():
            # starts are built 128-aligned (_band_starts); the hint lets
            # Mosaic prove the DMA's minor-dim tile alignment for the
            # dynamic offset
            start = pl.multiple_of(starts_ref[0, i], 128)
            cp = pltpu.make_async_copy(
                fcols_hbm.at[:, pl.ds(start, window)], fscr, sem1
            )
            cp.start()
            cp.wait()

            best = jnp.full((tile, 1), jnp.float32(C))
            for w0 in range(0, window, wchunk):
                xr = fscr[0:1, w0 : w0 + wchunk]
                yr = fscr[1:2, w0 : w0 + wchunk]
                zr = fscr[2:3, w0 : w0 + wchunk]
                sqr = fscr[3:4, w0 : w0 + wchunk]
                vr = fscr[4:5, w0 : w0 + wchunk]
                lr = fscr[5:6, w0 : w0 + wchunk]
                cross = xs[:] * xr + ys[:] * yr + zs[:] * zr  # [T, wchunk]
                d2 = sqc[:] + sqr - 2.0 * cross
                adj = (d2 <= tol2) & (vr > 0.0) & (vc[:] > 0.0)
                cols = (
                    start + w0
                    + lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                )
                hit = adj | (lt[:] == cols)
                cand = jnp.where(hit, lr, jnp.float32(C))
                best = jnp.minimum(best, jnp.min(cand, axis=1, keepdims=True))
            # float labels < 2^24 are exact; min over floats == min over ints
            out[:] = jnp.minimum(best.astype(jnp.int32), lt[:])

        @pl.when(any_ref[0, i] == 0)
        def _skip():
            out[:] = lt[:]

    col = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vi = valid.astype(jnp.float32)
    q_valid = _qslice_1d(valid, qslice)
    tile_any = jnp.any(q_valid.reshape(tiles, tile), axis=1).astype(jnp.int32)
    q_starts = (
        starts if qslice is None
        else lax.dynamic_slice_in_dim(starts, qslice[0] // tile, tiles, axis=0)
    )
    if tile_live is not None:
        q_live = (
            tile_live if qslice is None
            else lax.dynamic_slice_in_dim(tile_live, qslice[0] // tile, tiles, axis=0)
        )
        tile_any = tile_any * q_live.astype(jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, tiles), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tiles), lambda i: (0, 0), memory_space=pltpu.SMEM),
            col(), col(), col(), col(), col(), col(),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=col(),
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(
        q_starts.reshape(1, tiles),
        tile_any.reshape(1, tiles),
        _qslice_1d(pts, qslice)[:, 0:1],
        _qslice_1d(pts, qslice)[:, 1:2],
        _qslice_1d(pts, qslice)[:, 2:3],
        _qslice_1d(labels, qslice)[:, None],
        _qslice_1d(sq, qslice)[:, None],
        _qslice_1d(vi, qslice)[:, None],
        fcols,
    )
    return out[:, 0]


def _neighbor_min_sweep(
    pts: jax.Array, valid: jax.Array, labels: jax.Array, tol2, row_tile: int,
    use_pallas: bool | None = None,
    band: tuple | None = None,
    tile_live=None,
    shard_axis: str | None = None,
    num_shards: int = 1,
) -> jax.Array:
    """One fused ``label[i] <- min over {i} ∪ neighbors(i) ∪ {label[label[i]]}``
    pass.  Pallas VMEM kernel on TPU, identical-arithmetic XLA tiles
    elsewhere (and for capacities the kernel's tiling cannot cover).

    Cross-backend caveat (review r5e finding #4): on TPU the PALLAS
    kernel runs, whose Mosaic-compiled d2 may FMA-contract differently
    from the XLA expression — a pair whose d2 lands within ~1 ulp of
    tol2 could therefore flip its adjacency bit vs the CPU run, changing
    labels.  This is a measure-zero data coincidence, not a structural
    guarantee: the full-pipeline TPU<->CPU crosscheck validates it
    EMPIRICALLY on the benchmarked scenes (bit-identical grids observed
    every round), and the seed margin above keeps chain seeding strictly
    inside what either arithmetic accepts.  The XLA-vs-XLA paths (CPU
    test suite, the fallback tiles) ARE structurally bit-identical.
    ``band``: optional (tile, window, starts) from ``_band_starts`` — the
    sweep then scores only each tile's x-envelope window.  ``tile_live``:
    optional [tiles] frontier flags (see the banded kernel's skip note);
    the XLA fallback ignores them — skipping is provably output-identical,
    so gated TPU and ungated CPU still agree bitwise.

    ``shard_axis``/``num_shards`` (inside shard_map only): the query rows
    split into num_shards contiguous ranges — each shard sweeps only its
    range against the full (replicated) column table and the [n] result is
    re-assembled with a tiled ``all_gather``.  Per-row arithmetic is the
    unsliced program's, so labels are bitwise identical to the unsharded
    sweep while per-shard work drops num_shards-fold.  Falls back to the
    replicated sweep when the row count does not shard evenly."""
    n = pts.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def run(qslice):
        q_len = n if qslice is None else qslice[1]
        if band is not None:
            btile, window, starts = band
            if use_pallas:
                return _pallas_sweep_jump_banded(
                    pts, valid, labels, float(tol2), btile, window, starts,
                    tile_live, qslice=qslice,
                )
            return _xla_sweep_jump_banded(
                pts, valid, labels, tol2, btile, window, starts, qslice=qslice
            )
        tile = _sweep_tile_size(q_len, cols=n)
        if use_pallas and tile:
            return _pallas_sweep_jump(
                pts, valid, labels, float(tol2), tile, qslice=qslice
            )
        rt = row_tile if q_len % row_tile == 0 else math.gcd(row_tile, q_len)
        return _xla_sweep_jump(pts, valid, labels, tol2, rt, qslice=qslice)

    rps = n // num_shards if num_shards > 1 else n
    can_shard = (
        shard_axis is not None
        and num_shards > 1
        and n % num_shards == 0
        and (band is None or rps % band[0] == 0)
    )
    if not can_shard:
        return run(None)
    s = lax.axis_index(shard_axis)
    return lax.all_gather(run((s * rps, rps)), shard_axis, tiled=True)


class ClusterOutput(NamedTuple):
    clusters: ClusterSet
    labels: jax.Array  # [C] int32 raw component roots (min index), self for invalid
    root_slot: jax.Array  # [C] int32 root index -> slot id or -1
    overflow: jax.Array  # [] bool: more gated clusters than max_clusters
    # [] bool: band_window was set and some tile's true x-envelope span
    # exceeded it — edges past the window were dropped (clusters may
    # split); False when band_window == 0 (full sweep)
    band_overflow: jax.Array = jnp.bool_(False)
    # [] bool: label propagation hit cluster_max_iters with changes still
    # pending — labels are NOT at the fixpoint (clusters may split);
    # raise cluster_max_iters
    unconverged: jax.Array = jnp.bool_(False)


def euclidean_cluster(
    cloud: Cloud,
    tolerance: float,
    min_size: int,
    max_size: int,
    max_clusters: int,
    max_iters: int = 64,
    row_tile: int = 512,
    band_window: int = 0,
    shard_axis: str | None = None,
    num_shards: int = 1,
) -> ClusterOutput:
    """Connected components + size gate + size-descending slot assignment.

    ``band_window`` > 0 enables the BANDED sweep: each query tile scores
    only a ``band_window``-wide contiguous column range derived from the
    x monotone envelopes (``_band_starts``) — sweep work drops from C² to
    C*window.  Sound because the compacted cloud arrives in voxel-lattice
    order (x non-decreasing up to intra-voxel jitter, handled by the
    envelopes): a window covering every tolerance edge yields the EXACT
    full-sweep components; a too-small window raises ``band_overflow``
    (observable in StageStats) instead of failing silently.

    ``shard_axis``/``num_shards`` (inside shard_map only): each while-loop
    sweep — the O(C*window) bulk of the stage — runs its query-row range
    per shard and all_gathers the [C] label vector back (bitwise identical
    to the unsharded sweep; see ``_neighbor_min_sweep``).  The cheap O(C)
    glue (seeding, hook, jump, sizes, slots) stays replicated, so every
    shard carries identical labels and the loop runs lockstep."""
    pts = cloud.points
    valid = cloud.valid
    n = cloud.capacity
    row_tile = min(row_tile, n)  # odd capacities are query-padded in the sweep

    # Center + park invalid at the centroid (their rows/cols are masked out).
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
    p = jnp.where(valid[:, None], pts - center, 0.0)
    # tolerance is a compile-time constant (config value): keep tol2 a
    # PYTHON float so the Pallas kernel can close over it as a literal
    tol2 = float(tolerance) ** 2

    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    # ---- chain seeding ----------------------------------------------------
    # Consecutive-rank points within tolerance are REAL graph edges (the
    # voxel stage emits lattice order, so clusters arrive as runs); seed
    # each run with its head index via an inclusive max-scan.  Any valid
    # under-approximation of the component (labels[i] = index of an
    # in-component point <= i) converges to the SAME fixpoint (the
    # component min index), just in fewer sweeps (~7-8 -> ~4 measured).
    # The threshold carries a margin so a seed edge can never exceed what
    # the sweep's own (possibly FMA-contracted) d2 arithmetic would
    # reject — over-merges are irreversible, borderline pairs are left
    # for the sweeps.  The sweep computes d2 in the EXPANDED
    # |p|^2+|q|^2-2p.q form, whose cancellation error is ABSOLUTE
    # (~|p|^2 * f32-eps): a purely relative tol2*1e-6 margin under-covers
    # whenever tol2 << |p|^2 (review r5e finding #1), so the margin also
    # carries an absolute term of 2^-20 * max|p|^2 (~8x the worst-case
    # expanded-form error; p is centered above, bounding max|p|^2 by the
    # cloud's extent).  Seeding is an under-approximation: a too-wide
    # margin only costs sweeps, never correctness.
    prev = jnp.concatenate([p[:1], p[:-1]], axis=0)
    gap2 = jnp.sum((p - prev) * (p - prev), axis=-1)
    prev_valid = jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
    maxsq = jnp.max(jnp.where(valid, jnp.sum(p * p, axis=-1), 0.0))
    seed_thresh = tol2 * (1.0 - 1e-6) - maxsq * (2.0**-20)
    chain = valid & prev_valid & (gap2 <= seed_thresh)
    head = valid & ~chain
    run_head = jnp.where(head, idx, -1)
    d = 1
    while d < n:  # inclusive max-scan, explicit log-shift steps (exact ints)
        run_head = jnp.maximum(
            run_head,
            jnp.concatenate([jnp.full((d,), -1, run_head.dtype), run_head[:-d]]),
        )
        d *= 2
    labels0 = jnp.where(valid, run_head, idx)  # invalid: stays self

    band = None
    band_overflow = jnp.bool_(False)
    if band_window and 128 <= band_window < n and n % 128 == 0:
        btile = 128
        starts, band_overflow = _band_starts(p, valid, btile, band_window, tolerance)
        band = (btile, band_window, starts)

    def cond(state):
        labels, changed, it = state
        return jnp.any(changed) & (it < max_iters)

    # Frontier tracking for the banded sweep: a tile's output depends only
    # on the labels inside its column window, so once no label in that
    # window changed between sweeps the tile is converged and the Pallas
    # kernel skips it (output-identical — see the kernel's skip note).
    # ``changed`` is carried as a per-point vector; a window's change count
    # is a prefix-sum difference.  The fullscale window converges in ~24
    # sweeps but the frontier collapses after the first few: most sweeps
    # then touch a handful of tiles instead of all 128.
    track_frontier = band is not None and jax.default_backend() == "tpu"

    def _frontier_live(changed_vec):
        btile, window, starts = band
        cs = jnp.cumsum(changed_vec.astype(jnp.int32))
        hi = cs[starts + (window - 1)]
        lo = jnp.where(starts > 0, cs[jnp.maximum(starts - 1, 0)], 0)
        return (hi - lo) > 0

    def body(state):
        labels, changed, it = state
        # Fused sweep: neighborhood min AND one pointer jump per pass
        # (label[label[i]] rides the same [T, C] candidate reduction).
        tile_live = _frontier_live(changed) if track_frontier else None
        nbr_min = _neighbor_min_sweep(
            p, valid, labels, tol2, row_tile, band=band, tile_live=tile_live,
            shard_axis=shard_axis, num_shards=num_shards,
        )

        # Shiloach-Vishkin style hook: propagate each point's neighborhood
        # minimum to its component ROOT via scatter-min; the next sweep's
        # in-built jump then pulls root updates back down to the members.
        # The hook is load-bearing for O(log) convergence: without it a
        # 200-point permuted chain fails to converge within 64 sweeps
        # (measured), while the former explicit jump-to-fixpoint inner loop
        # (serialized gathers + per-jump `any` syncs) costs more than the
        # sweeps it saves.  At small capacities the scatter-min is a
        # serialized ~20-cycles/element op that dominates the whole sweep
        # loop; the one-hot segment-min below computes the identical int32
        # minima as one fused [C, C] VPU pass (see ONEHOT_SEGMENT_MAX).
        if n <= ONEHOT_SEGMENT_MAX:
            upd = jnp.min(
                jnp.where(
                    labels[:, None] == idx[None, :], nbr_min[:, None], jnp.int32(n)
                ),
                axis=0,
            )
            new = jnp.minimum(labels, upd)
        else:
            new = labels.at[labels].min(nbr_min)
        new = jnp.minimum(new, nbr_min)
        if band is not None:
            # Window-unlimited pointer jump.  The banded sweep's fused jump
            # (hit = lt == cols) only fires when a point's label POSITION
            # falls inside its tile's column window; for a component wider
            # than the window (the arena-spanning noise cloud) the root is
            # out of reach and labels crawl one adjacency hop per sweep —
            # 24 sweeps at the fullscale shape.  One explicit full-array
            # jump per sweep restores true Shiloach-Vishkin doubling:
            # labels[i] always names an in-component point <= i, so
            # label-of-label does too, and the update is monotone — the
            # fixpoint is unchanged (bitwise-equal labels measured) while
            # convergence drops 24 -> 5 sweeps: stage 7.3 -> 1.9 ms/window
            # (scripts/tpu_experiments54.py).  The [C] gather is serialized
            # (~20 cycles/row) but buys ~4 sweeps per issue.  The full
            # (non-banded) sweep needs none of this: its fused jump already
            # sees every column.
            new = jnp.minimum(new, new[new])
        return (new, new != labels, it + 1)

    labels, final_changed, _ = lax.while_loop(
        cond, body, (labels0, jnp.ones((n,), bool), jnp.int32(0))
    )
    # exit with changes still pending means the iteration bound bit, not
    # the fixpoint: labels may name multiple roots per true component
    # (split clusters).  Observable like every other truncation (review
    # r5e finding #6).
    unconverged = jnp.any(final_changed)

    # ---- component sizes & size gate --------------------------------------
    if n <= ONEHOT_SEGMENT_MAX:
        # one-hot count: same serialized-scatter avoidance as the hook
        # above; int32 adds are associative-exact, identical counts
        sizes_by_root = jnp.sum(
            ((labels[:, None] == idx[None, :]) & valid[:, None]).astype(jnp.int32),
            axis=0,
        )
    else:
        sizes_by_root = jnp.zeros((n,), jnp.int32).at[
            jnp.where(valid, labels, n)
        ].add(1, mode="drop")
    is_root = valid & (labels == idx)
    gate = is_root & (sizes_by_root >= min_size) & (sizes_by_root <= max_size)
    num_clusters_total = jnp.sum(gate.astype(jnp.int32))

    # ---- slot assignment: size desc, root asc (PCL's end-of-extract sort) --
    # lax.top_k is stable (equal values keep ascending index order), giving
    # exactly the (size desc, root asc) order without a full sort.
    gated_size = jnp.where(gate, sizes_by_root, jnp.int32(-1))
    _, top_roots = lax.top_k(gated_size, max_clusters)
    slot_valid = (
        lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0]
        < jnp.minimum(num_clusters_total, max_clusters)
    )
    root_slot = jnp.full((n,), -1, jnp.int32)
    root_slot = root_slot.at[jnp.where(slot_valid, top_roots, n)].set(
        lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0], mode="drop"
    )

    point_cluster = jnp.where(valid, root_slot[labels], -1)
    slot_sizes = jnp.where(slot_valid, sizes_by_root[top_roots], 0)

    clusters = ClusterSet(
        point_cluster=point_cluster,
        sizes=slot_sizes,
        valid=slot_valid,
        num_clusters=jnp.minimum(num_clusters_total, max_clusters),
    )
    return ClusterOutput(
        clusters=clusters,
        labels=labels,
        root_slot=root_slot,
        overflow=num_clusters_total > max_clusters,
        band_overflow=band_overflow,
        unconverged=unconverged,
    )


def cluster_centroids(cloud: Cloud, clusters: ClusterSet) -> PointIndicesArray:
    """Per-cluster centroid + bounding radius -> PointWithRad rows.

    The reference's dormant ``create_cluster_cloud``/``centroids`` output
    (obstacle_detection.cpp:806-814, msg/PointWithRad.msg) — first-class here
    as ONE-HOT segment reduces over the [n, m] membership mask: XLA's
    scatter-add/max serialize at ~20+ cycles/element (CLAUDE.md), while the
    fused compare+select+reduce is a single VPU pass (m = max_clusters is
    64, so the mask is tiny at every capacity).  Counts and maxima are
    associative-exact; the f32 centroid sums move from a sequential-scatter
    order to a tree-reduce order (normal f32 rounding, same program on
    every backend — the TPU<->CPU crosscheck is unaffected).  Channel-wise
    throughout (no [n, 3] stack materialization; see ops/ransac.py).
    """
    m = clusters.sizes.shape[0]
    pc = clusters.point_cluster
    ok = pc >= 0
    slot = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    member = (pc[:, None] == slot) & ok[:, None]  # [n, m]
    wm = member.astype(jnp.float32)

    x, y, z = cloud.points[:, 0], cloud.points[:, 1], cloud.points[:, 2]
    # member counts already exist as clusters.sizes (same definition:
    # valid points of each slotted root) — one source of truth, one less
    # [n, m] reduction pass; int32 < 2^24 casts to f32 exactly, so inv
    # and the centroids are bitwise unchanged (review r5e finding #7)
    counts = clusters.sizes.astype(jnp.float32)
    inv = 1.0 / jnp.maximum(counts, 1.0)
    cx = jnp.sum(wm * x[:, None], axis=0) * inv
    cy = jnp.sum(wm * y[:, None], axis=0) * inv
    cz = jnp.sum(wm * z[:, None], axis=0) * inv

    dx = x[:, None] - cx[None, :]
    dy = y[:, None] - cy[None, :]
    dz = z[:, None] - cz[None, :]
    d_all = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # [n, m]
    radii = jnp.max(jnp.where(member, d_all, 0.0), axis=0)

    centroids = jnp.stack([cx, cy, cz], axis=-1)
    xyzr = jnp.concatenate([centroids, radii[:, None]], axis=-1)
    xyzr = jnp.where(clusters.valid[:, None], xyzr, 0.0)
    return PointIndicesArray(points=PointWithRad(xyzr=xyzr), valid=clusters.valid)
