"""Histograms and segment-sums on the MXU (scatter-free).

XLA lowers scatter on TPU to a serialized per-index update loop (~20+
cycles per element): a 131k-point histogram costs ~3 ms regardless of bin
count.  The systolic array gives a better identity:

    counts[a, b] = sum_i onehot_hi[i, a] * onehot_lo[i, b]
                 = onehot_hi^T @ onehot_lo

i.e. a histogram over K = A*B bins is ONE [A, N] x [N, B] matmul over
one-hot factor matrices — with 0/1 bf16 inputs and float32 accumulation the
result is **exact** (every product is representable; f32 accumulates
integers exactly below 2^24).  Weighted histograms (segment sums) put the
weight on the hi side: ``whi[i, a] = onehot_hi[i, a] * w[i]``; full-f32
weight precision is recovered by splitting ``w`` into two bf16 terms
(w ≈ bf16(w) + bf16(w - bf16(w))) and summing two matmuls.

Used by the occupancy histogram (grid is naturally separable: rows from x,
cols from y — obstacle_detection.cpp:203's cell math) and the voxel binning
(packed key split as ``key = hi*B + lo``).  Economical when N*K MACs fit
the MXU budget: ~2.7e10 MACs for 131k x 214k runs in ~0.3 ms vs ~3 ms for
the scatter.  For very large K (e.g. the reference's 0.015 leaf → 3.9M
bins) the scatter path stays cheaper; callers pick by K.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "histogram2d_mxu",
    "weighted_histogram_mxu",
    "compact_occupied_blocks",
    "compact_and_gather_blocks",
    "MXU_HISTOGRAM_MAX_BINS",
]

# Above this bin count the N*K one-hot matmul loses to the serialized
# scatter (~3 ms at N=131k): N*K MACs / ~2e14 flops/s > scatter time.
MXU_HISTOGRAM_MAX_BINS = 1 << 19


def _onehot_bf16(ids: jax.Array, k: int) -> jax.Array:
    """[N] int32 -> [N, k] bf16 one-hot (out-of-range ids give zero rows)."""
    cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    return (ids[:, None] == cols).astype(jnp.bfloat16)


def histogram2d_mxu(
    row_ids: jax.Array, col_ids: jax.Array, valid: jax.Array, h: int, w: int
) -> jax.Array:
    """Exact [h, w] int32 histogram of (row, col) pairs via one matmul."""
    rows = _onehot_bf16(jnp.where(valid, row_ids, -1), h)
    cols = _onehot_bf16(jnp.where(valid, col_ids, -1), w)
    counts = jax.lax.dot_general(
        rows, cols,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [h, w]
    return counts.astype(jnp.int32)


def _traffic_optimal_hi(k: int) -> int:
    """HBM-traffic-optimal hi-factor width: lo reads cost ~2*N*B per channel
    vs whi build ~4*N*A, minimized at A ~= sqrt(K/2) (measured best on v5e:
    320 beats 128 by ~26% at K=214k)."""
    import math

    a = int(math.sqrt(k / 2) / 64 + 0.5) * 64
    return max(128, min(512, a))


def weighted_histogram_mxu(
    ids: jax.Array,
    weights: jax.Array,
    valid: jax.Array,
    k: int,
    hi_size: int | None = None,
    exact_f32: bool = True,
) -> jax.Array:
    """Segment-sum ``sums[j, c] = sum_{ids[i]==j} weights[i, c]`` on the MXU.

    ids: [N] int32 in [0, k); weights: [N, C] float32; returns [k, C] f32.
    ``exact_f32`` doubles the matmuls to recover full f32 weight precision
    via the two-term bf16 split; with False, weights are bf16-rounded
    (fine for counts / already-small values).
    """
    out, a, b = weighted_histogram_blocks(ids, weights, valid, k, hi_size, exact_f32)
    return out.reshape(-1, a * b).T[:k]


def weighted_histogram_blocks(
    ids: jax.Array,
    weights: jax.Array,
    valid: jax.Array,
    k: int,
    hi_size: int | None = None,
    exact_f32: bool = True,
):
    """Like weighted_histogram_mxu but returns the block form
    ([C, A, B], a, b) — the flattened position ``hi*b + lo`` equals the
    original id, so block-structured consumers (compact_occupied_blocks)
    can work on the 2-D layout directly.

    Channel-LEADING layout on purpose: a channel-minor [A, B, C=4] array
    puts the 4-wide channel axis on the TPU lane dimension, which pads
    4 -> 128 (32x memory bloat) and turns every per-channel update into a
    strided lane slice; [C, A, B] keeps lanes = B and channels as cheap
    leading-axis batches.
    """
    n, c = weights.shape
    a = hi_size or _traffic_optimal_hi(k)
    b = -(-k // a)  # cdiv
    ids = jnp.where(valid, ids, a * b)  # out-of-range -> zero one-hot rows
    hi = _onehot_bf16(ids // b, a)  # [N, A]
    lo = _onehot_bf16(ids % b, b)  # [N, B]

    w32 = jnp.where(valid[:, None], weights, 0.0)
    terms = [w32.astype(jnp.bfloat16)]
    if exact_f32:
        terms.append((w32 - terms[0].astype(jnp.float32)).astype(jnp.bfloat16))

    # Per-channel matmuls: a concatenated-channels variant (one big matmul)
    # was measured no faster and multiplies peak HBM by the channel count
    # under vmap (batched whi_all OOMs at batch 32) — sequential channels
    # keep the live set to one [N, A] factor at a time.
    chans = []
    for ci in range(c):
        acc = None
        for t in terms:
            whi = hi * t[:, ci][:, None]  # weight on the hi factor
            part = jax.lax.dot_general(
                whi, lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [A, B]
            acc = part if acc is None else acc + part
        chans.append(acc)
    return jnp.stack(chans, axis=0), a, b


def _compact_blocks_legacy(occupied: jax.Array, capacity: int):
    """searchsorted + row-gather compaction — kept for LARGE block counts
    (the [S, A] comparison matrix of the MXU version scales with A; above
    ~8k block rows the gathers win again, e.g. the fullscale 0.015-leaf
    scatter path with A ~ 31k)."""
    a, b = occupied.shape
    occ_i = occupied.astype(jnp.int32)
    per_block = jnp.sum(occ_i, axis=1)  # [A]
    offsets = jnp.cumsum(per_block)  # inclusive
    num = offsets[-1]
    excl = offsets - per_block

    target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0] + 1
    blk = jnp.minimum(
        jnp.searchsorted(offsets, target, side="left").astype(jnp.int32), a - 1
    )
    rows = occ_i[blk]  # [capacity, B] row gathers
    local = jnp.cumsum(rows, axis=1)
    tgt = (target - excl[blk])[:, None]
    lane = jnp.argmax((local == tgt) & (rows > 0), axis=1).astype(jnp.int32)
    return blk * b + lane, num


# Above this many block rows the [S, A] comparison/one-hot matrices of the
# MXU compaction dominate; fall back to the gather-based form.
_COMPACT_MXU_MAX_BLOCKS = 8192


def compact_occupied_blocks(occupied: jax.Array, capacity: int):
    """Indices of the first ``capacity`` True entries of a [A, B] block grid.

    Block-structured stream compaction with NO serialized gathers (XLA
    lowers a [capacity]-row gather to a per-row loop: the original
    ``occ[blk]`` formulation cost ~70 ms/batch-of-32 at A*B~2e5 on v5e —
    8.8x this one):

    * per-block counts + a tiny [A] cumsum;
    * the per-slot block id as a **comparison sum** —
      ``blk[s] = #{a : offsets[a] < s+1}`` (= searchsorted left), one
      [S, A] compare+reduce on the VPU;
    * the selected block's occupancy row and running-offset metadata
      fetched by **one bf16 one-hot matmul** [S, A] @ [A, B+4] — every
      gathered column is an integer < 256 (occupancy 0/1, per-block count
      <= B <= 256... the offset split into base-256 digits), so bf16
      factors accumulate exactly in f32;
    * lane id via lane-axis cumsum + argmax on the gathered rows.

    Returns (flat_idx [capacity] int32 ascending, num_occupied []).
    """
    a, b = occupied.shape
    if a > _COMPACT_MXU_MAX_BLOCKS:
        return _compact_blocks_legacy(occupied, capacity)
    occ_i = occupied.astype(jnp.int32)
    per_block = jnp.sum(occ_i, axis=1)  # [A]
    offsets = jnp.cumsum(per_block)  # inclusive
    num = offsets[-1]

    target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0] + 1  # [S]
    cmp = (offsets[None, :] < target[:, None]).astype(jnp.int32)  # [S, A]
    blk = jnp.minimum(jnp.sum(cmp, axis=1), a - 1)  # [S]

    # gather matrix: occupancy row + per-block count + offset digits.
    # per_block <= b; a block wider than 256 lanes would overflow bf16's
    # exact-integer range, so split it into base-256 digits as well.
    pb0 = per_block % 256
    pb1 = per_block // 256
    o0 = offsets % 256
    o1 = (offsets // 256) % 256
    o2 = offsets // 65536  # supports A*B < 2^24 bins
    gmat = jnp.concatenate(
        [
            occupied.astype(jnp.bfloat16),
            pb0[:, None].astype(jnp.bfloat16),
            pb1[:, None].astype(jnp.bfloat16),
            o0[:, None].astype(jnp.bfloat16),
            o1[:, None].astype(jnp.bfloat16),
            o2[:, None].astype(jnp.bfloat16),
        ],
        axis=1,
    )  # [A, B+5]
    cols = lax.broadcasted_iota(jnp.int32, (1, a), 1)
    oh = (blk[:, None] == cols).astype(jnp.bfloat16)  # [S, A]
    g = lax.dot_general(
        oh, gmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, B+5]
    rows = g[:, :b].astype(jnp.int32)
    pb = (g[:, b] + g[:, b + 1] * 256.0).astype(jnp.int32)
    offs = (g[:, b + 2] + g[:, b + 3] * 256.0 + g[:, b + 4] * 65536.0).astype(
        jnp.int32
    )
    excl = offs - pb  # exclusive offset of the selected block

    local = jnp.cumsum(rows, axis=1)
    tgt = (target - excl)[:, None]
    lane = jnp.argmax((local == tgt) & (rows > 0), axis=1).astype(jnp.int32)
    return blk * b + lane, num


def compact_and_gather_blocks(
    bins: jax.Array, occ2d: jax.Array, capacity: int, value_terms=2
):
    """Compaction + per-slot bin VALUES fetched in the same one-hot matmul.

    SUPERSEDED in the pipeline by ``ops.pallas_compaction.
    compact_and_gather_exact`` (exact values, ~2x faster, K-independent);
    kept as the measured pure-XLA baseline and for the experiment scripts
    (scripts/tpu_experiments6/7.py) that document the comparison.

    ``bins``: [C, A*B] float32 bin table, CHANNEL-LEADING (each channel
    row-major matching the [A, B] ``occ2d`` occupancy view).  Returns
    (flat_idx [S], num, values [S, C]) — equivalent to
    ``compact_occupied_blocks`` followed by ``bins.T[flat_idx]``, but the
    value rows ride the SAME [S, A] one-hot matmul as the occupancy rows
    instead of a serialized XLA row gather (measured ~12 ms/batch-of-32 at
    S=16k, A*B=235k on v5e).

    ``value_terms``: bf16 split terms per value channel — an int (same for
    every channel) or a per-channel sequence.  Gathering through a bf16
    matmul would truncate values; splitting v = t0 + t1 (+ t2) into bf16
    terms and summing the separately-gathered terms bounds the error at
    |v| * 2^-9 (1 term) / 2^-16 (2 terms) / 2^-24 (3 terms, ~f32 ulp).
    Integers below 2^17 (e.g. counts) are recovered EXACTLY by 2 terms:
    bf16 rounding of such an integer leaves an integer residual <= 2^8,
    itself exactly representable.  The dot's cost scales with the TOTAL
    term count (~3.4 ms/batch-of-32 per 128-column block at S=16k,
    A=1840 on v5e) — callers pick per-channel precision accordingly.
    """
    a, b = occ2d.shape
    c = bins.shape[0]
    terms_per_channel = (
        [value_terms] * c if isinstance(value_terms, int) else list(value_terms)
    )
    if a > _COMPACT_MXU_MAX_BLOCKS:
        loc, num = _compact_blocks_legacy(occ2d, capacity)
        # per-channel 1-D gathers (a [K, C] transpose would lane-pad C->128)
        vals = jnp.stack([bins[ci][loc] for ci in range(c)], axis=-1)
        return loc, num, vals

    occ_i = occ2d.astype(jnp.int32)
    per_block = jnp.sum(occ_i, axis=1)
    offsets = jnp.cumsum(per_block)
    num = offsets[-1]

    target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0] + 1
    cmp = (offsets[None, :] < target[:, None]).astype(jnp.int32)
    blk = jnp.minimum(jnp.sum(cmp, axis=1), a - 1)

    pb0 = per_block % 256
    pb1 = per_block // 256
    o0 = offsets % 256
    o1 = (offsets // 256) % 256
    o2 = offsets // 65536
    # value columns: per channel, per split term, one [A, B] block view —
    # channel-leading input keeps these as cheap reshapes (lanes stay B)
    terms = []
    for ci in range(c):
        resid = bins[ci].reshape(a, b)
        for _ in range(terms_per_channel[ci]):
            t = resid.astype(jnp.bfloat16)
            terms.append(t)
            resid = resid - t.astype(jnp.float32)
    gmat = jnp.concatenate(
        [
            occ2d.astype(jnp.bfloat16),
            pb0[:, None].astype(jnp.bfloat16),
            pb1[:, None].astype(jnp.bfloat16),
            o0[:, None].astype(jnp.bfloat16),
            o1[:, None].astype(jnp.bfloat16),
            o2[:, None].astype(jnp.bfloat16),
        ]
        + terms,
        axis=1,
    )  # [A, B + 5 + C*value_terms*B]
    cols = lax.broadcasted_iota(jnp.int32, (1, a), 1)
    oh = (blk[:, None] == cols).astype(jnp.bfloat16)
    g = lax.dot_general(
        oh, gmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, B + 5 + value_terms*B*C]
    rows = g[:, :b].astype(jnp.int32)
    pb = (g[:, b] + g[:, b + 1] * 256.0).astype(jnp.int32)
    offs = (g[:, b + 2] + g[:, b + 3] * 256.0 + g[:, b + 4] * 65536.0).astype(
        jnp.int32
    )
    excl = offs - pb

    local = jnp.cumsum(rows, axis=1)
    tgt = (target - excl)[:, None]
    hit = (local == tgt) & (rows > 0)
    lane = jnp.argmax(hit, axis=1).astype(jnp.int32)

    lane_oh = hit.astype(jnp.float32)  # exactly one True per real slot
    pos = b + 5
    vals = []
    for ci in range(c):
        t = terms_per_channel[ci]
        seg = jnp.sum(g[:, pos : pos + t * b].reshape(capacity, t, b), axis=1)
        vals.append(jnp.sum(seg * lane_oh, axis=1))
        pos += t * b
    values = jnp.stack(vals, axis=-1)  # [S, C]
    return blk * b + lane, num, values
