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

__all__ = ["histogram2d_mxu", "weighted_histogram_mxu", "MXU_HISTOGRAM_MAX_BINS"]

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
    return out.reshape(a * b, -1)[:k]


def weighted_histogram_blocks(
    ids: jax.Array,
    weights: jax.Array,
    valid: jax.Array,
    k: int,
    hi_size: int | None = None,
    exact_f32: bool = True,
):
    """Like weighted_histogram_mxu but returns the block form
    ([A, B, C], a, b) — the flattened position ``hi*b + lo`` equals the
    original id, so block-structured consumers (compact_occupied_blocks)
    can work on the 2-D layout directly."""
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
    out = jnp.zeros((a, b, c), jnp.float32)
    for t in terms:
        for ci in range(c):
            whi = hi * t[:, ci][:, None]  # weight on the hi factor
            part = jax.lax.dot_general(
                whi, lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [A, B]
            out = out.at[:, :, ci].add(part)
    return out, a, b


def compact_occupied_blocks(occupied: jax.Array, capacity: int):
    """Indices of the first ``capacity`` True entries of a [A, B] block grid.

    Block-structured stream compaction: per-block counts (lane-axis reduce),
    a tiny cumsum over the A blocks, an [A]-wide searchsorted per output
    slot, then a lane-axis cumsum + argmax inside the selected block row.
    Everything is lane-vectorized — unlike a flat cumsum + searchsorted over
    A*B elements, which costs several ms at K~2e5 on TPU.

    Returns (flat_idx [capacity] int32 ascending, num_occupied []).
    """
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
    rows = occ_i[blk]  # [capacity, B] contiguous row gathers
    local = jnp.cumsum(rows, axis=1)
    tgt = (target - excl[blk])[:, None]
    lane = jnp.argmax((local == tgt) & (rows > 0), axis=1).astype(jnp.int32)
    return blk * b + lane, num
