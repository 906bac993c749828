"""Fused stream compaction + exact value gather as a Pallas TPU kernel.

Replaces the one-hot-matmul compaction/gather (``mxu_histogram.
compact_and_gather_blocks``) on TPU for the voxel pipeline's
bins -> compact-slots step (pcl::VoxelGrid's packed-leaf output walk,
obstacle_detection.cpp:282-285 via ops/voxel.py).

Why a kernel: the matmul formulation materializes a [capacity, A] one-hot
plus a [capacity, B+5+terms*B*C] product in HBM — ~35 ms/batch-of-32 at
A~1.8k on v5e, almost all of it HBM traffic that exists only to emulate a
gather.  The TPU alternative exploits that a Pallas grid executes
**sequentially** on a core:

* each 128-lane occupancy block compacts its occupied lanes locally
  (lane ranks via a triangular-matrix dot -> a [128, 128] one-hot select,
  summed on the VPU — every row has at most ONE live lane, so f32
  select-sums are EXACT gathers, no bf16 split-term machinery at all);
* a group of blocks stages its compacted rows in a VMEM scratch window at
  their local offsets, then one DMA writes the window to HBM at the
  window's global exclusive offset.  Consecutive windows overlap: window
  i+1 begins exactly where window i's real rows end, so the sequential
  grid ordering makes every later DMA overwrite the earlier window's
  stale/garbage tail.  Slots beyond ``num`` are masked by the caller.

Unlike the matmul form, per-step cost is independent of the total block
count A, so one code path serves both the 230k-bin flagship lattice and
the 3.9M-bin fullscale (0.015-leaf) lattice that previously needed the
searchsorted+serialized-gather fallback.

The batch dimension is handled INSIDE the kernel (a (B, steps) grid):
Pallas cannot vmap a dynamically-addressed ANY-space output, so the
public entry point carries a ``jax.custom_batching.custom_vmap`` rule
that routes an outer ``jax.vmap`` onto the batched grid.

The XLA fallback (CPU, or ``use_pallas=False``) computes bit-IDENTICAL
results: ``compact_occupied_blocks`` for the slot indices plus per-channel
1-D gathers (gathers are exact; the kernel's one-live-lane select-sums are
exact) — the TPU<->CPU full-pipeline crosscheck stays bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["compact_and_gather_exact"]

try:  # pallas import kept lazy-safe for backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _kernel(
    excl_ref, bins_ref, out_ref, scratch, sem, sem2, *,
    group: int, c: int, capacity: int,
):
    """One grid step: compact ``group`` 128-lane blocks of one batch element.

    Grid is (B, steps); steps is the minor (fastest) dimension, so each
    batch element's windows execute in ascending order.

    excl_ref: [1, 1, a_pad] int32 (SMEM) absolute exclusive offsets per
        block for this batch element.
    bins_ref: [1, c, group*128] f32 bin values, channel-leading; channel
        c-1 is the member count (occupancy = count > 0).
    out_ref:  [B, capacity + group*128, 128] f32 in HBM (pl.ANY; the
        minor dim is 128 because DMA slicing must be lane-tile aligned —
        only columns [0, c+1) are meaningful and the caller slices them).
        Column c is the f32 flat bin index ``blk*128 + lane`` (< 2^24,
        exactly representable).
    scratch:  [2 * group*128, 128] f32 double-buffered VMEM staging
        windows; this step's blocks land at their LOCAL offsets
        (excl - window start) in buffer (global_step % 2), then one DMA
        ships the window to HBM at the window start.  Stale scratch rows
        (not rewritten this step) land past this window's real rows,
        i.e. exactly where the NEXT window begins — and because each
        step WAITS the previous step's window DMA before starting its
        own, later windows always overwrite earlier garbage tails (the
        final window's tail lands at slots >= num, which callers mask).
        The wait-before-start chain also makes buffer reuse safe (the
        DMA reading buffer b at step g-2 completed before step g-1's
        started) while letting window g-1's DMA overlap step g's
        compute.
    sem:      window-DMA semaphore (the wait chain above).
    sem2:     overflow-DMA semaphore (started and waited in-step).
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    gstep = bi * pl.num_programs(1) + i
    last = pl.num_programs(0) * pl.num_programs(1) - 1
    w_full = group * 128
    base = lax.rem(gstep, 2) * w_full
    step_start = excl_ref[0, 0, i * group]

    lane_f = lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    r_iota = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    # inclusive lane cumsum as a triangular one-hot dot (Mosaic has no
    # cumsum primitive): ranks[l] = #occupied lanes <= l, exact in bf16
    # (integers <= 128 < 256) with f32 accumulation
    tri = (
        lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.bfloat16)
    for g in range(group):
        sl = slice(g * 128, (g + 1) * 128)
        cnt_row = bins_ref[0, c - 1 : c, sl]  # [1, 128]
        occ = cnt_row > 0.0
        ranks = (
            lax.dot_general(
                occ.astype(jnp.bfloat16), tri,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            - 1
        )  # [1, 128] inclusive-cumsum - 1
        # sel[r, l] = lane l is the r-th occupied lane of this block
        sel = (ranks == r_iota) & occ  # [128, 128]
        cols = []
        for ci in range(c):
            row = bins_ref[0, ci : ci + 1, sl]  # [1, 128]
            cols.append(jnp.sum(jnp.where(sel, row, 0.0), axis=1, keepdims=True))
        lane_sel = jnp.sum(jnp.where(sel, lane_f, 0.0), axis=1, keepdims=True)
        blk = i * group + g
        cols.append(lane_sel + 128.0 * blk.astype(jnp.float32))
        block_out = jnp.concatenate(cols, axis=1)  # [128, c+1]

        lstart = excl_ref[0, 0, i * group + g] - step_start
        scratch[pl.ds(base + lstart, 128), 0 : c + 1] = block_out

    # Flush the window.  Occupancy is typically sparse (~5-10% of lanes),
    # so the window's REAL rows (written = next window's start - ours)
    # almost always fit a small prefix: DMA only ``ws`` rows, with a
    # guarded full-window fallback — 4-8x less DMA traffic than always
    # shipping group*128 rows.  Overflow steps (start > capacity) clamp
    # to the padding region past ``capacity`` instead of skipping, so
    # every step issues exactly one cp1 (uniform semaphore accounting).
    ws = min(512, group * 128)
    written = excl_ref[0, 0, (i + 1) * group] - step_start
    start1 = jnp.minimum(step_start, capacity)

    # wait the PREVIOUS window's DMA before starting ours: preserves the
    # overlapping-window write order AND frees this step's scratch buffer
    # (same byte count every step, so any same-shape descriptor waits it)
    @pl.when(gstep > 0)
    def _wait_prev():
        pltpu.make_async_copy(
            scratch.at[pl.ds(w_full - base, ws), :],
            out_ref.at[bi, pl.ds(0, ws), :],
            sem,
        ).wait()

    cp1 = pltpu.make_async_copy(
        scratch.at[pl.ds(base, ws), :],
        out_ref.at[bi, pl.ds(start1, ws), :],
        sem,
    )
    cp1.start()

    @pl.when(gstep == last)
    def _drain():
        cp1.wait()

    if ws < group * 128:

        @pl.when(written > ws - 128)
        def _flush_rest():
            # rare: more real rows than the fast window — ship the rest
            # (disjoint from every in-flight window region; waited in-step)
            start2 = jnp.minimum(step_start + ws, capacity + ws)
            cp2 = pltpu.make_async_copy(
                scratch.at[pl.ds(base + ws, group * 128 - ws), :],
                out_ref.at[bi, pl.ds(start2, group * 128 - ws), :],
                sem2,
            )
            cp2.start()
            cp2.wait()


def _pallas_compact_gather_batched(
    bins: jax.Array, capacity: int, group: int, interpret: bool = False
):
    """bins [B, c, kp] (kp % 128 == 0, count channel last) ->
    (raw [B, capacity, c+1] f32, num [B] int32)."""
    bsz, c, kp = bins.shape
    a = kp // 128
    occ = (bins[:, c - 1] > 0.0).reshape(bsz, a, 128)
    per_block = jnp.sum(occ.astype(jnp.int32), axis=2)  # [B, a]
    offsets = jnp.cumsum(per_block, axis=1)
    num = offsets[:, -1]
    excl = offsets - per_block  # [B, a]

    steps = -(-a // group)
    a_pad = steps * group
    if a_pad != a:
        bins = jnp.pad(bins, ((0, 0), (0, 0), (0, (a_pad - a) * 128)))
    # padded blocks are empty; give them (and one extra group, read by the
    # last step's ``written`` lookup) the natural continuation offset
    # (num) so local scratch offsets stay in bounds
    excl = jnp.concatenate(
        [excl, jnp.broadcast_to(num[:, None], (bsz, a_pad + group - a))],
        axis=1,
    )
    excl3 = excl.reshape(bsz, 1, a_pad + group)

    s_pad = capacity + group * 128
    out = pl.pallas_call(
        functools.partial(_kernel, group=group, c=c, capacity=capacity),
        grid=(bsz, steps),
        in_specs=[
            pl.BlockSpec(
                (1, 1, a_pad + group),
                lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, c, group * 128),
                lambda bi, i: (bi, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, s_pad, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * group * 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(excl3, bins)
    return out[:, :capacity, : c + 1], num


def _pallas_compact_gather(
    bins: jax.Array, capacity: int, group: int, interpret: bool = False
):
    """Single-scan wrapper with a custom vmap rule onto the batched grid."""

    @jax.custom_batching.custom_vmap
    def run(b):
        raw, num = _pallas_compact_gather_batched(
            b[None], capacity, group, interpret
        )
        return raw[0], num[0]

    @run.def_vmap
    def _rule(axis_size, in_batched, b):  # noqa: ANN001 - jax API signature
        del axis_size
        if not in_batched[0]:  # pragma: no cover - vmap over other args only
            raw, num = _pallas_compact_gather_batched(
                b[None], capacity, group, interpret
            )
            return (raw[0], num[0]), (False, False)
        raw, num = _pallas_compact_gather_batched(b, capacity, group, interpret)
        return (raw, num), (True, True)

    return run(bins)


def compact_and_gather_exact(
    bins: jax.Array,
    occ2d: jax.Array,
    capacity: int,
    use_pallas: bool | None = None,
    group: int | None = None,
    interpret: bool = False,
):
    """Compaction + EXACT per-slot value gather.

    ``bins``: [C, A*B] float32 channel-leading bin table whose LAST channel
    is the occupancy-defining count; ``occ2d``: its [A, B] occupancy view
    (must equal ``bins[-1] > 0`` reshaped).  Returns
    (flat_idx [capacity] int32 ascending, num [], values [capacity, C] f32)
    with ``values == bins.T[flat_idx]`` EXACTLY for slots < num — unlike
    ``compact_and_gather_blocks`` there is no bf16 split-term error budget.

    Slots >= num hold unspecified garbage (stale DMA-window tails on the
    Pallas path, clamped-gather values on the XLA path) — callers must
    mask by ``num``, as they already do.
    """
    a, b = occ2d.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and pl is not None
    if group is None:
        # window size trades per-step overhead (few big windows) against
        # scratch size; measured on v5e: 8 best for the 1024-block flagship
        # table (26.9 vs 28.1 ms/batch), 32 best for the 16384-block
        # fullscale table (13.6 vs 14.2 ms/window) — scale with the table
        group = 8 if a <= 4096 else 32
    if use_pallas and b == 128 and capacity >= 128:
        raw, num = _pallas_compact_gather(bins, capacity, group, interpret)
        loc = jnp.clip(raw[:, -1].astype(jnp.int32), 0, a * b - 1)
        return loc, num, raw[:, :-1]

    from .mxu_histogram import compact_occupied_blocks

    loc, num = compact_occupied_blocks(occ2d, capacity)
    # per-channel 1-D gathers: exact, matching the kernel's select-sums
    # bit-for-bit (slow on TPU — serialized — but TPU takes the kernel)
    vals = jnp.stack([bins[ci][loc] for ci in range(bins.shape[0])], axis=-1)
    return loc, num, vals
