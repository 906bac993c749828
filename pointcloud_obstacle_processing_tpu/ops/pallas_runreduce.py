"""Fused sorted-run segmented reduce + stream compaction (Pallas TPU kernel).

The sort-engine voxel path (``ops/voxel.py: _sort_segment_partials``, the
TPU-native pcl::VoxelGrid reduction, obstacle_detection.cpp:282-285) used
three passes over the sorted buffer: a segmented inclusive scan
(ops/segscan.py), a run-end table materialization, and the
sequential-overwrite compaction kernel (ops/pallas_compaction.py).  At the
flagship shape that is ~12.2 ms/batch-of-32 of the voxel stage's 25.8
(docs/PERFORMANCE.md round-3 log; scripts/tpu_experiments18.py).

This kernel fuses all three into ONE sequential pass: the Pallas grid
already walks the buffer in ascending windows for the compaction's
overlapping-DMA trick, and a TPU grid executes **sequentially** on a core —
so per-segment running sums can ride along in SMEM scratch as cross-window
carries instead of a full-width Hillis-Steele over HBM.  Per window:

1. derive head/run-end flags from the sorted keys (the window's boundary
   keys come from a tiny SMEM side table — no shifted copies of the key
   buffer in HBM);
2. window-local segmented inclusive scan of (off_x, off_y, off_z, valid)
   — log2(W) shift+add steps entirely in VMEM/registers;
3. add the carried segment sums to rows before the window's first head
   (select + add — no multiply, so Mosaic cannot FMA-contract it), and
   store the last row's adjusted sums as the next window's carry;
4. compact the run-end rows (key, sums, count) into a VMEM staging window
   at precomputed exclusive offsets and DMA it to HBM at the running
   global offset, double-buffered exactly like ops/pallas_compaction.py.

Summation-order note: per-voxel sums are window-local Hillis-Steele trees
joined by one carry add — a deterministic, backend-independent order that
differs from a linear left-to-right sum only by normal f32 rounding (same
class as the previous full-width Hillis-Steele; docs/PARITY.md deviation
7).  The XLA fallback below evaluates the IDENTICAL expression tree
(the same shift+add steps per window, the same single carry add per
element, gathers instead of one-live-lane select-sums — both exact), so
TPU and CPU results stay bitwise equal and the full-pipeline crosscheck
(scripts/crosscheck_tpu_cpu.py) keeps bit-identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["sorted_run_reduce"]

# The 8-rows-per-step kernel (_kernel8) is bitwise-validated against the
# fallback both in interpret mode (tests/test_runreduce.py) and on
# hardware (scripts/tpu_experiments31.py: B=32 device run, plain AND
# packed payloads bitwise-equal; isolated reduce 9.60 -> 6.34 ms/batch at
# g8/f512, composed voxel stage 23.8 -> 21.1 ms/batch).
KERNEL8_ENABLED = True

# The 2-windows-per-step kernel (_kernel2w) serves UNBATCHED rows (the
# fullscale window): the 1-row kernel's [4, W] channel stack uses half the
# VPU sublanes and walks N/W sequential grid steps; pairing windows
# (2i, 2i+1) per step fills all 8 sublanes and halves the step count.
# Per-window arithmetic (scan steps, single carry adds) is IDENTICAL —
# window b's carry-in is window a's adjusted last row, the same value the
# sequential chain produces — so outputs stay bitwise equal to the 1-row
# kernel and the XLA fallback (tests/test_runreduce.py; hardware A/B in
# scripts/tpu_experiments56.py).
KERNEL2W_ENABLED = True

try:  # pallas import kept lazy-safe for backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _scan_channels(vals, flags, w: int):
    """Window-local segmented inclusive scan: the Hillis-Steele shift+add
    steps of ops/segscan.py applied to a CHANNEL-STACKED array ``vals``
    ([..., 4, w]; channels ride sublanes, so each step is ONE vector op
    instead of one per channel) sharing one int32 flag row that
    broadcasts across the channel axis.  Only adds/selects/ors — the
    per-channel arithmetic is identical to a per-channel loop (same
    operands, same order), so results are bitwise reproducible wherever
    it runs (the XLA fallback evaluates this same function)."""
    v = vals
    f = flags
    d = 1
    while d < w:
        zpad = jnp.zeros(v.shape[:-1] + (d,), v.dtype)
        fpad = jnp.ones(f.shape[:-1] + (d,), f.dtype)
        f_shift = jnp.concatenate([fpad, f[..., :-d]], axis=-1)
        v_shift = jnp.concatenate([zpad, v[..., :-d]], axis=-1)
        v = v + jnp.where(f != 0, 0.0, v_shift)
        f = f | f_shift
        d *= 2
    return v


def _unpack_offsets(pxy, pz, quantum: float):
    """16-bit fixed-point payload decode: ``pxy`` carries the x offset in
    its high 16 bits and y in the low 16 (both quantized to ``quantum``
    steps), ``pz`` the z offset.  x can fill bit 31, so the high-half
    extract must be a LOGICAL shift (an arithmetic one would
    sign-extend).  int -> f32 is exact for values < 2^16 and the single
    quantum multiply is a correctly-rounded IEEE op, so the decode is
    bitwise reproducible on every backend (the fallback runs this same
    function)."""
    q = jnp.float32(quantum)
    ox = lax.shift_right_logical(pxy, 16).astype(jnp.float32) * q
    oy = (pxy & 0xFFFF).astype(jnp.float32) * q
    oz = pz.astype(jnp.float32) * q
    return ox, oy, oz


def _kernel(
    meta_ref, excl_ref, key_ref, a_ref, b_ref, *rest, group: int,
    capacity: int, sentinel: int, flush: int, quantum: float | None = None,
):
    """One grid step: scan + reduce + compact ``group`` 128-lane blocks.

    Grid is (B, steps), steps minor, so each batch element's windows run
    in ascending order and SMEM ``carry`` rides across them.

    meta_ref: [1, 2, steps+1] int32 SMEM — row 0: first key of each window
        (entry ``steps`` = -2, an impossible key, so the buffer's final
        valid row always ends its run); row 1: key preceding each window
        (entry 0 = -1).
    excl_ref: [1, 1, a+group] int32 SMEM — per-128-block exclusive offsets
        of the run-end count, continued with ``num`` (as in
        pallas_compaction._kernel).
    key_ref:  [1, 1, 1, W] int32 sorted voxel keys (sentinel = invalid).
        (A direct [B, N] 2-D blocking of (1, w) is REJECTED by Mosaic —
        the second-minor block dim must divide 8 or equal the array dim —
        so the operands ride a [B, 1, 1, N] reshape whose T(1,128) layout
        costs ~1.6 ms/batch per operand in relayout copies per XLA's cost
        model; an 8-rows-per-step kernel would remove it.)
    a/b_ref (+ oz_ref in ``rest``): the sort payload buffers, passed
        UNSTACKED (a [B, 3, N] stack would pad its size-3 sublane dim to
        8 on TPU — 2.7x read amplification — and materialize an extra
        50 MB/batch copy).  Two layouts:
        * quantum=None: three [1, 1, 1, W] f32 corner-relative offsets
          (a=ox, b=oy, rest[0]=oz);
        * quantum set: TWO int32 buffers (a=pxy, b=pz) carrying the
          offsets as 16-bit fixed point — one fewer buffer through the
          sort AND through this kernel's HBM->VMEM streams; decoded
          in-register by ``_unpack_offsets``.
    out_ref:  [B, capacity + W, 128] f32 HBM (ANY); columns 0..4 =
        (key_f32, sum_x, sum_y, sum_z, count) at run-end rows.
    scratch:  [2*W, 128] f32 double-buffered staging (see
        pallas_compaction._kernel for the overlapping-window DMA
        contract; identical here).
    tmp:      [8, W] f32 VMEM channel staging — computed scan values are
        written here and re-loaded as [1, 128] block slices, because
        Mosaic cannot re-layout a computed [1, W] vector's lane-offset
        slice for broadcasting against [128, 128] (rows 0..4 = output
        channels, row 5 = is_end flags, 6..7 pad).
    carry:    [1, 4] f32 SMEM — running segment sums (x, y, z, count) at
        the window boundary.
    """
    cnt_ref = None
    if quantum is None:
        if len(rest) == 8:  # 4th value buffer: per-row counts (the merge
            # path — counts replace the implicit 1s in the count channel)
            oz_ref, cnt_ref, out_ref, scratch, tmp, carry, sem, sem2 = rest
        else:
            oz_ref, out_ref, scratch, tmp, carry, sem, sem2 = rest
    else:
        out_ref, scratch, tmp, carry, sem, sem2 = rest
    bi = pl.program_id(0)
    i = pl.program_id(1)
    gstep = bi * pl.num_programs(1) + i
    last = pl.num_programs(0) * pl.num_programs(1) - 1
    w_full = group * 128
    base = lax.rem(gstep, 2) * w_full
    step_start = excl_ref[0, 0, i * group]

    key = key_ref[0, 0]  # [1, W] int32
    valid = key < sentinel
    prev_key = meta_ref[0, 1, i]
    next_first = meta_ref[0, 0, i + 1]
    key_prev = jnp.concatenate(
        [jnp.full((1, 1), prev_key, jnp.int32), key[:, :-1]], axis=1
    )
    key_next = jnp.concatenate(
        [key[:, 1:], jnp.full((1, 1), next_first, jnp.int32)], axis=1
    )
    heads = (valid & (key != key_prev)).astype(jnp.int32)
    is_end = valid & (key != key_next)

    @pl.when(i == 0)
    def _reset_carry():
        for ci in range(4):
            carry[0, ci] = 0.0

    if quantum is None:
        ox, oy, oz = a_ref[0, 0], b_ref[0, 0], oz_ref[0, 0]
    else:
        ox, oy, oz = _unpack_offsets(a_ref[0, 0], b_ref[0, 0], quantum)
    cnt_row = (
        jnp.where(valid, cnt_ref[0, 0], 0.0)
        if cnt_ref is not None
        else jnp.where(valid, 1.0, 0.0)
    )
    ch = jnp.concatenate(
        [ox, oy, oz, cnt_row],
        axis=0,
    )  # [4, W]: channels on sublanes — one vector op per scan step
    v = _scan_channels(ch, heads, w_full)

    # carry joins: rows before the window's first head continue the
    # previous window's open segment (select + add; no multiply)
    no_head_yet = _cum_or(heads) == 0  # [1, W] inclusive OR-scan
    carr = jnp.concatenate(
        [jnp.full((1, 1), carry[0, ci], jnp.float32) for ci in range(4)], axis=0
    )  # [4, 1] splat of the SMEM carries
    v = v + jnp.where(no_head_yet, carr, 0.0)
    # next window's carry = this window's adjusted last row (masked lane
    # reduce: Mosaic cannot scalar-extract a computed vector lane)
    last_mask = (
        lax.broadcasted_iota(jnp.int32, (1, w_full), 1) == w_full - 1
    )
    new_carry = [
        jnp.sum(jnp.where(last_mask, v[ci : ci + 1], 0.0)) for ci in range(4)
    ]
    for ci in range(4):
        carry[0, ci] = new_carry[ci]

    key_f = key.astype(jnp.float32)
    cnt_end = jnp.where(is_end, v[3:4], 0.0)
    tmp[0:1, :] = key_f
    tmp[1:4, :] = v[0:3]
    tmp[4:5, :] = cnt_end
    tmp[5:6, :] = jnp.where(is_end, 1.0, 0.0)

    lane_tri = (
        lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.bfloat16)
    r_iota = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    for g in range(group):
        sl = slice(g * 128, (g + 1) * 128)
        occ = tmp[5:6, sl] > 0.0  # [1, 128] fresh VMEM load
        ranks = (
            lax.dot_general(
                occ.astype(jnp.bfloat16), lane_tri,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            - 1
        )
        sel = (ranks == r_iota) & occ  # [128, 128]
        cols = [
            jnp.sum(jnp.where(sel, tmp[ci : ci + 1, sl], 0.0), axis=1, keepdims=True)
            for ci in range(5)
        ]
        block_out = jnp.concatenate(cols, axis=1)  # [128, 5]
        lstart = excl_ref[0, 0, i * group + g] - step_start
        scratch[pl.ds(base + lstart, 128), 0:5] = block_out

    # window flush: identical DMA contract to pallas_compaction._kernel.
    # ``flush`` trades the unconditional copy size against how often the
    # conditional full-window remainder fires: best when it comfortably
    # exceeds the expected run-end count per window (~density * W).
    ws = min(flush, w_full)
    written = excl_ref[0, 0, (i + 1) * group] - step_start
    start1 = jnp.minimum(step_start, capacity)

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

    if ws < w_full:

        @pl.when(written > ws - 128)
        def _flush_rest():
            start2 = jnp.minimum(step_start + ws, capacity + ws)
            cp2 = pltpu.make_async_copy(
                scratch.at[pl.ds(base + ws, w_full - ws), :],
                out_ref.at[bi, pl.ds(start2, w_full - ws), :],
                sem2,
            )
            cp2.start()
            cp2.wait()


def _kernel8(
    meta_ref, excl_ref, key_ref, a_ref, b_ref, *rest, group: int,
    capacity: int, sentinel: int, flush: int, quantum: float | None = None,
):
    """8-rows-per-step variant of ``_kernel``: grid (B/8, steps).

    Each step scans/reduces/compacts the same window of EIGHT batch rows
    at once.  Why: the 1-row kernel's [4, W] channel stack uses 4 of 8
    VPU sublanes and its operands need a [B, 1, 1, N] reshape (Mosaic
    rejects a (1, w) block on a [B, N] array — the second-minor block dim
    must divide 8), whose T(1,128) layout forces relayout copies.  Eight
    rows give a CHANNEL-MAJOR [32, W] stack (rows c*8+r — plain
    concatenation, no interleave), full sublane utilization, 8x fewer
    sequential grid steps, and direct (8, w)-blocked [B, N] operands.

    Per-row arithmetic (windows, scan steps, carry adds) is IDENTICAL to
    the 1-row kernel and the XLA fallback: the [32, W] ops are
    elementwise over independent rows, so outputs stay bitwise equal.

    carry_v: [32, 128] f32 VMEM — running segment sums per (channel,
    row) in column 0 (VMEM instead of SMEM: the 32 carries are written
    as one computed [32, 1] masked-lane reduce, which Mosaic cannot
    scalar-extract into SMEM).
    scratch: [2 * 8 * W, 128] — per-(buffer, row) staging regions,
    the same overlapping-window DMA contract per row.
    tmp: [48, W] — rows 0..7 key_f, 8..31 x/y/z scans (channel-major),
    32..39 count-at-run-end, 40..47 is_end flags.
    """
    if quantum is None:
        oz_ref, out_ref, scratch, tmp, carry_v, sem, sem2 = rest
    else:
        out_ref, scratch, tmp, carry_v, sem, sem2 = rest
    bb = pl.program_id(0)
    i = pl.program_id(1)
    gstep = bb * pl.num_programs(1) + i
    last = pl.num_programs(0) * pl.num_programs(1) - 1
    w_full = group * 128
    base = lax.rem(gstep, 2)

    key = key_ref[...]  # [8, W] int32
    valid = key < sentinel
    prevcol = jnp.concatenate(
        [jnp.full((1, 1), meta_ref[r, 1, i], jnp.int32) for r in range(8)],
        axis=0,
    )  # [8, 1]
    nextcol = jnp.concatenate(
        [jnp.full((1, 1), meta_ref[r, 0, i + 1], jnp.int32) for r in range(8)],
        axis=0,
    )
    key_prev = jnp.concatenate([prevcol, key[:, :-1]], axis=1)
    key_next = jnp.concatenate([key[:, 1:], nextcol], axis=1)
    heads = (valid & (key != key_prev)).astype(jnp.int32)  # [8, W]
    is_end = valid & (key != key_next)

    @pl.when(i == 0)
    def _reset_carry():
        carry_v[:, 0:1] = jnp.zeros((32, 1), jnp.float32)

    if quantum is None:
        ox, oy, oz = a_ref[...], b_ref[...], oz_ref[...]
    else:
        ox, oy, oz = _unpack_offsets(a_ref[...], b_ref[...], quantum)
    ch = jnp.concatenate(
        [ox, oy, oz, jnp.where(valid, 1.0, 0.0)],
        axis=0,
    )  # [32, W] channel-major (row c*8+r)
    f_all = jnp.concatenate([heads] * 4, axis=0)  # [32, W]
    v = _scan_channels(ch, f_all, w_full)

    no_head_yet = _cum_or(heads) == 0  # [8, W]
    nhy4 = jnp.concatenate([no_head_yet] * 4, axis=0)  # [32, W]
    carr = carry_v[:, 0:1]  # [32, 1]
    v = v + jnp.where(nhy4, carr, 0.0)
    last_mask = lax.broadcasted_iota(jnp.int32, (1, w_full), 1) == w_full - 1
    carry_v[:, 0:1] = jnp.sum(
        jnp.where(last_mask, v, 0.0), axis=1, keepdims=True
    )

    key_f = key.astype(jnp.float32)  # [8, W]
    cnt_end = jnp.where(is_end, v[24:32], 0.0)  # [8, W]
    tmp[...] = jnp.concatenate(
        [key_f, v[0:24], cnt_end, jnp.where(is_end, 1.0, 0.0)], axis=0
    )  # [48, W]

    lane_tri = (
        lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.bfloat16)
    r_iota = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ws = min(flush, w_full)
    cps = []
    for r in range(8):
        step_start = excl_ref[r, 0, i * group]
        rbase = (base * 8 + r) * w_full
        for g in range(group):
            sl = slice(g * 128, (g + 1) * 128)
            occ = tmp[40 + r : 41 + r, sl] > 0.0  # [1, 128]
            ranks = (
                lax.dot_general(
                    occ.astype(jnp.bfloat16), lane_tri,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                - 1
            )
            sel = (ranks == r_iota) & occ  # [128, 128]
            rows = (r, 8 + r, 16 + r, 24 + r, 32 + r)  # key, x, y, z, cnt
            cols = [
                jnp.sum(
                    jnp.where(sel, tmp[ri : ri + 1, sl], 0.0),
                    axis=1, keepdims=True,
                )
                for ri in rows
            ]
            block_out = jnp.concatenate(cols, axis=1)  # [128, 5]
            lstart = excl_ref[r, 0, i * group + g] - step_start
            scratch[pl.ds(rbase + lstart, 128), 0:5] = block_out

        written = excl_ref[r, 0, (i + 1) * group] - step_start
        start1 = jnp.minimum(step_start, capacity)
        cp1 = pltpu.make_async_copy(
            scratch.at[pl.ds(rbase, ws), :],
            out_ref.at[bb * 8 + r, pl.ds(start1, ws), :],
            sem,
        )
        cps.append((cp1, written, step_start, rbase, r))

    # wait the PREVIOUS step's 8 copies before starting any of this
    # step's (including the conditional remainder flushes): the
    # overlapping-window contract requires later windows' writes to land
    # after earlier windows'.
    @pl.when(gstep > 0)
    def _wait_prev():
        for r in range(8):
            pltpu.make_async_copy(
                scratch.at[pl.ds(((1 - base) * 8 + r) * w_full, ws), :],
                out_ref.at[bb * 8 + r, pl.ds(0, ws), :],
                sem,
            ).wait()

    for cp, written, step_start, rbase, r in cps:
        cp.start()
        if ws < w_full:

            @pl.when(written > ws - 128)
            def _flush_rest(r=r, rbase=rbase, step_start=step_start):
                start2 = jnp.minimum(step_start + ws, capacity + ws)
                cp2 = pltpu.make_async_copy(
                    scratch.at[pl.ds(rbase + ws, w_full - ws), :],
                    out_ref.at[bb * 8 + r, pl.ds(start2, w_full - ws), :],
                    sem2,
                )
                cp2.start()
                cp2.wait()

    @pl.when(gstep == last)
    def _drain():
        for cp, *_ in cps:
            cp.wait()


def _kernel2w(
    meta_ref, excl_ref, key_ref, a_ref, b_ref, *rest, group: int,
    capacity: int, sentinel: int, flush: int, quantum: float | None = None,
):
    """Two-windows-per-step variant of ``_kernel``: grid (B, steps/2).

    Step i processes windows 2i and 2i+1 of one row.  The channel stack is
    [8, W] (rows 0..3 = window a's x/y/z/count, 4..7 = window b's) — full
    sublane utilization — and the segmented scans of both windows run as
    ONE vector op per shift step.  Window b's carry-in is window a's
    ADJUSTED last row (scan + one carry add — exactly the value the
    sequential 1-row chain passes forward), routed through the SMEM carry
    row, so every per-element expression matches the 1-row kernel and the
    XLA fallback: outputs are bitwise equal.

    DMA ordering (the overlapping-window overwrite contract requires
    window copies to land in ascending order): window a compacts to
    scratch[0:W] and its copy starts while window b's compaction computes;
    a's copy (and its conditional remainder) is WAITED before b's copy
    starts; b's copy to scratch[W:2W] stays in flight across the step
    boundary and is waited at the next step's start (or drained at the
    last step).  One W-sized scratch region per window — same total
    scratch as the 1-row kernel's double buffer.
    """
    cnt_ref = None
    if quantum is None:
        if len(rest) == 8:  # 4th value buffer: per-row counts (merge path)
            oz_ref, cnt_ref, out_ref, scratch, tmp, carry, sem, sem2 = rest
        else:
            oz_ref, out_ref, scratch, tmp, carry, sem, sem2 = rest
    else:
        out_ref, scratch, tmp, carry, sem, sem2 = rest
    bi = pl.program_id(0)
    i = pl.program_id(1)
    gstep = bi * pl.num_programs(1) + i
    last = pl.num_programs(0) * pl.num_programs(1) - 1
    w_full = group * 128

    key2 = key_ref[0, 0]  # [1, 2W] int32
    key = jnp.concatenate([key2[:, :w_full], key2[:, w_full:]], axis=0)  # [2, W]
    valid = key < sentinel
    prevcol = jnp.concatenate(
        [
            jnp.full((1, 1), meta_ref[0, 1, 2 * i], jnp.int32),
            jnp.full((1, 1), meta_ref[0, 1, 2 * i + 1], jnp.int32),
        ],
        axis=0,
    )  # [2, 1]
    nextcol = jnp.concatenate(
        [
            jnp.full((1, 1), meta_ref[0, 0, 2 * i + 1], jnp.int32),
            jnp.full((1, 1), meta_ref[0, 0, 2 * i + 2], jnp.int32),
        ],
        axis=0,
    )
    key_prev = jnp.concatenate([prevcol, key[:, :-1]], axis=1)
    key_next = jnp.concatenate([key[:, 1:], nextcol], axis=1)
    heads = (valid & (key != key_prev)).astype(jnp.int32)  # [2, W]
    is_end = valid & (key != key_next)

    @pl.when(i == 0)
    def _reset_carry():
        for ci in range(4):
            carry[0, ci] = 0.0

    if quantum is None:
        ox2, oy2, oz2 = a_ref[0, 0], b_ref[0, 0], oz_ref[0, 0]  # [1, 2W]
    else:
        ox2, oy2, oz2 = _unpack_offsets(a_ref[0, 0], b_ref[0, 0], quantum)
    if cnt_ref is not None:
        c2 = cnt_ref[0, 0]  # [1, 2W]
        cnt2 = jnp.where(
            valid,
            jnp.concatenate([c2[:, :w_full], c2[:, w_full:]], axis=0),
            0.0,
        )  # [2, W]
    else:
        cnt2 = jnp.where(valid, 1.0, 0.0)  # [2, W]
    # rows 0..3 window a channels, 4..7 window b channels
    ch = jnp.concatenate(
        [
            ox2[:, :w_full], oy2[:, :w_full], oz2[:, :w_full], cnt2[0:1],
            ox2[:, w_full:], oy2[:, w_full:], oz2[:, w_full:], cnt2[1:2],
        ],
        axis=0,
    )  # [8, W]
    f_all = jnp.concatenate([heads[0:1]] * 4 + [heads[1:2]] * 4, axis=0)
    v = _scan_channels(ch, f_all, w_full)

    no_head_yet = _cum_or(heads) == 0  # [2, W]
    last_mask = lax.broadcasted_iota(jnp.int32, (1, w_full), 1) == w_full - 1
    # window a: join the SMEM carry (same single add as the 1-row kernel)
    carr_a = jnp.concatenate(
        [jnp.full((1, 1), carry[0, ci], jnp.float32) for ci in range(4)], axis=0
    )  # [4, 1]
    v_a = v[0:4] + jnp.where(no_head_yet[0:1], carr_a, 0.0)
    # window b's carry-in = window a's adjusted last row (the exact value
    # the sequential chain forwards); routed through SMEM so the splat is
    # a scalar broadcast, like every other carry read
    for ci in range(4):
        carry[0, ci] = jnp.sum(jnp.where(last_mask, v_a[ci : ci + 1], 0.0))
    carr_b = jnp.concatenate(
        [jnp.full((1, 1), carry[0, ci], jnp.float32) for ci in range(4)], axis=0
    )
    v_b = v[4:8] + jnp.where(no_head_yet[1:2], carr_b, 0.0)
    for ci in range(4):
        carry[0, ci] = jnp.sum(jnp.where(last_mask, v_b[ci : ci + 1], 0.0))

    key_f = key.astype(jnp.float32)  # [2, W]
    # tmp rows 0..5 = window a (key, x, y, z, cnt_end, is_end), 8..13 = b
    for j, vv in ((0, v_a), (1, v_b)):
        tmp[8 * j : 8 * j + 1, :] = key_f[j : j + 1]
        tmp[8 * j + 1 : 8 * j + 4, :] = vv[0:3]
        tmp[8 * j + 4 : 8 * j + 5, :] = jnp.where(
            is_end[j : j + 1], vv[3:4], 0.0
        )
        tmp[8 * j + 5 : 8 * j + 6, :] = jnp.where(is_end[j : j + 1], 1.0, 0.0)

    lane_tri = (
        lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.bfloat16)
    r_iota = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ws = min(flush, w_full)

    # wait the PREVIOUS step's window-b copy before touching its scratch
    # region or writing any output rows this step
    @pl.when(gstep > 0)
    def _wait_prev():
        pltpu.make_async_copy(
            scratch.at[pl.ds(w_full, ws), :],
            out_ref.at[bi, pl.ds(0, ws), :],
            sem,
        ).wait()

    def _compact_window(j):
        wi = 2 * i + j
        step_start = excl_ref[0, 0, wi * group]
        for g in range(group):
            sl = slice(g * 128, (g + 1) * 128)
            occ = tmp[8 * j + 5 : 8 * j + 6, sl] > 0.0
            ranks = (
                lax.dot_general(
                    occ.astype(jnp.bfloat16), lane_tri,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                - 1
            )
            sel = (ranks == r_iota) & occ
            cols = [
                jnp.sum(
                    jnp.where(sel, tmp[8 * j + ci : 8 * j + ci + 1, sl], 0.0),
                    axis=1, keepdims=True,
                )
                for ci in range(5)
            ]
            block_out = jnp.concatenate(cols, axis=1)  # [128, 5]
            lstart = excl_ref[0, 0, wi * group + g] - step_start
            scratch[pl.ds(j * w_full + lstart, 128), 0:5] = block_out
        written = excl_ref[0, 0, (wi + 1) * group] - step_start
        start1 = jnp.minimum(step_start, capacity)
        cp = pltpu.make_async_copy(
            scratch.at[pl.ds(j * w_full, ws), :],
            out_ref.at[bi, pl.ds(start1, ws), :],
            sem,
        )
        return cp, written, step_start

    def _flush_rest(j, written, step_start):
        if ws < w_full:

            @pl.when(written > ws - 128)
            def _go():
                start2 = jnp.minimum(step_start + ws, capacity + ws)
                cp2 = pltpu.make_async_copy(
                    scratch.at[pl.ds(j * w_full + ws, w_full - ws), :],
                    out_ref.at[bi, pl.ds(start2, w_full - ws), :],
                    sem2,
                )
                cp2.start()
                cp2.wait()

    cp_a, written_a, sstart_a = _compact_window(0)
    cp_a.start()  # a's copy flies while window b compacts
    cp_b, written_b, sstart_b = _compact_window(1)
    cp_a.wait()  # a (and its remainder) must land before b starts
    _flush_rest(0, written_a, sstart_a)
    cp_b.start()
    _flush_rest(1, written_b, sstart_b)

    @pl.when(gstep == last)
    def _drain():
        cp_b.wait()


def _cum_or(flags):
    """Inclusive cumulative OR along the last axis via the same shift
    schedule as the scan (boolean — no rounding, any order identical)."""
    f = flags
    d = 1
    w = f.shape[-1]
    while d < w:
        f = f | jnp.concatenate(
            [jnp.zeros(f.shape[:-1] + (d,), f.dtype), f[..., :-d]], axis=-1
        )
        d *= 2
    return f


def _flags(skey, sentinel: int):
    """Global head / run-end flags of the sorted key buffer."""
    valid = skey < sentinel
    prev = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
    nxt = jnp.concatenate([skey[1:], jnp.full((1,), -2, skey.dtype)])
    heads = valid & (skey != prev)
    is_end = valid & (skey != nxt)
    return valid, heads, is_end


def _xla_fallback(
    skey, offs, sentinel: int, capacity: int, group: int,
    quantum: float | None = None,
):
    """Bitwise twin of the kernel: identical window scans + carry adds,
    exact gathers at the compacted run-end rows."""
    from .mxu_histogram import compact_occupied_blocks

    cnt_src = None
    if quantum is not None:
        offs = _unpack_offsets(offs[0], offs[1], quantum)
    elif len(offs) == 4:  # 4th value buffer: per-row counts (merge path)
        cnt_src = offs[3]
        offs = offs[:3]
    n = skey.shape[0]
    w = group * 128
    steps = n // w
    valid, heads, is_end = _flags(skey, sentinel)

    hw = heads.astype(jnp.int32).reshape(steps, w)
    cnt_vals = (
        jnp.where(valid, cnt_src, 0.0)
        if cnt_src is not None
        else jnp.where(valid, 1.0, 0.0)
    )
    ch = jnp.stack(
        [offs[c].reshape(steps, w) for c in range(3)]
        + [cnt_vals.reshape(steps, w)],
        axis=0,
    )  # [4, steps, w]
    local = _scan_channels(ch, hw, w)  # the kernel's exact step sequence

    no_head_yet = _cum_or(hw) == 0  # [steps, w]

    lastcol = local[..., -1].T  # [steps, 4]
    gate = no_head_yet[:, -1]  # whole window continues the open segment

    def carry_step(c, x):
        lc, g = x
        out = lc + jnp.where(g, c, 0.0)  # the kernel's single carry add
        return out, c

    _, carries = lax.scan(carry_step, jnp.zeros((4,), jnp.float32), (lastcol, gate))
    adj = [
        (local[ci] + jnp.where(no_head_yet, carries[:, ci : ci + 1], 0.0)).reshape(
            n
        )
        for ci in range(4)
    ]

    cnt_end = jnp.where(is_end, adj[3], 0.0)
    occ2d = is_end.reshape(n // 128, 128)
    loc, num = compact_occupied_blocks(occ2d, capacity)
    key_f = skey.astype(jnp.float32)
    vals = jnp.stack(
        [key_f[loc], adj[0][loc], adj[1][loc], adj[2][loc], cnt_end[loc]], axis=-1
    )
    return vals, num


def _pallas_batched(
    skey, bufs, sentinel, capacity, group, flush, interpret, quantum=None,
):
    """skey [B, N] int32, bufs = three [B, N] f32 offsets (quantum=None) or
    two [B, N] int32 packed payloads -> (vals [B, capacity, 5], num [B])."""
    bsz, n = skey.shape
    w = group * 128
    steps = n // w
    a = n // 128

    is_end = jax.vmap(lambda k: _flags(k, sentinel)[2])(skey)
    per_block = jnp.sum(is_end.reshape(bsz, a, 128).astype(jnp.int32), axis=2)
    offsets = jnp.cumsum(per_block, axis=1)
    num = offsets[:, -1]
    excl = offsets - per_block
    excl = jnp.concatenate(
        [excl, jnp.broadcast_to(num[:, None], (bsz, group))], axis=1
    ).reshape(bsz, 1, a + group)

    firsts = jnp.concatenate(
        [skey[:, ::w], jnp.full((bsz, 1), -2, jnp.int32)], axis=1
    )  # [B, steps+1]
    prevs = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), skey[:, w - 1 :: w][:, : steps - 1]],
        axis=1,
    )  # [B, steps]
    meta = jnp.stack(
        [firsts, jnp.pad(prevs, ((0, 0), (0, 1)))], axis=1
    )  # [B, 2, steps+1]

    s_pad = capacity + w
    out = pl.pallas_call(
        functools.partial(
            _kernel, group=group, capacity=capacity, sentinel=sentinel,
            flush=flush, quantum=quantum,
        ),
        grid=(bsz, steps),
        in_specs=[
            pl.BlockSpec(
                (1, 2, steps + 1), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, a + group), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ] + [
            pl.BlockSpec(
                (1, 1, 1, w), lambda bi, i: (bi, 0, 0, i),
                memory_space=pltpu.VMEM,
            )
            for _ in range(1 + len(bufs))
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, s_pad, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * w, 128), jnp.float32),
            pltpu.VMEM((8, w), jnp.float32),
            pltpu.SMEM((1, 4), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        meta, excl, skey[:, None, None, :],
        *[b[:, None, None, :] for b in bufs],
    )
    return out[:, :capacity, :5], num


def _pallas_batched2w(
    skey, bufs, sentinel, capacity, group, flush, interpret, quantum=None,
):
    """Two-windows-per-step launcher: grid (B, steps/2) with (1, 2W) key /
    payload blocks.  Same meta/excl tables as ``_pallas_batched`` —
    ``_kernel2w`` indexes them at 2i/2i+1."""
    bsz, n = skey.shape
    w = group * 128
    steps = n // w
    a = n // 128

    is_end = jax.vmap(lambda k: _flags(k, sentinel)[2])(skey)
    per_block = jnp.sum(is_end.reshape(bsz, a, 128).astype(jnp.int32), axis=2)
    offsets = jnp.cumsum(per_block, axis=1)
    num = offsets[:, -1]
    excl = offsets - per_block
    excl = jnp.concatenate(
        [excl, jnp.broadcast_to(num[:, None], (bsz, group))], axis=1
    ).reshape(bsz, 1, a + group)

    firsts = jnp.concatenate(
        [skey[:, ::w], jnp.full((bsz, 1), -2, jnp.int32)], axis=1
    )
    prevs = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), skey[:, w - 1 :: w][:, : steps - 1]],
        axis=1,
    )
    meta = jnp.stack([firsts, jnp.pad(prevs, ((0, 0), (0, 1)))], axis=1)

    s_pad = capacity + w
    out = pl.pallas_call(
        functools.partial(
            _kernel2w, group=group, capacity=capacity, sentinel=sentinel,
            flush=flush, quantum=quantum,
        ),
        grid=(bsz, steps // 2),
        in_specs=[
            pl.BlockSpec(
                (1, 2, steps + 1), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, a + group), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ] + [
            pl.BlockSpec(
                (1, 1, 1, 2 * w), lambda bi, i: (bi, 0, 0, i),
                memory_space=pltpu.VMEM,
            )
            for _ in range(1 + len(bufs))
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, s_pad, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * w, 128), jnp.float32),
            pltpu.VMEM((16, w), jnp.float32),
            pltpu.SMEM((1, 4), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        meta, excl, skey[:, None, None, :],
        *[b[:, None, None, :] for b in bufs],
    )
    return out[:, :capacity, :5], num


def _pallas_batched8(
    skey, bufs, sentinel, capacity, group, flush, interpret, quantum=None,
):
    """8-rows-per-step launcher: pads B to a multiple of 8 and runs
    ``_kernel8`` on grid (B/8, steps) with direct (8, w)-blocked [B, N]
    operands.  Padded rows carry all-sentinel keys (num = 0; their
    outputs are sliced off)."""
    bsz0, n = skey.shape
    pad = (-bsz0) % 8
    if pad:
        skey = jnp.concatenate(
            [skey, jnp.full((pad, n), sentinel, skey.dtype)], axis=0
        )
        bufs = tuple(
            jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
            for b in bufs
        )
    bsz = bsz0 + pad
    w = group * 128
    steps = n // w
    a = n // 128

    is_end = jax.vmap(lambda k: _flags(k, sentinel)[2])(skey)
    per_block = jnp.sum(is_end.reshape(bsz, a, 128).astype(jnp.int32), axis=2)
    offsets = jnp.cumsum(per_block, axis=1)
    num = offsets[:, -1]
    excl = offsets - per_block
    excl = jnp.concatenate(
        [excl, jnp.broadcast_to(num[:, None], (bsz, group))], axis=1
    ).reshape(bsz, 1, a + group)

    firsts = jnp.concatenate(
        [skey[:, ::w], jnp.full((bsz, 1), -2, jnp.int32)], axis=1
    )
    prevs = jnp.concatenate(
        [jnp.full((bsz, 1), -1, jnp.int32), skey[:, w - 1 :: w][:, : steps - 1]],
        axis=1,
    )
    meta = jnp.stack([firsts, jnp.pad(prevs, ((0, 0), (0, 1)))], axis=1)

    s_pad = capacity + w
    out = pl.pallas_call(
        functools.partial(
            _kernel8, group=group, capacity=capacity, sentinel=sentinel,
            flush=flush, quantum=quantum,
        ),
        grid=(bsz // 8, steps),
        in_specs=[
            pl.BlockSpec(
                (8, 2, steps + 1), lambda bb, i: (bb, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, 1, a + group), lambda bb, i: (bb, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ] + [
            pl.BlockSpec((8, w), lambda bb, i: (bb, i), memory_space=pltpu.VMEM)
            for _ in range(1 + len(bufs))
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, s_pad, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * 8 * w, 128), jnp.float32),
            pltpu.VMEM((48, w), jnp.float32),
            pltpu.VMEM((32, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(meta, excl, skey, *bufs)
    return out[:bsz0, :capacity, :5], num[:bsz0]


def sorted_run_reduce(
    skey: jax.Array,
    offs: jax.Array,
    sentinel: int,
    capacity: int,
    group: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    flush: int | None = None,
    quantum: float | None = None,
):
    """Per-run (key, sum_x, sum_y, sum_z, count) of a key-sorted buffer,
    compacted to the first ``capacity`` runs in ascending key order.

    ``skey``: [N] int32 ascending keys, ``sentinel`` for invalid rows
    (sorted last).  ``offs``: the per-row values to segment-sum — a tuple
    of three [N] f32 arrays (preferred: the kernel consumes the three sort
    payload buffers directly, no [3, N] stack) or one [3, N] array.
    With ``quantum`` set, ``offs`` is instead a tuple of TWO int32 arrays
    (pxy, pz): x in pxy's high 16 bits, y in its low 16, z in pz — 16-bit
    fixed-point multiples of ``quantum``, decoded in-kernel
    (``_unpack_offsets``); one fewer payload buffer through the caller's
    sort and this kernel's HBM streams.
    A FOUR-buffer ``offs`` (quantum=None only) makes the 4th buffer the
    per-row COUNTS: the count channel sums those values instead of the
    implicit 1s — the partial-table merge path (merge_voxel_partials),
    where each sorted row already carries a point count.  With counts of
    all-ones the outputs are bitwise identical to the 3-buffer form (the
    channel arithmetic is unchanged).
    N must be a multiple of 128*group.  Returns (vals [capacity, 5] f32,
    num [] int32); slots >= num are unspecified (callers mask), channel 0
    is the run key as f32 (exact for keys < 2^24).

    One fused sequential pass on TPU (see module docstring); the XLA
    fallback computes bitwise-identical values.  vmap-safe: a custom rule
    routes batches onto the kernel's (B, steps) grid.
    """
    n = skey.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and pl is not None
    if group is None:
        # ``group`` must be a pure function of N — never of batch size or
        # backend — so the 1-row kernel, the 8-row kernel, and the XLA
        # fallback all build the SAME window structure and stay bitwise
        # equal (the TPU<->CPU crosscheck depends on it).  Flagship-scale
        # tables take 8 (the 8-row kernel's VMEM budget caps w at 1024;
        # its step-count/utilization win dominates the batch path);
        # fullscale windows take 32 (batch is 1 there — the 1-row kernel
        # runs, where bigger windows measured faster).
        pref = 8 if n // 128 <= 4096 else 32
        group = next(g for g in (pref, 8, 4, 2, 1) if n % (g * 128) == 0)
    if flush is None:
        # 512 measured best at group 8 (9.26 vs 10.0 ms/batch full-window)
        # and at the fullscale group-32 shape (3.67 vs 4.0) —
        # tpu_experiments24.py.  DMA-only: no effect on values.
        flush = 512
    if n % (group * 128):
        raise ValueError(f"N={n} must be a multiple of group*128={group*128}")
    if isinstance(offs, (tuple, list)):
        bufs = tuple(offs)
    else:
        bufs = (offs[0], offs[1], offs[2])
    if quantum is not None and len(bufs) != 2:
        raise ValueError("quantum set: offs must be the (pxy, pz) int32 pair")
    if quantum is None and len(bufs) not in (3, 4):
        raise ValueError(
            "offs must carry three offset buffers (or four: the 4th is "
            "per-row COUNTS replacing the count channel's implicit 1s — "
            "the partial-table merge path)"
        )
    if not use_pallas:
        return _xla_fallback(skey, bufs, sentinel, capacity, group, quantum)

    steps = n // (group * 128)

    @jax.custom_batching.custom_vmap
    def run(k, *bs):
        # Unbatched rows (the fullscale window) take the 2-windows-per-step
        # kernel when the step count pairs up: full sublane use, half the
        # sequential steps, bitwise-equal outputs (see _kernel2w).
        if KERNEL2W_ENABLED and steps % 2 == 0 and steps >= 2:
            vals, num = _pallas_batched2w(
                k[None], tuple(b[None] for b in bs), sentinel, capacity,
                group, flush, interpret, quantum,
            )
        else:
            vals, num = _pallas_batched(
                k[None], tuple(b[None] for b in bs), sentinel, capacity,
                group, flush, interpret, quantum,
            )
        return vals[0], num[0]

    @run.def_vmap
    def _rule(axis_size, in_batched, k, *bs):  # noqa: ANN001 - jax API
        if not all(in_batched):  # pragma: no cover
            raise NotImplementedError("sorted_run_reduce: vmap over all args")
        # 8-row kernel for real batches (pads B up to a multiple of 8);
        # its per-row arithmetic is identical, so this choice is
        # value-invisible.  group > 8 exceeds its VMEM scratch budget.
        # The counts-channel layout (4 bufs) is not plumbed into _kernel8
        # — batches with counts take the generic kernel.
        if axis_size >= 8 and group <= 8 and KERNEL8_ENABLED and len(bs) != 4:
            vals, num = _pallas_batched8(
                k, bs, sentinel, capacity, group, flush, interpret, quantum
            )
        else:
            vals, num = _pallas_batched(
                k, bs, sentinel, capacity, group, flush, interpret, quantum
            )
        return (vals, num), (True, True)

    return run(skey, *bufs)
