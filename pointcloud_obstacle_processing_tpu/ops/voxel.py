"""VoxelGrid downsampling (pcl::VoxelGrid equivalent).

The reference delegates to ``pcl::VoxelGrid`` with a cubic leaf
(downsample_cloud, obstacle_detection.cpp:271-296; leaf size
``downsample_size`` = 0.015, params.yaml:16).  Semantics to match
(SURVEY.md §2.2): points are binned into leaf-size cubes with
``ijk = floor(coord / leaf)`` on *absolute* coordinates, and the output is
one point per occupied voxel at the **centroid** (mean) of its members.

TPU-native design — no hash tables, no host round-trips.  Four binning
engines, chosen statically by crop-box/bin-count (measured rationale in
docs/PERFORMANCE.md; scatters serialize at ~20 cycles/update, while
batched multi-operand SORTS are nearly free — the round-1 "27 ms-class
sort" datum was overturned by the sort-engine work, CLAUDE.md):

1. **Sort engine** (the default, ``binning="sort"``/"auto" with packable
   bounds): ONE stable 1-key sort of the packed lattice key carrying
   corner-relative offset payloads + the fused Pallas run-reduce kernel
   (``_sort_segment_partials`` / ops/pallas_runreduce.py) — K-independent,
   full-f32 sums; serves the flagship 230k-bin and the fullscale
   3.9M-bin lattices alike.
2. **MXU dense-bin** (``binning="mxu"``, K <= 2^19): per-bin
   [offset_x, offset_y, offset_z, count] accumulated as one-hot
   outer-product matmuls (ops/mxu_histogram.py), offsets voxel-corner
   relative for bf16-split precision; occupied bins compacted with the
   block-structured stream compaction — no sort, no big scatter.
3. **Dense scatter** (``binning="scatter"``, K <= 2^23): one fused
   [K, 4] scatter-add — N-bound.  NOTE the [K, 4] scatter target is
   channel-minor and lane-pads 4 -> 128 (CLAUDE.md layout facts): at the
   3.9M-bin lattice that is a ~2 GB padded intermediate, which is one
   more reason the sort engine is the shipped default there (kept as-is:
   the fused wide-row scatter form is the measured one; re-measure
   before re-laying it out).
4. **3-key sort fallback** (no bounds / lattices beyond 2^23 bins):
   stable multi-key ``lax.sort`` with INT32_MAX sentinels, head
   detection at key changes, segment scatter-add on compact ids.

All paths emit centroids = sums / counts for the first ``min(num_voxels,
max_voxels)`` occupied voxels in ascending (ix, iy, iz) order —
deterministic, the same spirit as PCL's packed-leaf-index ordering.

The intermediate (key, sum, count) form is exposed as ``voxel_partials`` /
``merge_voxel_partials`` so point-sharded multi-chip execution can voxelize
local shards independently, all_gather the small partial tables, and merge —
the cross-shard reduction the reference never needed (single process) but a
100M-point accumulation window does (SURVEY.md §2.3 rebuild plan).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud

__all__ = [
    "voxel_downsample",
    "voxel_partials",
    "merge_voxel_partials",
    "merge_voxel_partials_packed",
    "VoxelResult",
    "VoxelPartials",
]

_I32_MAX = jnp.iinfo(jnp.int32).max

# merge_voxel_partials: gathered-table row count at or above which the
# packed-sort + run-reduce merge replaces the dense-bin scatter merge
# (the scatter serializes ~20 cyc/row: 93.8 vs 12.9 ms at the fullscale
# 2M-row gather, scripts/tpu_experiments66.py; small SP tables keep the
# scatter, whose ~3 ms at 128k rows isn't worth re-validating).
_SORT_MERGE_MIN_ROWS = 1 << 19


class VoxelResult(NamedTuple):
    cloud: Cloud  # [max_voxels] centroids, key-sorted
    num_voxels: jax.Array  # [] int32: true number of occupied voxels
    overflow: jax.Array  # [] bool: num_voxels > max_voxels (extras dropped)


class VoxelPartials(NamedTuple):
    """Per-voxel partial sums, key-sorted, padded to a fixed capacity."""

    keys: jax.Array  # [cap, 3] int32 voxel coords (INT32_MAX = empty slot)
    sums: jax.Array  # [cap, 3] float32 coordinate sums
    counts: jax.Array  # [cap] float32 member counts (0 = empty)
    num_voxels: jax.Array  # [] int32
    overflow: jax.Array  # [] bool


def _reduce_sorted_keys(
    kx, ky, kz, sums, counts, capacity: int
) -> VoxelPartials:
    """Segment-reduce (sums, counts) over key-sorted rows into ``capacity``
    compact slots.  Inputs must be sorted by (kx, ky, kz) with INT32_MAX
    sentinel keys for invalid rows; ``counts > 0`` marks real rows.

    Precision caveat (fallback paths only): the segment sums accumulate
    through ``.at[ids].add`` with duplicate indices, whose per-duplicate
    accumulation ORDER is the scatter implementation's choice — with the
    callers' stable sorts the operand order is deterministic, but f32
    sums may still differ between backends whose scatters accumulate in
    a different order.  The default sort engine does not use this path
    (its run-reduce evaluates a fixed tree on every backend); the
    TPU<->CPU crosscheck runs the default engines."""
    n = kx.shape[0]
    real = counts > 0.0
    first = jnp.zeros((n,), bool).at[0].set(True)
    changed = (
        first
        | (kx != jnp.roll(kx, 1))
        | (ky != jnp.roll(ky, 1))
        | (kz != jnp.roll(kz, 1))
    )
    head = changed & real
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    num = jnp.sum(head.astype(jnp.int32))

    ids = jnp.where(real, seg_id, capacity)  # OOB -> dropped
    out_sums = jnp.zeros((capacity, 3), jnp.float32).at[ids].add(sums, mode="drop")
    out_counts = jnp.zeros((capacity,), jnp.float32).at[ids].add(counts, mode="drop")
    out_keys = jnp.full((capacity, 3), _I32_MAX, jnp.int32)
    head_ids = jnp.where(head, seg_id, capacity)
    out_keys = out_keys.at[head_ids].set(
        jnp.stack([kx, ky, kz], axis=-1), mode="drop"
    )

    slot = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    valid = slot < jnp.minimum(num, capacity)
    return VoxelPartials(
        keys=jnp.where(valid[:, None], out_keys, _I32_MAX),
        sums=jnp.where(valid[:, None], out_sums, 0.0),
        counts=jnp.where(valid, out_counts, 0.0),
        num_voxels=num,
        overflow=num > capacity,
    )


def _dense_bins_to_partials(
    bins, occ2d, dims, imin, capacity: int, leaf_size: float,
    corner_relative: bool,
) -> VoxelPartials:
    """Dense channel-leading [4, K] (sum_xyz, count) bins -> VoxelPartials.

    ``occ2d`` is the [A, B] occupancy block view of the same bins; output
    slots are the first ``capacity`` occupied bins in ascending packed order
    (= ascending (ix, iy, iz)).

    Compaction + value fetch go through ``compact_and_gather_exact``: a
    Pallas sequential-overwrite kernel on TPU, plain gathers elsewhere —
    both EXACT (values are the f32 bin contents bit-for-bit), so no
    precision machinery is needed here; the only inexactness in the voxel
    stage is the binning sums' own accumulation (``sum_precision``).
    """
    from .pallas_compaction import compact_and_gather_exact

    # block-structured stream compaction of the occupied bins + fused exact
    # value gather: no sort, no serialized bins[loc] row gather, no
    # [capacity, A] one-hot matmul
    loc, num, slot_vals = compact_and_gather_exact(bins, occ2d, capacity)
    slot = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    out_valid = slot < jnp.minimum(num, capacity)

    # unpack bin index -> absolute voxel coords (the one shared decode)
    lx, ly, lz = _unpack_keys(loc, (imin, dims))
    keys = jnp.where(
        out_valid[:, None],
        jnp.stack([lx, ly, lz], axis=-1),
        _I32_MAX,
    )
    slot_counts = slot_vals[:, 3]
    if corner_relative:
        # values are corner-relative sums: sum(p) = rel_sum + corner*count
        slot_corner = (
            jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32)
            * jnp.float32(leaf_size)
        )
        slot_sums = slot_vals[:, :3] + slot_corner * slot_counts[:, None]
    else:
        slot_sums = slot_vals[:, :3]
    return VoxelPartials(
        keys=keys,
        sums=jnp.where(out_valid[:, None], slot_sums, 0.0),
        counts=jnp.where(out_valid, slot_counts, 0.0),
        num_voxels=num,
        overflow=num > capacity,
    )


def _pack_spec(bounds, leaf_size: float):
    """Static packing of (ix, iy, iz) into one int32, if the crop-box voxel
    ranges fit.  Returns (imin, dims) as python ints or None."""
    if bounds is None:
        return None
    (x0, y0, z0), (x1, y1, z1) = bounds
    import math

    imin = [math.floor(v / leaf_size) for v in (x0, y0, z0)]
    imax = [math.floor(v / leaf_size) for v in (x1, y1, z1)]
    # max(..., 1): a degenerate/inverted box (e.g. the C++ default z_min >
    # z_max quirk, cpp:952-953) admits no points; keep shapes positive.
    dims = [max(b - a + 2, 1) for a, b in zip(imin, imax)]  # +1 span, +1 safety
    if dims[0] * dims[1] * dims[2] >= 2**31 - 2:
        return None
    return imin, dims


def _morton_schedule(dims):
    """Static bit-interleave schedule for (ix, iy, iz) under the crop box.

    Returns [(axis, src_bit), ...] from output LSB upward, cycling z, y, x
    while each axis still has bits (axis widths follow the box dims, so
    e.g. the fullscale [301, 253, 51] lattice packs into 9+8+6 = 23 bits —
    within f32's exact-integer range, which the compaction key channel
    requires).  The resulting order is a Z-curve.  NOTE: kept only as an
    experiment — Morton order was MEASURED WORSE for the banded kNN than
    row-major lattice order (Z-curve rank discontinuities scatter spatial
    neighbors far apart in rank: 11-20% of kNN neighbor sets perturbed at
    any band <= 512, vs 0.11% for lattice at band 512; see
    docs/PERFORMANCE.md's rejected list)."""
    bits = [max(1, int(d - 1).bit_length()) for d in dims]
    sched = []
    cnt = [0, 0, 0]
    while any(cnt[a] < bits[a] for a in range(3)):
        for a in (2, 1, 0):  # z minor, like the packed lattice order
            if cnt[a] < bits[a]:
                sched.append((a, cnt[a]))
                cnt[a] += 1
    return sched, sum(bits)


def _morton_encode(ix, iy, iz, sched):
    axes = (ix, iy, iz)
    out = jnp.zeros_like(ix)
    for i, (a, b) in enumerate(sched):
        out = out | (((axes[a] >> b) & 1) << i)
    return out


def _morton_decode(code, sched):
    outs = [jnp.zeros_like(code) for _ in range(3)]
    for i, (a, b) in enumerate(sched):
        outs[a] = outs[a] | (((code >> i) & 1) << b)
    return outs


def _sort_segment_partials(
    pts, valid, ijk, imin, dims, leaf_size: float, capacity: int,
    order: str = "lattice", payload_packing: bool = False,
) -> VoxelPartials:
    """Stable-sort + fused run-reduce voxel reduction (the default path).

    Measured rationale (docs/PERFORMANCE.md round 3): a batched 1-key
    ``lax.sort`` with 3 payloads is ~free on v5e (~1-3 ms/batch-of-32 at
    N=131k), while the dense one-hot histogram is MXU-FLOP-bound at
    4*N*K MACs (~45 ms/batch at K=230k) and the dense scatter serializes
    per point.  Pipeline:

    1. stable sort by the packed voxel key (stable => equal-key payload
       order is the input order: deterministic on every backend, so the
       f32 segment sums are bit-reproducible);
    2. ONE fused sequential pass (ops/pallas_runreduce.py) derives run
       boundaries from the sorted keys, segment-sums (off_x, off_y,
       off_z, 1) with window-local scans + SMEM carries, and compacts
       the per-run totals to the first ``capacity`` slots via the
       sequential-overwrite DMA scheme — replacing the former three-pass
       segscan -> run-end table -> compaction chain (the XLA fallback
       off-TPU computes bitwise-identical values).

    Offsets are voxel-corner relative so sums carry no
    |coordinate|-scaled error, and they are computed BEFORE the sort (a
    point's corner offset is sort-invariant) and carried as the sort
    payloads — no per-row key decode (two constant-divmod chains over the
    full buffer) is needed after the sort; only the ``capacity`` output
    slots decode their key.  The packed key rides the reduction as an
    f32 channel (K <= 2^23 < 2^24: exact).  Cost is K-independent — the
    same path serves the flagship 230k-bin lattice and the fullscale
    3.9M-bin (0.015-leaf) lattice.
    """
    from .pallas_runreduce import sorted_run_reduce

    n = pts.shape[0]
    if n % 128:
        raise ValueError(
            "the sort engine needs the POINT buffer length to be a "
            f"multiple of 128 (got cloud capacity n={n}; this is a "
            "constraint on max_points / the padded cloud, not on "
            "max_voxels)"
        )
    K = dims[0] * dims[1] * dims[2]
    ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
    iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
    iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
    if order == "morton":
        sched, total_bits = _morton_schedule(dims)
        if total_bits > 24:
            raise ValueError(
                "voxel_order='morton' needs <= 24 key bits for the exact "
                f"f32 key channel (lattice {dims} needs {total_bits})"
            )
        sentinel = 1 << total_bits
        packed = jnp.where(valid, _morton_encode(ix, iy, iz, sched), sentinel)
    else:
        sentinel = K
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)

    # corner-relative offsets BEFORE the sort: a point's offset within its
    # voxel is sort-invariant, so carrying offsets as the sort payloads
    # skips the full-buffer key decode entirely (invalid rows -> 0, and
    # their sorted positions are masked by svalid below anyway)
    corner0 = (
        jnp.stack(
            [ix + imin[0], iy + imin[1], iz + imin[2]], axis=0
        ).astype(jnp.float32)
        * jnp.float32(leaf_size)
    )  # [3, N] channel-leading
    off0 = jnp.where(valid[None, :], pts.T - corner0, 0.0)

    if payload_packing:
        # 16-bit fixed-point payload packing: offsets lie in [0, leaf), so
        # quantizing to leaf/65536 steps (~0.6 um at the flagship leaf —
        # two orders below the 1e-5 centroid tolerance) lets x|y ride ONE
        # int32 and z another: the stable sort moves 3 columns instead of
        # 4 and the run-reduce kernel streams 2 payload buffers instead
        # of 3, decoding in-register.  The truncating f32->int32 cast and
        # the decode multiply are identical correctly-rounded ops on
        # every backend, so TPU<->CPU bit-identity is preserved; only the
        # centroid-vs-exact error budget changes (by <= one quantum).
        quantum = leaf_size / 65536.0
        q = jnp.float32(65536.0 / leaf_size)
        qx = jnp.clip((off0[0] * q).astype(jnp.int32), 0, 65535)
        qy = jnp.clip((off0[1] * q).astype(jnp.int32), 0, 65535)
        qz = jnp.clip((off0[2] * q).astype(jnp.int32), 0, 65535)
        pxy = lax.shift_left(qx, 16) | qy
        skey, spxy, spz = lax.sort(
            (packed, pxy, qz), num_keys=1, is_stable=True
        )
        slot_vals, num = sorted_run_reduce(
            skey, (spxy, spz), sentinel, capacity, quantum=quantum
        )
    else:
        skey, sox, soy, soz = lax.sort(
            (packed, off0[0], off0[1], off0[2]), num_keys=1, is_stable=True
        )
        slot_vals, num = sorted_run_reduce(
            skey, (sox, soy, soz), sentinel, capacity
        )

    # ONE pass over the kernel's lane-padded [capacity, 128]-backed output:
    # the decode below consumes five channel vectors, and five separate
    # slot_vals[:, ch] extractions each re-read the wide buffer (~0.85
    # ms/window at the fullscale shape — scripts/tpu_experiments60.py
    # measured the decode tail at 1.15 ms with the narrow-slice read only
    # 0.1).  A transposed materialization reads once and hands the decode
    # a channel-leading [5, capacity] table; pure relayout, so values are
    # bitwise unchanged on every backend.
    sv = lax.optimization_barrier(slot_vals.T)

    target = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    out_valid = target < jnp.minimum(num, capacity)
    slot_key = jnp.clip(sv[0].astype(jnp.int32), 0, sentinel - 1)
    if order == "morton":
        dx, dy, dz = _morton_decode(slot_key, sched)
        lx, ly, lz = dx + imin[0], dy + imin[1], dz + imin[2]
    else:
        lx, ly, lz = _unpack_keys(slot_key, (imin, dims))
    # Tail shape discipline (measured, scripts/tpu_experiments38/39.py):
    # downstream of the kernel's lane-padded ANY output, [capacity, 3]
    # channel-minor STACKS inside the expression cost +3..5 ms/batch-of-32
    # at the flagship shape; computing each channel as a flat [capacity]
    # vector and stacking ONCE at the end is 15.9 -> 12.6 ms/batch.  The
    # per-element expression (operand order, masks) is unchanged, so
    # values stay bitwise identical on every backend.
    slot_counts = sv[4]
    lf = jnp.float32(leaf_size)
    key_cols = []
    sum_cols = []
    for ch, l in ((1, lx), (2, ly), (3, lz)):
        key_cols.append(jnp.where(out_valid, l, _I32_MAX))
        sum_cols.append(
            jnp.where(
                out_valid,
                sv[ch] + l.astype(jnp.float32) * lf * slot_counts,
                0.0,
            )
        )
    return VoxelPartials(
        keys=jnp.stack(key_cols, axis=-1),
        sums=jnp.stack(sum_cols, axis=-1),
        counts=jnp.where(out_valid, slot_counts, 0.0),
        num_voxels=num,
        overflow=num > capacity,
    )


def voxel_partials(
    cloud: Cloud, leaf_size: float, capacity: int, bounds=None,
    sum_precision: str = "exact", binning: str = "auto", order: str = "lattice",
    payload_packing: bool = False,
) -> VoxelPartials:
    """Bin points into voxels and return per-voxel (key, sum, count).

    ``bounds``: optional static ((x0,y0,z0), (x1,y1,z1)) crop box enclosing
    every valid point.  When given (the pipeline passes its crop box) the
    voxel coords pack into one bounded int32 key (requires K <= 2^23).

    ``binning`` selects the reduction engine for packed keys (the choice
    is config-static and backend-INDEPENDENT so the TPU<->CPU crosscheck
    compares identical programs):

    * "sort" (= "auto"): stable 1-key sort + the fused Pallas run-reduce
      kernel (``_sort_segment_partials`` -> ops/pallas_runreduce.py) —
      K-independent, full-f32 sums, the measured-fastest path on v5e.
    * "mxu": dense one-hot-matmul histogram (K <= 2^19) — kept for
      comparison and as the engine behind ``merge_voxel_partials``;
      ``sum_precision`` chooses its bf16-split term count.
    * "scatter": dense [K, 4] scatter-add (K <= 2^23).

    Without bounds (or for lattices beyond 2^23 bins) a 3-key-sort
    fallback handles unbounded coordinates.  All paths produce ascending
    (ix, iy, iz) output order.
    """
    pts = cloud.points
    n = cloud.capacity
    valid = cloud.valid & jnp.all(jnp.isfinite(pts), axis=-1)

    # clamp BEFORE the int cast: f32->int32 overflow is implementation-
    # defined and a huge finite coordinate could otherwise collide with
    # the INT32_MAX empty-slot sentinel on the unbounded fallback (review
    # r5d finding #3); +-2^30 voxel indices bound any real deployment by
    # many orders of magnitude, and the packable paths clip to the
    # lattice dims anyway (identical results there)
    ijk = jnp.clip(
        jnp.floor(pts / jnp.float32(leaf_size)), -(2.0**30), 2.0**30
    ).astype(jnp.int32)
    spec = _pack_spec(bounds, leaf_size)
    packable = (
        spec is not None and spec[1][0] * spec[1][1] * spec[1][2] <= (1 << 23)
    )
    if packable and binning in ("auto", "sort") and n % 128 == 0:
        imin, dims = spec
        return _sort_segment_partials(
            pts, valid, ijk, imin, dims, leaf_size, capacity, order,
            payload_packing,
        )
    if payload_packing:
        raise ValueError(
            "voxel payload packing is only defined for the sort engine "
            "(packable bounds, capacity % 128 == 0)"
        )
    if binning == "sort":
        # An EXPLICIT engine request must not silently change engines:
        # the dense fallbacks alter sum-precision semantics (bf16 splits
        # under sum_precision='fast' instead of the sort engine's full-f32
        # sums).  Only binning='auto' may fall through.
        raise ValueError(
            "binning='sort' requires packable bounds and capacity % 128 == 0 "
            f"(got bounds={'packable' if packable else bounds!r}, n={n}); "
            "use binning='auto' to allow the dense-engine fallback"
        )
    if order == "morton":
        raise ValueError(
            "voxel_order='morton' requires the sort engine (packable bounds, "
            "capacity % 128 == 0, binning in ('auto', 'sort'))"
        )
    if binning not in ("auto", "mxu", "scatter"):
        raise ValueError(
            f"unknown voxel binning engine {binning!r} "
            "(choose 'auto', 'sort', 'mxu' or 'scatter')"
        )
    # The same explicit-request contract as binning='sort' above: 'mxu'
    # and 'scatter' must run the engine they name or raise — silently
    # substituting changes sum-precision semantics (review r5d finding #1).
    if binning in ("mxu", "scatter") and not packable:
        raise ValueError(
            f"binning={binning!r} requires packable bounds with <= 2^23 "
            f"bins (got bounds={bounds!r}); use binning='auto' to allow "
            "the unbounded 3-key-sort fallback"
        )
    if binning == "mxu":
        from .mxu_histogram import MXU_HISTOGRAM_MAX_BINS as _MXU_MAX

        K_req = spec[1][0] * spec[1][1] * spec[1][2]
        if K_req > _MXU_MAX:
            raise ValueError(
                f"binning='mxu' requires K <= {_MXU_MAX} one-hot bins "
                f"(lattice {spec[1]} has {K_req}); use 'scatter' or 'auto'"
            )
    if packable and binning in ("auto", "mxu", "scatter"):
        # Dense-bin paths: bin into the crop box's full voxel lattice
        # (MXU matmuls or one fused scatter-add), then block-compact the
        # occupied bins.  No sort at all.
        imin, dims = spec
        K = dims[0] * dims[1] * dims[2]
        ix = jnp.clip(ijk[:, 0] - imin[0], 0, dims[0] - 1)
        iy = jnp.clip(ijk[:, 1] - imin[1], 0, dims[1] - 1)
        iz = jnp.clip(ijk[:, 2] - imin[2], 0, dims[2] - 1)
        packed = jnp.where(valid, (ix * dims[1] + iy) * dims[2] + iz, K)
        w = valid.astype(jnp.float32)

        from .mxu_histogram import (
            MXU_HISTOGRAM_MAX_BINS,
            compact_occupied_blocks,
            weighted_histogram_blocks,
        )

        if binning != "scatter" and K <= MXU_HISTOGRAM_MAX_BINS:
            # MXU path: per-bin [offset_x, offset_y, offset_z, count] via
            # one-hot outer-product matmuls.  Offsets are voxel-corner
            # relative (|off| < leaf) so the two-term bf16 split carries
            # ~3e-7 absolute error — far below the f32 scatter's own noise.
            corner = ijk.astype(jnp.float32) * jnp.float32(leaf_size)
            off = jnp.where(valid[:, None], pts - corner, 0.0)
            upd = jnp.concatenate([off, w[:, None]], axis=-1)
            blocks, ha, hb = weighted_histogram_blocks(
                packed, upd, valid, K, exact_f32=(sum_precision == "exact")
            )  # channel-leading [4, A, B]
            # flatten to 128-lane blocks for the compaction: its lane-axis
            # cumsum/argmax passes scale with the block width, and 128 lanes
            # measured ~6x cheaper than the [A, 736]-shaped block form
            bins = blocks.reshape(4, ha * hb)
            kp = -(-(ha * hb) // 128) * 128
            if kp != ha * hb:
                bins = jnp.pad(bins, ((0, 0), (0, kp - ha * hb)))
            # padded bins (>= K) have zero counts and are never occupied
            occ2d = (bins[3] > 0.0).reshape(kp // 128, 128)
            corner_relative = True
        else:
            # scatter path: one fused [K, 4] scatter-add (serialized per
            # index on TPU, but N-bound — stays viable for huge bin counts
            # like the reference's 0.015 leaf over a 200-frame window).
            # Sums are corner-relative here too so the fused value gather's
            # bf16 split error stays ~count*leaf*2^-16 instead of scaling
            # with absolute coordinates.
            corner = ijk.astype(jnp.float32) * jnp.float32(leaf_size)
            off = jnp.where(valid[:, None], pts - corner, 0.0)
            upd = jnp.concatenate([off, w[:, None]], axis=-1)
            kp = -(-K // 128) * 128
            bins = jnp.zeros((kp, 4), jnp.float32).at[packed].add(
                upd, mode="drop"
            ).T  # -> channel-leading [4, Kp]
            occ2d = (bins[3] > 0.0).reshape(kp // 128, 128)
            corner_relative = True

        return _dense_bins_to_partials(
            bins, occ2d, dims, imin, capacity, leaf_size, corner_relative,
        )

    # Unbounded 3-key fallback.  Stable sort: with duplicate keys an
    # unstable permutation would make the payload order — and hence the
    # f32 sum association through _reduce_sorted_keys' scatter-add —
    # backend-dependent (review r5d finding #2; same rationale as the
    # merge sorts, ADVICE r4 #2).  The remaining caveat (duplicate-index
    # scatter-add accumulation order inside one backend's scatter
    # implementation) is documented at _reduce_sorted_keys.
    kx = jnp.where(valid, ijk[:, 0], _I32_MAX)
    ky = jnp.where(valid, ijk[:, 1], _I32_MAX)
    kz = jnp.where(valid, ijk[:, 2], _I32_MAX)
    kx, ky, kz, sx, sy, sz, sv = lax.sort(
        (kx, ky, kz, pts[:, 0], pts[:, 1], pts[:, 2], valid.astype(jnp.float32)),
        num_keys=3,
        is_stable=True,
    )
    sorted_pts = jnp.stack([sx, sy, sz], axis=-1) * sv[:, None]
    return _reduce_sorted_keys(kx, ky, kz, sorted_pts, sv, capacity)


def _pack_keys(keys, counts, spec):
    """Pack [cap, 3] (ix, iy, iz) partial-table keys into one int32 lattice
    key under ``spec = (imin, dims)``.  Real rows (counts > 0) map to
    ``(kx*dy + ky)*dz + kz`` after the imin shift + clip (a no-op for
    in-bounds keys); empty slots map to the sentinel ``K``."""
    imin, dims = spec
    K = dims[0] * dims[1] * dims[2]
    real = counts > 0.0
    kx = jnp.clip(keys[:, 0] - imin[0], 0, dims[0] - 1)
    ky = jnp.clip(keys[:, 1] - imin[1], 0, dims[1] - 1)
    kz = jnp.clip(keys[:, 2] - imin[2], 0, dims[2] - 1)
    return jnp.where(real, (kx * dims[1] + ky) * dims[2] + kz, K)


def _unpack_keys(packed, spec):
    """Packed lattice key (clipped to [0, K)) -> (lx, ly, lz) absolute
    lattice coordinates."""
    imin, dims = spec
    lx = packed // (dims[1] * dims[2]) + imin[0]
    lrem = packed % (dims[1] * dims[2])
    ly = lrem // dims[2] + imin[1]
    lz = lrem % dims[2] + imin[2]
    return lx, ly, lz


def _channelled_vals_to_partials(sv, num, K: int, spec, capacity: int) -> VoxelPartials:
    """Channel-leading [5, capacity] merged table (packed key, sum_xyz,
    count) + run count -> VoxelPartials.  The shared output formatting of
    the packed sort merge and the distributed key-range merge (one copy:
    a fix to the sentinel masking or the int decode cannot silently miss
    the twin — review r5c finding #3)."""
    slot = lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    out_valid = slot < jnp.minimum(num, capacity)
    slot_key = jnp.clip(sv[0].astype(jnp.int32), 0, K - 1)
    lx, ly, lz = _unpack_keys(slot_key, spec)
    key_cols = [jnp.where(out_valid, l, _I32_MAX) for l in (lx, ly, lz)]
    sum_cols = [jnp.where(out_valid, sv[ch], 0.0) for ch in (1, 2, 3)]
    return VoxelPartials(
        keys=jnp.stack(key_cols, axis=-1),
        sums=jnp.stack(sum_cols, axis=-1),
        counts=jnp.where(out_valid, sv[4], 0.0),
        num_voxels=num,
        overflow=num > capacity,
    )


def merge_voxel_partials_packed(
    packed, sums, counts, capacity: int, spec, leaf_size: float,
) -> VoxelPartials:
    """Merge concatenated partial tables keyed by PACKED int32 lattice keys.

    The point-sharded gather path packs each shard's keys locally
    (``_pack_keys``) BEFORE the all_gather, so the collective moves one
    int32 key + three f32 sums + one f32 count = 20 B/row instead of the
    28 B/row (ix, iy, iz)-triple form — ~30% less ICI traffic on the SP
    merge path (VERDICT r4 next #3) — and enters here.  Bitwise identical
    to ``merge_voxel_partials`` over the equivalent triple table: packing
    commutes with gathering (the same per-row integer math runs either
    side of the collective), and the dense path's voxel-corner derivation
    from the packed key reproduces the clipped key exactly for real rows.

    Engine choice by table size (measured rationale in the
    ``merge_voxel_partials`` docstring): large tables sort on the packed
    key + run-reduce; small tables dense-scatter into [K, 4] bins.
    """
    imin, dims = spec
    K = dims[0] * dims[1] * dims[2]
    real = counts > 0.0
    rows = packed.shape[0]
    if rows >= _SORT_MERGE_MIN_ROWS and rows % 128 == 0:
        # Large gathered tables (the fullscale SP path: 8 shards x
        # 262144 rows): the dense-bin scatter-add below serializes at
        # ~20 cycles/row — measured 93.8 ms/merge on v5e vs 12.9 for a
        # packed 1-key stable sort + the run-reduce machinery
        # (scripts/tpu_experiments66.py; the r2 "sort is 27 ms-class"
        # datum that motivated the scatter was overturned by the
        # sort-engine work — a 2M-row multi-operand sort is ~4.5 ms).
        # Counts ride the run-reduce's COUNT CHANNEL as a 4th value
        # buffer (integer-valued f32 < 2^24 — segmented sums exact in
        # any order), so one reduce pass covers all four channels.
        # Emits ascending lattice order like the dense path; f32
        # coordinate sums are FULL precision here (the dense path's
        # fast mode quantizes corner-relative updates to bf16 terms).
        from .pallas_runreduce import sorted_run_reduce

        sk, sx, sy, sz, scnt = lax.sort(
            (
                packed,
                sums[:, 0],
                sums[:, 1],
                sums[:, 2],
                counts,
            ),
            num_keys=1,
            # stable: duplicate keys are the whole point of a merge —
            # an unstable sort would make the payload permutation (and
            # hence the f32 sum association) backend-dependent (ADVICE
            # r4 #2).  Multi-operand stable sorts are near-free on TPU
            # (CLAUDE.md measured facts).
            is_stable=True,
        )
        vals, num = sorted_run_reduce(sk, (sx, sy, sz, scnt), K, capacity)
        # one read of the wide run-reduce buffer (transposed slot-decode)
        return _channelled_vals_to_partials(
            lax.optimization_barrier(vals.T), num, K, spec, capacity
        )
    # corner-relative partial sums: keeps the fused value gather's bf16
    # split error proportional to count*leaf rather than |coordinate|.
    # The corner derives from the packed key (identical integers to the
    # clipped triple keys for real rows; empty rows are masked below).
    lx, ly, lz = _unpack_keys(jnp.clip(packed, 0, K - 1), spec)
    corner = (
        jnp.stack([lx, ly, lz], axis=-1).astype(jnp.float32)
        * jnp.float32(leaf_size)
    )
    rel = sums - corner * counts[:, None]
    upd = jnp.concatenate(
        [
            jnp.where(real[:, None], rel, 0.0),
            jnp.where(real, counts, 0.0)[:, None],
        ],
        axis=-1,
    )
    kp = -(-K // 128) * 128
    bins = jnp.zeros((kp, 4), jnp.float32).at[packed].add(
        upd, mode="drop"
    ).T  # -> channel-leading [4, Kp]
    occ2d = (bins[3] > 0.0).reshape(kp // 128, 128)
    return _dense_bins_to_partials(
        bins, occ2d, dims, imin, capacity, leaf_size, corner_relative=True,
    )


def merge_voxel_partials(
    partials: VoxelPartials, capacity: int, bounds=None, leaf_size: float | None = None,
) -> VoxelPartials:
    """Merge concatenated partial tables (e.g. all_gather'ed shards).

    With ``bounds`` + ``leaf_size`` (the same crop box the shards binned
    against) the bounded (ix, iy, iz) keys pack into one int32 and the
    merge takes one of two paths by table size:

    * **large tables** (>= ``_SORT_MERGE_MIN_ROWS`` rows — the fullscale
      SP gather): packed 1-key stable sort + the run-reduce machinery,
      12.9 vs the scatter path's 93.8 ms at 2M rows on v5e
      (scripts/tpu_experiments66.py);
    * **small tables**: dense [K, 4] scatter-add (exact f32) + block
      stream compaction (~3 ms at 8 shards x 16k rows; the scatter
      serializes ~20 cycles/row, which is why large tables sort).

    Both run through :func:`merge_voxel_partials_packed` after packing the
    triple keys.  Without bounds, the 3-key sort fallback handles
    unbounded keys.
    """
    spec = _pack_spec(bounds, leaf_size) if leaf_size is not None else None
    if spec is not None and spec[1][0] * spec[1][1] * spec[1][2] <= (1 << 23):
        packed = _pack_keys(partials.keys, partials.counts, spec)
        return merge_voxel_partials_packed(
            packed, partials.sums, partials.counts, capacity, spec, leaf_size
        )

    kx, ky, kz, sx, sy, sz, cnt = lax.sort(
        (
            partials.keys[:, 0],
            partials.keys[:, 1],
            partials.keys[:, 2],
            partials.sums[:, 0],
            partials.sums[:, 1],
            partials.sums[:, 2],
            partials.counts,
        ),
        num_keys=3,
        # stable: deterministic duplicate-key payload order (ADVICE r4 #2
        # / review r5d finding #2 — same contract as every other merge sort)
        is_stable=True,
    )
    return _reduce_sorted_keys(kx, ky, kz, jnp.stack([sx, sy, sz], -1), cnt, capacity)


def finalize_voxels(partials: VoxelPartials) -> VoxelResult:
    """Partials -> centroid cloud.

    One reciprocal per voxel + three multiplies instead of three f32
    divides (measured 0.43 -> 0.01 ms/batch at the flagship slot shape,
    scripts/tpu_experiments29.py).  Both the divide and the multiplies
    are correctly-rounded IEEE ops evaluated in the same order on every
    backend, so TPU<->CPU bit-identity holds; the centroid differs from a
    direct sums/counts by <= 1 ulp (two roundings instead of one), inside
    every fidelity tolerance."""
    slot = lax.broadcasted_iota(jnp.int32, (partials.counts.shape[0], 1), 0)[:, 0]
    valid = slot < jnp.minimum(partials.num_voxels, partials.counts.shape[0])
    inv = 1.0 / jnp.maximum(partials.counts, 1.0)
    # channel-wise multiply + ONE final stack: slice-of-stack cancels with
    # the sort engine's per-channel sums, so no [capacity, 3] channel-minor
    # intermediate materializes between the kernel and the centroid cloud
    # (measured +3.4 ms/batch otherwise — scripts/tpu_experiments39.py).
    # Same per-element op and order as ``sums * inv[:, None]``: bitwise
    # identical on every backend.
    centroids = jnp.stack(
        [partials.sums[:, c] * inv for c in range(3)], axis=-1
    )
    return VoxelResult(
        cloud=Cloud(points=centroids, valid=valid),
        num_voxels=partials.num_voxels,
        overflow=partials.overflow,
    )


def voxel_downsample(
    cloud: Cloud, leaf_size: float, max_voxels: int, bounds=None,
    sum_precision: str = "exact", binning: str = "auto", order: str = "lattice",
    payload_packing: bool = False,
) -> VoxelResult:
    """Downsample to per-voxel centroids.  See module docstring."""
    return finalize_voxels(
        voxel_partials(
            cloud, leaf_size, max_voxels, bounds, sum_precision, binning, order,
            payload_packing,
        )
    )
