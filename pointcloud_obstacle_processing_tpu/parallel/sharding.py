"""Multi-scan batching and multi-chip sharding.

The reference's "distribution" layer is the ROS graph: one OS process per
node, TCPROS pub/sub between them, one scan processed at a time (queue
size 1, obstacle_detection.cpp:1001; single-threaded ``ros::spin``, :1014 —
SURVEY.md §2.3).  The TPU-native equivalents:

* **Scan batching (DP)** — ``vmap`` over a leading scan axis: many scans (or
  sensor heads) per chip in one XLA program.  This is the north-star batching
  axis (BASELINE.json config #5).
* **Chip scale-out (DP over mesh)** — the batch axis sharded over a
  ``jax.sharding.Mesh`` ``data`` axis.  Scans are independent, so XLA inserts
  zero collectives; results come back sharded the same way.
* **Point sharding (SP)** — one scan's points split over a ``points`` mesh
  axis via ``shard_map`` for accumulation windows too big for one chip's HBM
  (200 Kinect frames ≈ 100M points, SURVEY.md §5 long-context note).  The
  heavy per-point stages run shard-local; the communication is
  - one ``psum`` of the [H, W] occupancy histogram (a few 10s of KB),
  - one ``all_gather`` of the per-shard voxel partial tables (key/sum/count,
    ~0.5 MB per shard) which are merged into the deduplicated voxel cloud
    replicated on every shard, and
  - (``shard_post_voxel``, default on) per-sweep/per-stage ``all_gather``s
    of [N]-sized result vectors for the two O(N*W) post-voxel stages — the
    banded kNN and the cluster sweeps — whose QUERY TILES are split across
    the ``points`` axis against the replicated column table (bitwise
    identical to the replicated form; the SURVEY §2.3 ring-style sharded
    cluster-merge, realized as tile-range sharding since every shard
    already holds the merged cloud).  The cheap O(N) glue (RANSAC ~4% of
    the fullscale window, compaction, centroids, shadows, grid) stays
    replicated.  Collectives ride ICI; nothing touches the host.

``dp_sp_pipeline`` composes both over a 2-D ('data', 'points') mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..ops.filters import crop_box_mask
from ..ops.transforms import RigidTransform
from ..ops.voxel import finalize_voxels, merge_voxel_partials, voxel_partials
from ..pipeline import _post_voxel, process_scan
from ..types import Cloud, PipelineResult

__all__ = [
    "make_mesh",
    "batched_pipeline",
    "data_parallel_pipeline",
    "process_scan_point_sharded",
    "dp_sp_pipeline",
]


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Build a Mesh from {axis_name: size}; total must match device count."""
    devices = devices if devices is not None else jax.devices()
    total = int(np.prod(list(axis_sizes.values())))
    if total != len(devices):
        raise ValueError(f"mesh wants {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes.values()))
    return Mesh(dev_array, tuple(axis_sizes.keys()))


def batched_pipeline(config: PipelineConfig):
    """vmap over a leading scan axis: Cloud[B, N], keys[B, 2] -> results[B]."""

    def fn(clouds: Cloud, keys: jax.Array, sensor_pose: RigidTransform | None = None):
        if sensor_pose is None:
            return jax.vmap(lambda c, k: process_scan(c, k, config))(clouds, keys)
        return jax.vmap(lambda c, k, t: process_scan(c, k, config, t))(
            clouds, keys, sensor_pose
        )

    return jax.jit(fn)


def data_parallel_pipeline(config: PipelineConfig, mesh: Mesh, data_axis: str = "data"):
    """Batch axis sharded over the mesh's ``data`` axis.

    Scans are independent: XLA compiles this to fully-local per-chip programs
    (no collectives), each chip processing B / n_data scans.
    """
    data_spec = P(data_axis)

    def fn(clouds: Cloud, keys: jax.Array):
        clouds = jax.lax.with_sharding_constraint(
            clouds,
            Cloud(
                points=NamedSharding(mesh, P(data_axis, None, None)),
                valid=NamedSharding(mesh, P(data_axis, None)),
            ),
        )
        keys = jax.lax.with_sharding_constraint(keys, NamedSharding(mesh, data_spec))
        return jax.vmap(lambda c, k: process_scan(c, k, config))(clouds, keys)

    return jax.jit(fn)


def _distributed_merge(
    parts, config: PipelineConfig, axis_name: str, num_shards: int, spec=None
):
    """Key-range distributed merge of the per-shard voxel partial tables.

    The replicated sort merge is the SP window's dominant term (~8.5 ms
    at the fullscale gather, scripts/tpu_experiments66.py / the
    PERFORMANCE.md projection table).  This distributes it: shard s owns
    packed-key range [s*K/S, (s+1)*K/S).  Each shard's partial table is
    ALREADY ascending in lattice key (every voxel_partials engine emits
    that order), so range splits are ``searchsorted`` boundaries; an
    ``all_to_all`` of fixed-capacity range chunks routes every row to its
    owner, which sorts + run-reduces its range locally (S*chunk rows ~
    2*max_voxels), and one ``all_gather`` of the per-range merged tables
    re-assembles the full voxel cloud replicated on every shard — in
    ascending lattice order, because ranges are written back in key
    order at exclusive offsets (ascending sequential-overwrite, the
    compaction kernels' idiom in XLA form).

    Capacities: each (shard, range) chunk is ``2*max_voxels/S`` rows and
    each range's merged output ``2*max_voxels/S`` voxels (the arena
    spreads keys near-uniformly over x-slabs, so real occupancy is far
    below both); a chunk or range overflow raises the returned flag —
    observable truncation like every other capacity knob.

    Values: in the NO-overflow regime the per-range sort+reduce runs the
    same machinery as the replicated merge over the same runs — keys,
    counts and num_voxels are exact matches; f32 coordinate sums
    re-associate (different window boundaries), the same class of
    deviation the SP path already carries vs single-chip.  UNDER
    overflow the semantics differ: the replicated merge reports the raw
    run count in ``num_voxels`` while this path reports the clamped
    number of rows actually present (range truncation drops runs before
    they can be counted) — both raise ``overflow``.

    Layout: every collective and the write-back run CHANNEL-LEADING
    ([5, ...]) — a channel-minor [rows, 5] form would lane-pad 5 -> 128
    and move ~25x the bytes (CLAUDE.md layout facts; review r5c finding
    #1).  The packed keys ride the stacked f32 collective exactly
    (K <= 2^23 < 2^24, the ``packable`` guard).
    """
    from ..ops.pallas_runreduce import sorted_run_reduce
    from ..ops.voxel import (
        _channelled_vals_to_partials,
        _pack_keys,
        _pack_spec,
    )

    S = num_shards
    cap = config.max_voxels
    leaf = config.downsample_leaf_size
    if spec is None:
        bounds = (
            (config.x_min, config.y_min, config.z_min),
            (config.x_max, config.y_max, config.z_max),
        )
        spec = _pack_spec(bounds, leaf)
    dims = spec[1]
    K = dims[0] * dims[1] * dims[2]
    kstep = -(-K // S)
    chunk_cap = max(128, (2 * cap // S) // 128 * 128)
    range_cap = chunk_cap

    packed = _pack_keys(parts.keys, parts.counts, spec)

    # boundaries clamped to K: kstep rounds up, so S*kstep can exceed K —
    # unclamped, the last range would swallow every SENTINEL row (packed
    # == K) and spuriously overflow its chunk
    bkeys = [min(r * kstep, K) for r in range(S + 1)]
    b = jnp.searchsorted(packed, jnp.asarray(bkeys, jnp.int32))
    chunk_overflow = jnp.any((b[1:] - b[:-1]) > chunk_cap)

    payloads = (
        packed,
        parts.sums[:, 0],
        parts.sums[:, 1],
        parts.sums[:, 2],
        parts.counts,
    )

    def build_chunk(r):
        start = jnp.minimum(b[r], cap - chunk_cap)
        rows = [
            lax.dynamic_slice_in_dim(a, start, chunk_cap) for a in payloads
        ]
        in_range = (rows[0] >= bkeys[r]) & (rows[0] < bkeys[r + 1])
        rows[0] = jnp.where(in_range, rows[0], K)
        rows[1:] = [jnp.where(in_range, a, 0.0) for a in rows[1:]]
        return rows

    chunks = [build_chunk(r) for r in range(S)]
    # ONE channel-leading [5, S, chunk_cap] f32 collective instead of five
    # [S, chunk_cap] calls: the int32 packed keys cast to f32 EXACTLY
    # (values <= K <= 2^23), and the minor two dims [S, chunk_cap] tile
    # cleanly (chunk_cap % 128 == 0) — no lane padding anywhere
    send = jnp.stack(
        [
            jnp.stack([chunks[r][c] for r in range(S)]).astype(jnp.float32)
            for c in range(5)
        ]
    )  # [5, S, chunk_cap]; row (c, r) bound for shard r
    recv = lax.all_to_all(
        send, axis_name, split_axis=1, concat_axis=1, tiled=False
    )  # [5, S, chunk_cap]: every shard's chunk for MY range

    flat = [recv[c].reshape(S * chunk_cap) for c in range(5)]
    # stable: the all_to_all stacks source shards in axis order, so a
    # stable sort gives a deterministic duplicate-key payload permutation
    # (cross-backend reproducible sums; same rationale as the replicated
    # large-table merge, ADVICE r4 #2).  Sorting the f32-encoded integer
    # keys orders identically to the int32 sort (exact values <= 2^23).
    sk_f, sx, sy, sz, sc = lax.sort(tuple(flat), num_keys=1, is_stable=True)
    sk = sk_f.astype(jnp.int32)  # exact round-trip
    vals_r, num_r = sorted_run_reduce(sk, (sx, sy, sz, sc), K, range_cap)
    range_overflow = num_r > range_cap

    # channel-leading BEFORE the gather: [range_cap, 5] would lane-pad
    vals_rt = lax.optimization_barrier(vals_r.T)  # [5, range_cap]
    vals_all = lax.all_gather(vals_rt, axis_name)  # [S, 5, range_cap]
    num_all = jnp.minimum(lax.all_gather(num_r, axis_name), range_cap)  # [S]
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(num_all)]
    )[:S]

    # ascending-offset write-back: range r's garbage tail (rows >= num_r)
    # is overwritten by range r+1's rows, which land at exactly
    # offs[r] + num_all[r] — the sequential-overwrite contract
    buf = jnp.zeros((5, cap + range_cap), jnp.float32)

    def body(r, buf):
        rows = lax.dynamic_slice_in_dim(vals_all, r, 1, axis=0)[0]  # [5, range_cap]
        o = jnp.minimum(offs[r], cap)
        return lax.dynamic_update_slice(buf, rows, (0, o))

    buf = lax.fori_loop(0, S, body, buf)
    num = jnp.sum(num_all)  # rows actually present (range-clamped)

    merged = _channelled_vals_to_partials(buf[:, :cap], num, K, spec, cap)
    overflow = (
        merged.overflow
        | (lax.psum(chunk_overflow.astype(jnp.int32), axis_name) > 0)
        | (lax.psum(range_overflow.astype(jnp.int32), axis_name) > 0)
    )
    return merged._replace(
        num_voxels=jnp.minimum(num, cap), overflow=overflow
    )


def process_scan_point_sharded(
    cloud_shard: Cloud,
    key: jax.Array,
    config: PipelineConfig,
    world_from_sensor: RigidTransform,
    axis_name: str = "points",
    num_shards: int = 1,
    shard_post_voxel: bool = True,
    distribute_merge: bool | None = None,
) -> PipelineResult:
    """Pipeline body over a point shard; call inside shard_map.

    ``cloud_shard`` holds this chip's [max_points / n_shards] slice.  The
    result is replicated across the ``points`` axis.

    ``shard_post_voxel`` (with ``num_shards`` = the mesh axis size, a
    static int): also distribute the two O(N*W) post-voxel stages — the
    banded kNN and the cluster sweeps — across the ``points`` axis by
    query-tile ranges (all_gather re-assembly; bitwise identical to the
    replicated form — see pipeline._post_voxel).  Without it, stages 3-8
    run replicated on every shard (the pre-round-4 behavior: multi-chip
    bought capacity, not speed — VERDICT r3 missing #1).

    ``distribute_merge``: distribute the voxel-table merge by key range
    too (``_distributed_merge``) — keys/counts/num exact vs the
    replicated merge in the no-overflow regime, f32 sums re-associate.
    Default ``None`` = ON in the measured-win regime (graduated round 5
    after the chunk/range overflow contract tests landed — VERDICT r4
    next #1): >2 shards AND a gathered table at or above the sort-merge
    threshold (the fullscale 2M-row case; at S=2 the range sort covers
    the whole table and small tables dense-scatter faster replicated).
    Pass ``True``/``False`` to force either path.  Regardless of the
    flag, falls back to replicated when the lattice is unpackable,
    ``max_voxels`` doesn't tile by 128, or the per-range chunk capacity
    would underflow 128 rows — the conditions under which the key-range
    chunks can't be laid out.
    """
    if config.voxel_order != "lattice":
        # merge_voxel_partials re-orders through the dense packed-key bins,
        # which emit ascending LATTICE order — silently ignoring a morton
        # request would diverge from the single-chip output ordering.
        raise ValueError(
            "the point-sharded path only supports voxel_order='lattice' "
            f"(got {config.voxel_order!r}: the sort-free shard merge emits "
            "lattice order)"
        )
    pts = cloud_shard.points
    n_in_local = cloud_shard.count()
    n_in = lax.psum(n_in_local, axis_name)

    # ---- stage 1, shard-local histogram + global psum ----------------------
    from ..ops.mxu_histogram import histogram2d_mxu
    from ..ops.occupancy import grid_cell_xy

    in_box = cloud_shard.valid & crop_box_mask(pts, config)
    col, row = grid_cell_xy(pts, config)
    counts_local = histogram2d_mxu(
        row, col, in_box, config.grid_height, config.grid_width
    )
    counts = lax.psum(counts_local, axis_name)
    row_averages = (jnp.sum(counts, axis=1) // config.grid_width).astype(jnp.int32)
    threshold = row_averages.astype(jnp.float32) * jnp.float32(1.0 - config.dev_percent)
    hole_grid = jnp.where(
        counts.astype(jnp.float32) < threshold[:, None], jnp.int8(100), jnp.int8(0)
    )
    n_cropped = lax.psum(jnp.sum(in_box.astype(jnp.int32)), axis_name)

    # ---- stage 2, shard-local voxel partials + all_gather + merge ----------
    # Each shard voxelizes its local slice into a [max_voxels] partial table;
    # the gathered tables are merged (same-key partials summed) into the
    # deduplicated global voxel cloud, replicated on every shard.
    from ..ops.voxel import VoxelPartials

    bounds = (
        (config.x_min, config.y_min, config.z_min),
        (config.x_max, config.y_max, config.z_max),
    )
    parts = voxel_partials(
        Cloud(points=pts, valid=in_box),
        config.downsample_leaf_size,
        config.max_voxels,
        bounds,
        config.voxel_sum_precision,
        config.voxel_binning,
        config.voxel_order,  # 'lattice' (guarded above): shards and merge agree
        config.voxel_payload_packing,  # quantizes shard partials identically
    )
    from ..ops.voxel import (
        _pack_keys,
        _pack_spec,
        merge_voxel_partials_packed,
    )

    from ..ops.voxel import _SORT_MERGE_MIN_ROWS

    spec = _pack_spec(bounds, config.downsample_leaf_size)
    packable = (
        spec is not None and spec[1][0] * spec[1][1] * spec[1][2] <= (1 << 23)
    )
    if distribute_merge is None:
        # Default ON only in the MEASURED-win regime (review r5c finding
        # #2): more than 2 shards (at S=2 each range sort covers the whole
        # gathered table — zero work saved for three extra collectives)
        # and a gathered table big enough that the replicated path would
        # SORT it (below _SORT_MERGE_MIN_ROWS the replicated merge
        # dense-scatters in ~3 ms-class time and the distributed form is
        # unmeasured).  Pass distribute_merge=True to force it elsewhere.
        distribute_merge = (
            num_shards > 2
            and num_shards * config.max_voxels >= _SORT_MERGE_MIN_ROWS
        )
    use_dist = (
        distribute_merge
        and num_shards > 1
        and packable
        and config.max_voxels % 128 == 0
        and (2 * config.max_voxels // num_shards) >= 128
    )
    if use_dist:
        # key-range distributed merge: all_to_all range chunks, per-range
        # sort+reduce, all_gather of merged range tables (~8.5 -> ~2-3 ms
        # projected at fullscale; see _distributed_merge)
        merged = _distributed_merge(parts, config, axis_name, num_shards, spec)
    elif packable:
        # replicated merge over the slim gathered table: keys pack
        # shard-locally BEFORE the all_gather — 1 int32 key + 4 f32
        # payloads = 20 B/row vs the 28 B/row triple form, ~30% less ICI
        # traffic (VERDICT r4 next #3); bitwise identical to gathering
        # the triple (packing commutes with the gather)
        merged = merge_voxel_partials_packed(
            lax.all_gather(
                _pack_keys(parts.keys, parts.counts, spec), axis_name, tiled=True
            ),
            lax.all_gather(parts.sums, axis_name, tiled=True),
            lax.all_gather(parts.counts, axis_name, tiled=True),
            config.max_voxels,
            spec,
            config.downsample_leaf_size,
        )
    else:
        merged = merge_voxel_partials(
            VoxelPartials(
                keys=lax.all_gather(parts.keys, axis_name, tiled=True),
                sums=lax.all_gather(parts.sums, axis_name, tiled=True),
                counts=lax.all_gather(parts.counts, axis_name, tiled=True),
                num_voxels=parts.num_voxels,  # unused by merge
                overflow=parts.overflow,  # unused by merge
            ),
            config.max_voxels,
            # unbounded keys => 3-key sort fallback (see
            # merge_voxel_partials docstring)
            bounds=bounds,
            leaf_size=config.downsample_leaf_size,
        )
    vox = finalize_voxels(merged)

    # ---- stages 3-8 on the merged voxel cloud: the O(N*W) stages (banded
    # kNN + cluster sweeps) distribute over the points axis when
    # shard_post_voxel is set; the O(N) glue stays replicated -------------
    return _post_voxel(
        vox.cloud,
        vox.num_voxels,
        hole_grid,
        n_in,
        n_cropped,
        key,
        config,
        world_from_sensor,
        # a shard-local table overflow drops voxels before the merge ever
        # sees them, so OR the pre-merge flags across shards too
        voxel_overflow=vox.overflow
        | (lax.psum(parts.overflow.astype(jnp.int32), axis_name) > 0),
        shard_axis=axis_name if shard_post_voxel and num_shards > 1 else None,
        num_shards=num_shards,
        point_sharded=True,  # dead-tile skip off even when unsharded post-voxel
    )


def dp_sp_pipeline(
    config: PipelineConfig,
    mesh: Mesh,
    data_axis: str = "data",
    points_axis: str = "points",
    shard_post_voxel: bool = True,
    distribute_merge: bool | None = None,
):
    """Scans over 'data', each scan's points over 'points' (2-D mesh).

    Input: Cloud with points [B, N, 3]; keys [B, 2]; a single sensor pose
    shared by the batch (or None).  Per-scan results are replicated over the
    'points' axis and sharded over 'data'.  ``shard_post_voxel`` distributes
    the post-voxel O(N*W) stages over 'points' too (bitwise identical to
    the replicated form); ``distribute_merge=None`` defaults the key-range
    distributed voxel merge ON in its measured-win regime (>2 'points'
    shards and a sort-scale gathered table — see process_scan_point_sharded
    for the exact gate and fallback conditions).
    """
    n_points_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[points_axis]

    def per_scan(cloud_shard, k, pose):
        return process_scan_point_sharded(
            cloud_shard, k, config, pose, axis_name=points_axis,
            num_shards=n_points_shards, shard_post_voxel=shard_post_voxel,
            distribute_merge=distribute_merge,
        )

    def local(clouds, keys, pose):
        return jax.vmap(lambda c, k: per_scan(c, k, pose))(clouds, keys)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            Cloud(points=P(data_axis, points_axis, None), valid=P(data_axis, points_axis)),
            P(data_axis),
            P(),  # sensor pose replicated
        ),
        out_specs=P(data_axis),
        check_vma=False,
    )

    def fn(clouds: Cloud, keys: jax.Array, sensor_pose: RigidTransform | None = None):
        if sensor_pose is None:
            sensor_pose = RigidTransform.identity()
        return sharded(clouds, keys, sensor_pose)

    return jax.jit(fn)
