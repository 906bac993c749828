"""Mask -> dense compaction utilities.

PCL's ``pcl::ExtractIndices`` (obstacle_detection.cpp:374,390-396) splits a
cloud by an index set into new, shorter clouds.  On TPU, shapes are static:
"extraction" is a mask update, and when a downstream stage benefits from a
denser buffer (e.g. clustering over the small post-plane cloud) we compact
valid points to the front with one stable sort — a gather-friendly pattern
that beats random scatters on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cloud

__all__ = ["compact", "extract_indices", "CompactResult"]


class CompactResult(NamedTuple):
    cloud: Cloud  # [capacity_out] valid-first compaction
    count: jax.Array  # [] int32 number of valid points moved
    source_index: jax.Array  # [capacity_out] int32 index into the input buffer
    overflow: jax.Array  # [] bool: valid points were dropped


def compact(cloud: Cloud, capacity_out: int | None = None) -> CompactResult:
    """Move valid points to the front; optionally shrink to capacity_out.

    Stable: preserves relative input order, matching PCL's index-order
    extraction semantics.
    """
    n = cloud.capacity
    capacity_out = capacity_out or n
    if n % 128 == 0:
        # Fused compaction + exact value gather: the same sequential-
        # overwrite DMA kernel that compacts the voxel table
        # (ops/pallas_compaction.py) — per-slot source index AND the three
        # point channels in one pass.  On TPU this replaces the serialized
        # per-row channel gathers (~20 cycles/row: ~1.9 ms of the fullscale
        # window's compact+cluster stage was this op); the XLA/CPU path
        # inside compact_and_gather_exact is the previous
        # compact_occupied_blocks + channel-wise 1-D gather formulation,
        # and the kernel's one-live-lane select-sums are EXACT gathers, so
        # outputs are bit-identical across backends (tests/test_compaction).
        from .pallas_compaction import compact_and_gather_exact

        bins = jnp.stack(
            [
                cloud.points[:, 0],
                cloud.points[:, 1],
                cloud.points[:, 2],
                cloud.valid.astype(jnp.float32),  # count channel (occupancy)
            ],
            axis=0,
        )
        loc, count, vals = compact_and_gather_exact(
            bins, cloud.valid.reshape(n // 128, 128), capacity_out
        )
        out_valid = (
            lax.broadcasted_iota(jnp.int32, (capacity_out, 1), 0)[:, 0]
            < jnp.minimum(count, capacity_out)
        )
        # channel-wise mask + one final stack (keeps the voxel tail's three
        # fused [N] channel vectors fusable — scripts/tpu_experiments41/42)
        cols = [jnp.where(out_valid, vals[:, c], 0.0) for c in range(3)]
        source_index = jnp.where(out_valid, loc, 0)
        return CompactResult(
            cloud=Cloud(
                points=jnp.stack(cols, axis=-1),
                valid=out_valid,
            ),
            count=jnp.minimum(count, capacity_out),
            source_index=source_index,
            overflow=count > capacity_out,
        )

    # fallback (non-128-multiple capacities): rank scatter
    pos = jnp.cumsum(cloud.valid.astype(jnp.int32)) - 1
    ids = jnp.where(cloud.valid & (pos < capacity_out), pos, capacity_out)
    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    out_pts = jnp.zeros((capacity_out, 3), jnp.float32).at[ids].set(
        cloud.points, mode="drop"
    )
    source_index = jnp.zeros((capacity_out,), jnp.int32).at[ids].set(idx, mode="drop")
    count = jnp.sum(cloud.valid.astype(jnp.int32))
    out_valid = lax.broadcasted_iota(jnp.int32, (capacity_out, 1), 0)[:, 0] < count
    return CompactResult(
        cloud=Cloud(points=out_pts, valid=out_valid),
        count=jnp.minimum(count, capacity_out),
        source_index=source_index,
        overflow=count > capacity_out,
    )


def extract_indices(cloud: Cloud, keep: jax.Array, negative: bool = False) -> Cloud:
    """pcl::ExtractIndices as a mask op (setNegative -> ``negative=True``)."""
    keep = jnp.logical_xor(keep, negative)
    return Cloud(points=cloud.points, valid=cloud.valid & keep)
