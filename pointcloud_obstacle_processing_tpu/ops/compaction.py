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
        # Slot-centric compaction: the ascending source index of each output
        # slot via the block-structured stream compaction (comparison-sum +
        # one-hot matmul; see mxu_histogram.compact_occupied_blocks), then
        # one [capacity_out]-row point gather.  Replaces the N-wide scatter
        # (serialized ~20 cycles/update on TPU: ~3 ms at N=131k).
        from .mxu_histogram import compact_occupied_blocks

        loc, count = compact_occupied_blocks(
            cloud.valid.reshape(n // 128, 128), capacity_out
        )
        out_valid = (
            lax.broadcasted_iota(jnp.int32, (capacity_out, 1), 0)[:, 0]
            < jnp.minimum(count, capacity_out)
        )
        safe = jnp.where(out_valid, loc, 0)
        # CHANNEL-WISE 1-D gathers + one final stack: a 2-D ``points[safe]``
        # gather forces XLA to materialize/relayout the [N, 3] channel-minor
        # stack upstream (the voxel tail emits points as three fused [N]
        # channel vectors; the 2-D gather broke that fusion for ~5 ms/batch
        # in the pipeline context — scripts/tpu_experiments41/42.py).  The
        # per-slot values are identical either way.
        cols = [
            jnp.where(out_valid, cloud.points[:, c][safe], 0.0) for c in range(3)
        ]
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
