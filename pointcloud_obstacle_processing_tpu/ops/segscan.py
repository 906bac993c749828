"""Backend-deterministic segmented inclusive scan.

Building block for the sort-based voxel reduction (ops/voxel.py): after a
stable sort by voxel key, each voxel's members are a contiguous run, and
per-voxel sums are the values of a segmented inclusive sum-scan at the run
ends.

Why not ``jnp.cumsum`` / ``lax.associative_scan``: their f32 reduction
ORDER is backend-chosen (linear on CPU, log-tree on TPU), so sums differ in
ulps across backends and the TPU<->CPU full-pipeline crosscheck
(scripts/crosscheck_tpu_cpu.py) would lose bit-identity.  This
implementation writes the Hillis-Steele recurrence as EXPLICIT shift+add
steps — every addition is an elementwise op applied to identical operands
in an identical sequence on every backend, so results are bitwise
reproducible anywhere XLA runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segmented_inclusive_scan"]


def segmented_inclusive_scan(values: jax.Array, heads: jax.Array) -> jax.Array:
    """Inclusive sum-scan along the last axis, restarting at segment heads.

    values: [..., N] float32 (leading axes broadcast against ``heads``).
    heads:  [N] bool, True where a new segment begins.  Rows before the
        first head form an implicit leading segment.

    Returns [..., N]: ``out[..., i] = sum(values[..., j] for j in i's
    segment with j <= i)``, summed in the Hillis-Steele tree order
    (deterministic and identical on every backend; differs from a linear
    left-to-right sum by normal f32 rounding ulps).
    """
    n = values.shape[-1]
    v = values
    f = heads
    d = 1
    while d < n:
        # shift right by d: out-of-range sources contribute 0 and act as
        # segment boundaries (True flag)
        v_shift = jnp.concatenate(
            [jnp.zeros(v.shape[:-1] + (d,), v.dtype), v[..., :-d]], axis=-1
        )
        f_shift = jnp.concatenate(
            [jnp.ones((d,), bool), f[:-d]], axis=-1
        )
        v = v + jnp.where(f, 0.0, v_shift)
        f = f | f_shift
        d *= 2
    return v
