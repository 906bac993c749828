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

try:  # pallas kept lazy-safe for backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _scan_steps(v, f, n: int):
    """The shared Hillis-Steele step sequence.  Only adds, selects, and
    ors — no multiplies, so neither XLA fusion nor Mosaic FMA contraction
    can perturb the arithmetic: outputs are bitwise identical wherever
    these ops run.  ``f`` is int32 0/1 (Mosaic cannot shift/concat i1
    vectors)."""
    d = 1
    while d < n:
        # shift right by d: out-of-range sources contribute 0 and act as
        # segment boundaries (flag 1)
        v_shift = jnp.concatenate(
            [jnp.zeros(v.shape[:-1] + (d,), v.dtype), v[..., :-d]], axis=-1
        )
        f_shift = jnp.concatenate(
            [jnp.ones(f.shape[:-1] + (d,), f.dtype), f[..., :-d]], axis=-1
        )
        v = v + jnp.where(f != 0, 0.0, v_shift)
        f = f | f_shift
        d *= 2
    return v


def _segscan_pallas(values: jax.Array, heads: jax.Array) -> jax.Array:
    """VMEM form: the 17-step chain at N=131k moves ~4 MB x 2 x steps
    through HBM when XLA materializes every shifted concat (~7.7
    ms/batch-of-32 measured on v5e); keeping the [C, N] block resident in
    VMEM reduces traffic to one read + one write (~1 ms/batch)."""
    c, n = values.shape

    def kernel(v_ref, f_ref, out_ref):
        out_ref[:] = _scan_steps(v_ref[:], f_ref[:], n)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, n), values.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(values, jnp.broadcast_to(heads[None, :], (1, n)).astype(jnp.int32))


def segmented_inclusive_scan(values: jax.Array, heads: jax.Array) -> jax.Array:
    """Inclusive sum-scan along the last axis, restarting at segment heads.

    values: [C, N] float32 (a leading channel axis; [..., N] accepted on
        the XLA path).
    heads:  [N] bool, True where a new segment begins.  Rows before the
        first head form an implicit leading segment.

    Returns [..., N]: ``out[..., i] = sum(values[..., j] for j in i's
    segment with j <= i)``, summed in the Hillis-Steele tree order
    (deterministic and identical on every backend; differs from a linear
    left-to-right sum by normal f32 rounding ulps).  On TPU the steps run
    inside one Pallas VMEM kernel when the block fits; the XLA form runs
    the IDENTICAL step sequence, so results stay bitwise equal.
    """
    n = values.shape[-1]
    vmem_ok = (
        values.ndim == 2
        and n % 128 == 0
        # value block + flag temps + shift temps must sit in ~16 MB VMEM
        and (values.shape[0] + 2) * n * 4 * 3 < 12 * 1024 * 1024
        and jax.default_backend() == "tpu"
        and pl is not None
    )
    if vmem_ok:
        return _segscan_pallas(values, heads)
    return _scan_steps(values, heads.astype(jnp.int32), n)
