"""Backend-deterministic segmented inclusive scan.

Building block of the sort-based voxel reduction until round 3: after a
stable sort by voxel key, each voxel's members are a contiguous run, and
per-voxel sums are the values of a segmented inclusive sum-scan at the run
ends.  The default voxel path now uses the FUSED windowed form
(ops/pallas_runreduce.py — same shift+add recurrence per window joined by
carry adds); this full-width standalone op is kept as the tested,
generally-useful primitive (tests/test_segscan.py) for any consumer
needing a global segmented scan.

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
    """VMEM form: the shift-step chain at N=131k moves ~4 MB x 2 x steps
    through HBM when XLA materializes every shifted concat (~3.8
    ms/batch-of-32 measured on v5e); keeping blocks resident in VMEM
    reduces traffic to one read + one write (~2.6 ms/batch).  The grid
    iterates CHANNELS so each step holds only [1, N] blocks — a whole
    [C, N] block doubles up under Mosaic's pipelining and blows the 16 MB
    scoped-VMEM budget at larger vmap batches."""
    c, n = values.shape

    def kernel(v_ref, f_ref, out_ref):
        out_ref[:] = _scan_steps(v_ref[:], f_ref[:], n)

    # [C, 1, N] so each grid step's block is (1, 1, N): the trailing two
    # dims then EQUAL the array dims, satisfying Mosaic's block rules
    out = pl.pallas_call(
        kernel,
        grid=(c,),
        out_shape=jax.ShapeDtypeStruct((c, 1, n), values.dtype),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(
        values[:, None, :],
        jnp.broadcast_to(heads[None, None, :], (1, 1, n)).astype(jnp.int32),
    )
    return out[:, 0, :]


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
        # per-channel [1, N] block + flags + shift temps, double-buffered,
        # must sit in the ~16 MB scoped-VMEM budget
        and n * 4 * 10 < 12 * 1024 * 1024
        and jax.default_backend() == "tpu"
        and pl is not None
    )
    if vmem_ok:
        return _segscan_pallas(values, heads)
    return _scan_steps(values, heads.astype(jnp.int32), n)
