"""Pallas TPU kernel: fused weighted point binning (EXPERIMENTAL — not wired
into the pipeline).

Status: numerically CORRECT (integer counts verified exact; Mosaic dots do
accumulate in f32 with ``preferred_element_type``) but ~110 ms for
(N=131k, K=214k, C=4) vs ~3.6 ms for the XLA one-hot-matmul path
(ops/mxu_histogram.py).  Measured evidence: runtime is invariant to the
number of dots per step (8 small vs 1 fused), to chunk width, to transposed
layouts, pow2 divisors, and sublane alignment — and matches N*K*C ops at
VPU rate almost exactly.  Conclusion: Mosaic lowers these one-hot dots to
the VPU, not the MXU, on this toolchain.  The pipeline keeps the XLA paths;
revisit when Mosaic dot lowering can be steered onto the MXU.

Where Pallas DID pay off (round 2): workloads that are elementwise/VPU
anyway but whose XLA form materializes [T, C] tiles in HBM — the fused
cluster sweep kernel in ops/cluster.py (_pallas_sweep_jump) runs 3.3x the
XLA tiles.  Use that as the template, not this file.

The pipeline's two binning stages — the occupancy histogram
(obstacle_detection.cpp:195-215) and VoxelGrid binning (cpp:282-285) — are
scatter-adds, which XLA serializes on TPU (~20+ cycles/update: ~3 ms for a
131k cloud).  The MXU identity used in ops/mxu_histogram.py
(``bins = onehot_hi^T @ onehot_lo``) fixes the arithmetic but XLA
materializes the [N, A]/[N, B] one-hot factors in HBM, so the pure-XLA
version is bandwidth-bound.

This kernel keeps everything in VMEM: points stream through in chunks, the
one-hot tiles are built on the fly on the VPU, partial [A, B] products
accumulate on the MXU into a persistent VMEM scratch across the sequential
TPU grid, and the [C, A, B] result is written once at the last step.  HBM
traffic = the points themselves + the output — speed-of-light for this op.

Weights ride the hi factor in bf16.  Exactness: one-hot entries and split
weight terms are exactly representable in bf16 and the MXU accumulates in
float32, so counts are exact and weighted sums carry only the two-term
bf16-split error (~2^-16 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["binned_weighted_sum"]


def _kernel(ids_ref, w_ref, out_ref, acc, *, a, b, n_terms):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    ids = ids_ref[...]  # [chunk] int32; invalid rows carry a*b (oob)
    w = w_ref[...]  # [chunk, n_terms*C] float32 (pre-split terms)
    chunk = ids.shape[0]

    hi = ids // b
    lo = ids % b
    # Build the hi one-hot already TRANSPOSED ([A, chunk]) so the dot below
    # is the natural [M, K] @ [K, N] MXU form — contracting over the
    # sublane axis would make Mosaic insert per-chunk transposes.
    iota_a = lax.broadcasted_iota(jnp.int32, (a, chunk), 0)
    iota_b = lax.broadcasted_iota(jnp.int32, (chunk, b), 1)
    hi_ohT = hi[None, :] == iota_a  # bool [A, chunk]; oob id -> all-false col
    lo_oh = (lo[:, None] == iota_b).astype(jnp.bfloat16)  # [chunk, B]

    # ONE dot per grid step: all (term, channel) weighted one-hots stacked
    # along the sublane axis — per-dot fixed overhead in the Mosaic lowering
    # dominates when issuing many small dots per step.
    c_total = w.shape[-1]
    whiT_all = jnp.concatenate(
        [
            jnp.where(hi_ohT, w[:, c][None, :], 0.0).astype(jnp.bfloat16)
            for c in range(c_total)
        ],
        axis=0,
    )  # [c_total*A, chunk]
    part = jnp.dot(whiT_all, lo_oh, preferred_element_type=jnp.float32)
    part = part.reshape(n_terms, c_total // n_terms, a, b).sum(axis=0)
    acc[...] += part

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("k", "hi_size", "chunk", "exact_f32"))
def binned_weighted_sum(
    ids: jax.Array,
    weights: jax.Array,
    valid: jax.Array,
    k: int,
    hi_size: int = 128,
    chunk: int = 1024,
    exact_f32: bool = True,
) -> jax.Array:
    """``sums[j, c] = sum_{ids[i]==j, valid[i]} weights[i, c]`` -> [k, C] f32.

    ids: [N] int32 in [0, k); weights: [N, C] f32; N must divide by chunk.
    """
    n, c = weights.shape
    # power-of-two lo width: ids//b and ids%b become shift/mask — Mosaic has
    # no fast integer division, a general divisor serializes the whole chunk
    b = 1 << max(7, (k - 1).bit_length() - hi_size.bit_length() + 1)
    while hi_size * b < k:
        b <<= 1
    a = -(-k // b)
    a = -(-a // 8) * 8  # sublane-aligned hi width
    if n % chunk:
        raise ValueError(f"N={n} not divisible by chunk={chunk}")

    ids = jnp.where(valid, ids, a * b).astype(jnp.int32)
    w32 = jnp.where(valid[:, None], weights, 0.0)
    if exact_f32:
        w_hi = w32.astype(jnp.bfloat16).astype(jnp.float32)
        terms = jnp.concatenate([w_hi, w32 - w_hi], axis=-1)  # [N, 2C]
        n_terms = 2
    else:
        terms = w32
        n_terms = 1

    grid = (n // chunk,)
    out = pl.pallas_call(
        functools.partial(_kernel, a=a, b=b, n_terms=n_terms),
        out_shape=jax.ShapeDtypeStruct((c, a, b), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (chunk, n_terms * c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (c, a, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((c, a, b), jnp.float32)],
    )(ids, terms)

    return jnp.moveaxis(out, 0, -1).reshape(a * b, c)[:k]
