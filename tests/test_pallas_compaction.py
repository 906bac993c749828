"""Pallas sequential-overwrite compaction kernel vs the exact-gather oracle.

The kernel (ops/pallas_compaction.py) runs in interpret mode on the CPU
test backend; its contract is EXACT equality with compact_occupied_blocks
+ per-channel gathers (the XLA fallback), which is itself checked against
a NumPy ground truth here.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_obstacle_processing_tpu.ops.pallas_compaction import (
    compact_and_gather_exact,
)


def _case(rng, a, density, cap, c=4):
    kp = a * 128
    counts = (rng.random(kp) < density) * rng.integers(1, 9, kp)
    bins = rng.standard_normal((c, kp)).astype(np.float32)
    bins[c - 1] = counts
    occ2d = (bins[c - 1] > 0).reshape(a, 128)
    return bins, occ2d


@pytest.mark.parametrize(
    "a,density,cap",
    [(20, 0.1, 256), (20, 0.9, 256), (37, 0.05, 128), (16, 0.5, 2048)],
)
def test_kernel_matches_ground_truth(a, density, cap):
    rng = np.random.default_rng(a * 1000 + cap)
    bins, occ2d = _case(rng, a, density, cap)
    loc_p, num_p, vals_p = compact_and_gather_exact(
        jnp.asarray(bins), jnp.asarray(occ2d), cap, use_pallas=True, interpret=True
    )
    loc_f, num_f, vals_f = compact_and_gather_exact(
        jnp.asarray(bins), jnp.asarray(occ2d), cap, use_pallas=False
    )
    true_num = int((bins[3] > 0).sum())
    assert int(num_p) == int(num_f) == true_num
    k = min(true_num, cap)
    gt = np.flatnonzero(bins[3] > 0)[:k]
    assert np.array_equal(np.asarray(loc_p)[:k], gt)
    assert np.array_equal(np.asarray(loc_f)[:k], gt)
    # EXACT value equality on both paths (bit-for-bit, no bf16 budget)
    assert np.array_equal(np.asarray(vals_p)[:k], bins.T[gt])
    assert np.array_equal(np.asarray(vals_f)[:k], bins.T[gt])


def test_kernel_vmap_batched_grid():
    """The custom_vmap rule routes jax.vmap onto the (B, steps) grid."""
    rng = np.random.default_rng(7)
    a, cap, B = 20, 256, 3
    kp = a * 128
    bins = rng.standard_normal((B, 4, kp)).astype(np.float32)
    bins[:, 3] = (rng.random((B, kp)) < 0.2) * rng.integers(1, 5, (B, kp))
    occ = (bins[:, 3] > 0).reshape(B, a, 128)
    locs, nums, valss = jax.jit(
        jax.vmap(
            lambda b, o: compact_and_gather_exact(
                b, o, cap, use_pallas=True, interpret=True
            )
        )
    )(jnp.asarray(bins), jnp.asarray(occ))
    for bi in range(B):
        gt = np.flatnonzero(bins[bi, 3] > 0)[:cap]
        k = len(gt)
        assert int(nums[bi]) == (bins[bi, 3] > 0).sum()
        assert np.array_equal(np.asarray(locs)[bi, :k], gt)
        assert np.array_equal(np.asarray(valss)[bi, :k], bins[bi].T[gt])


def test_overflow_truncates_ascending():
    """num > capacity: the first `capacity` occupied bins survive, in order."""
    rng = np.random.default_rng(11)
    bins, occ2d = _case(rng, 16, 0.9, 128)
    loc, num, vals = compact_and_gather_exact(
        jnp.asarray(bins), jnp.asarray(occ2d), 128, use_pallas=True, interpret=True
    )
    assert int(num) > 128
    gt = np.flatnonzero(bins[3] > 0)[:128]
    assert np.array_equal(np.asarray(loc), gt)
    assert np.array_equal(np.asarray(vals), bins.T[gt])
