"""compact(): valid-first stable compaction (pcl::ExtractIndices semantics,
obstacle_detection.cpp:374,390-396) against a NumPy truth, on both the
fused-kernel path (n % 128 == 0; XLA fallback on CPU) and the rank-scatter
fallback (odd capacities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_obstacle_processing_tpu import Cloud
from pointcloud_obstacle_processing_tpu.ops.compaction import compact


@pytest.mark.parametrize(
    "n,cap",
    [
        (256, 128),  # kernel-path shapes
        (256, 64),  # capacity below the Pallas gate
        (1024, 256),
        (1024, 1024),  # full-capacity (no shrink)
        (300, 100),  # n % 128 != 0: rank-scatter fallback
    ],
)
def test_compact_matches_numpy(rng, n, cap):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    valid = rng.random(n) < 0.4
    cloud = Cloud(points=jnp.asarray(pts), valid=jnp.asarray(valid))
    r = jax.jit(lambda c: compact(c, cap))(cloud)

    src = np.flatnonzero(valid)[:cap]
    k = len(src)
    assert int(r.count) == k
    np.testing.assert_array_equal(np.asarray(r.cloud.points)[:k], pts[src])
    got_valid = np.asarray(r.cloud.valid)
    assert got_valid[:k].all() and not got_valid[k:].any()
    np.testing.assert_array_equal(np.asarray(r.source_index)[:k], src)
    assert bool(r.overflow) == (valid.sum() > cap)
    # masked tail is zeroed (downstream stages rely on parked-at-zero rows)
    np.testing.assert_array_equal(np.asarray(r.cloud.points)[k:], 0.0)


def test_compact_all_invalid(rng):
    cloud = Cloud(
        points=jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32)),
        valid=jnp.zeros(256, bool),
    )
    r = jax.jit(lambda c: compact(c, 128))(cloud)
    assert int(r.count) == 0
    assert not bool(r.overflow)
    assert not np.asarray(r.cloud.valid).any()
