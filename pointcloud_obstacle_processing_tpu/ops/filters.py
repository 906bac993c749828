"""Mask-based point filters.

TPU-native replacements for the reference's reject-and-copy filters: instead
of producing a shorter cloud, filters update the validity mask over the same
fixed-capacity buffer (zero data movement; XLA fuses consecutive masks into
one elementwise pass).

* ``passthrough_mask`` — pcl::PassThrough equivalent.  The reference defines
  ``passthrough_filter`` (obstacle_detection.cpp:298-314) but never calls it
  (SURVEY.md §2: dead code); the actual cropping happens inside the fused
  occupancy loop.  Built anyway: it is part of the declared capability
  surface (``passthrough_filter_enable``, cpp:944).
* ``crop_box_mask`` — the fused NaN/bounds rejection from
  ``build_initial_occupancy_grid_dataset`` (cpp:197-200).
* ``euclidean_distance`` — ``calculate_distance`` (cpp:457-464, dead code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PipelineConfig

__all__ = ["passthrough_mask", "crop_box_mask", "euclidean_distance"]

_AXES = {"x": 0, "y": 1, "z": 2}


def passthrough_mask(points: jax.Array, axis: str, lower: float, upper: float) -> jax.Array:
    """Keep-mask for ``lower <= p[axis] <= upper`` (pcl::PassThrough semantics,
    inclusive limits; obstacle_detection.cpp:307-311)."""
    v = points[..., _AXES[axis]]
    return (v >= lower) & (v <= upper)


def crop_box_mask(points: jax.Array, config: PipelineConfig) -> jax.Array:
    """NaN + crop-box rejection (obstacle_detection.cpp:197-200).

    The reference tests ``pcl_isnan`` only on x; a NaN in y or z slips through
    its comparisons.  We reject any non-finite coordinate — strictly safer,
    and identical on real depth-camera data where NaN returns are all-NaN.
    """
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return (
        finite
        & (x >= config.x_min)
        & (x <= config.x_max)
        & (y >= config.y_min)
        & (y <= config.y_max)
        & (z >= config.z_min)
        & (z <= config.z_max)
    )


def euclidean_distance(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """3D distance helper (calculate_distance, obstacle_detection.cpp:457-464)."""
    return jnp.sqrt(jnp.sum((p2 - p1) ** 2, axis=-1))
