"""Rigid transforms (tf2 / pcl_ros::transformPointCloud equivalent).

The reference consults the tf2 transform bus for the static
``world <-> kinect2_link`` transform and applies it with
``pcl_ros::transformPointCloud`` (obstacle_detection.cpp:570-578, :592-604,
:634-642, :692-696).  Here a transform is a small pytree (ROS-convention
xyzw quaternion + translation) applied as fused vector math — one rotate +
add over the whole padded cloud, which XLA fuses into neighboring stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["RigidTransform", "quat_rotate", "quat_to_matrix"]


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """xyzw quaternion -> 3x3 rotation matrix (tf::Quaternion convention)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v[..., 3] by xyzw quaternion q[3] (no matmul needed)."""
    u = q[..., :3]
    w = q[..., 3:]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


class RigidTransform(struct.PyTreeNode):
    """SE(3) transform: p' = R(q) p + t.

    Equivalent of ``geometry_msgs::TransformStamped`` payload (frame metadata
    is the host driver's concern, not device state).
    """

    quat_xyzw: jax.Array  # [4] float32
    translation: jax.Array  # [3] float32

    @classmethod
    def identity(cls) -> "RigidTransform":
        return cls(
            quat_xyzw=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
            translation=jnp.zeros((3,), jnp.float32),
        )

    @classmethod
    def from_quat_trans(cls, quat_xyzw, translation) -> "RigidTransform":
        return cls(
            quat_xyzw=jnp.asarray(quat_xyzw, jnp.float32),
            translation=jnp.asarray(translation, jnp.float32),
        )

    @classmethod
    def from_matrix(cls, m: jax.Array) -> "RigidTransform":
        """From a 4x4 (or 3x4) homogeneous matrix."""
        m = jnp.asarray(m, jnp.float32)
        r = m[:3, :3]
        t = m[:3, 3]
        # Shepperd's method, branch-free via the max-trace candidate select.
        tr = r[0, 0] + r[1, 1] + r[2, 2]
        qw = jnp.sqrt(jnp.maximum(0.0, 1 + tr)) / 2
        qx = jnp.sqrt(jnp.maximum(0.0, 1 + r[0, 0] - r[1, 1] - r[2, 2])) / 2
        qy = jnp.sqrt(jnp.maximum(0.0, 1 - r[0, 0] + r[1, 1] - r[2, 2])) / 2
        qz = jnp.sqrt(jnp.maximum(0.0, 1 - r[0, 0] - r[1, 1] + r[2, 2])) / 2
        qx = jnp.copysign(qx, r[2, 1] - r[1, 2])
        qy = jnp.copysign(qy, r[0, 2] - r[2, 0])
        qz = jnp.copysign(qz, r[1, 0] - r[0, 1])
        q = jnp.stack([qx, qy, qz, qw])
        q = q / jnp.linalg.norm(q)
        return cls(quat_xyzw=q, translation=t)

    def matrix(self) -> jax.Array:
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(quat_to_matrix(self.quat_xyzw))
        m = m.at[:3, 3].set(self.translation)
        return m

    def apply(self, points: jax.Array) -> jax.Array:
        """Transform points [..., 3] (pcl_ros::transformPointCloud equiv)."""
        return quat_rotate(self.quat_xyzw, points) + self.translation

    def inverse(self) -> "RigidTransform":
        qinv = self.quat_xyzw * jnp.array([-1.0, -1.0, -1.0, 1.0], jnp.float32)
        return RigidTransform(
            quat_xyzw=qinv, translation=-quat_rotate(qinv, self.translation)
        )

    def compose(self, other: "RigidTransform") -> "RigidTransform":
        """self ∘ other: apply ``other`` first, then ``self``."""
        x1, y1, z1, w1 = jnp.moveaxis(self.quat_xyzw, -1, 0)
        x2, y2, z2, w2 = jnp.moveaxis(other.quat_xyzw, -1, 0)
        q = jnp.stack(
            [
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            ],
            axis=-1,
        )
        return RigidTransform(
            quat_xyzw=q, translation=self.apply(other.translation)
        )
