import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_obstacle_processing_tpu.ops.transforms import (
    RigidTransform,
    quat_rotate,
    quat_to_matrix,
)


def random_transform(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    return RigidTransform.from_quat_trans(q, t)


def test_quat_rotate_matches_matrix(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    v = rng.normal(size=(100, 3)).astype(np.float32)
    r = quat_to_matrix(jnp.asarray(q, jnp.float32))
    out1 = quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v))
    out2 = v @ np.asarray(r).T
    np.testing.assert_allclose(np.asarray(out1), out2, atol=1e-5)


def test_inverse_roundtrip(rng):
    tf = random_transform(rng)
    pts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    back = tf.inverse().apply(tf.apply(pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_compose(rng):
    a, b = random_transform(rng), random_transform(rng)
    pts = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    out1 = a.apply(b.apply(pts))
    out2 = a.compose(b).apply(pts)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_matrix_roundtrip(rng):
    tf = random_transform(rng)
    tf2 = RigidTransform.from_matrix(tf.matrix())
    q1 = np.asarray(tf.quat_xyzw)
    q2 = np.asarray(tf2.quat_xyzw)
    if np.dot(q1, q2) < 0:
        q2 = -q2
    np.testing.assert_allclose(q1, q2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf.translation), np.asarray(tf2.translation), atol=1e-6)


def test_identity():
    pts = jnp.ones((4, 3), jnp.float32)
    out = RigidTransform.identity().apply(pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts))
