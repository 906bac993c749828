"""Minimal tf2-style transform buffer.

The reference looks up ``world <-> kinect2_link`` from a tf2 listener
(obstacle_detection.cpp:124-125, :570, :592, :634, :692).  The TPU host
driver keeps the same API shape: named frames, latest-wins stamped
transforms, lookup in either direction along a single-parent tree.
"""

from __future__ import annotations

import threading

import numpy as np

from ..ops.transforms import RigidTransform
from .msgs import TransformStampedMsg

__all__ = ["TransformBuffer"]


def _quat_mul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def _quat_rot(q, v):
    u, w = np.asarray(q[:3]), q[3]
    t = 2.0 * np.cross(u, v)
    return np.asarray(v) + w * t + np.cross(u, t)


class TransformBuffer:
    """frame graph: child -> (parent, quat_xyzw, translation)."""

    def __init__(self):
        self._edges: dict[str, tuple[str, np.ndarray, np.ndarray]] = {}
        self._lock = threading.Lock()

    def set_transform(self, msg: TransformStampedMsg) -> None:
        with self._lock:
            self._edges[msg.child_frame_id] = (
                msg.header.frame_id,
                np.asarray(msg.rotation_xyzw, np.float64),
                np.asarray(msg.translation, np.float64),
            )

    def set_static(self, parent: str, child: str, quat_xyzw, translation) -> None:
        from .msgs import Header

        self.set_transform(
            TransformStampedMsg(
                header=Header.now(parent),
                child_frame_id=child,
                translation=tuple(translation),
                rotation_xyzw=tuple(quat_xyzw),
            )
        )

    def _chain_to_root(self, frame: str):
        """Accumulated (q, t) mapping `frame` coords into the root frame."""
        q = np.array([0.0, 0.0, 0.0, 1.0])
        t = np.zeros(3)
        with self._lock:
            edges = dict(self._edges)
        seen = set()
        while frame in edges:
            if frame in seen:
                raise ValueError(f"tf cycle at {frame}")
            seen.add(frame)
            parent, eq, et = edges[frame]
            # parent_from_frame ∘ current
            t = _quat_rot(eq, t) + et
            q = _quat_mul(eq, q)
            frame = parent
        return frame, q, t

    def lookup_quat_trans(self, target: str, source: str):
        """Host-side lookup: (quat_xyzw, translation) as float64 NumPy.

        The hot accumulation path (one lookup per sensor frame) must stay
        off the device — building jnp arrays here would dispatch eager
        device ops per frame (each one a full RPC through a remote-TPU
        tunnel)."""
        root_s, qs, ts = self._chain_to_root(source)
        root_t, qt, tt = self._chain_to_root(target)
        if root_s != root_t:
            raise KeyError(f"frames {source} and {target} are not connected")
        # target_from_source = inv(root_from_target) ∘ root_from_source
        qt_inv = qt * np.array([-1.0, -1.0, -1.0, 1.0])
        q = _quat_mul(qt_inv, qs)
        t = _quat_rot(qt_inv, ts - tt)
        return q, t

    def lookup_transform(self, target: str, source: str) -> RigidTransform:
        """Transform mapping source-frame points into target frame
        (tfBuffer.lookupTransform(target, source) semantics)."""
        q, t = self.lookup_quat_trans(target, source)
        return RigidTransform.from_quat_trans(q, t)

    def can_transform(self, target: str, source: str) -> bool:
        try:
            self.lookup_transform(target, source)
            return True
        except Exception:
            return False
