"""Host-side message schema (L6 wire API of SURVEY.md §1).

The reference's wire types are ROS messages: ``sensor_msgs/PointCloud2`` in
(obstacle_detection.cpp:80, :1001), ``nav_msgs/OccupancyGrid`` out
(:838-852), and the generated ``PointWithRad`` / ``PointIndicesArray``
(msg/PointWithRad.msg:1-4, msg/PointIndicesArray.msg:1).  These dataclasses
carry the same information for the in-process bus, with flat binary
(de)serialization so recorded streams can be replayed (the "recorded-bag
harness" the reference never had, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import struct
import time
from typing import Sequence

import numpy as np

__all__ = [
    "Header",
    "PointCloud2Msg",
    "OccupancyGridMsg",
    "PointWithRadMsg",
    "PointIndicesArrayMsg",
    "TransformStampedMsg",
]

_MAGIC = b"PCPT"


@dataclasses.dataclass
class Header:
    frame_id: str = "world"
    stamp: float = 0.0
    seq: int = 0

    @classmethod
    def now(cls, frame_id: str = "world", seq: int = 0) -> "Header":
        return cls(frame_id=frame_id, stamp=time.time(), seq=seq)


@dataclasses.dataclass
class PointCloud2Msg:
    """sensor_msgs/PointCloud2 equivalent: strided binary point records."""

    header: Header
    n_points: int
    point_step: int
    data: bytes
    off_x: int = 0
    off_y: int = 4
    off_z: int = 8

    @classmethod
    def from_xyz(cls, xyz: np.ndarray, frame_id: str = "kinect2_link",
                 point_step: int = 16, seq: int = 0) -> "PointCloud2Msg":
        """Pack an [n,3] array the way kinect2_bridge does (16-byte step:
        x,y,z float32 + 4 bytes padding)."""
        xyz = np.asarray(xyz, np.float32)
        rec = np.zeros((len(xyz), point_step), np.uint8)
        rec[:, 0:12] = xyz.view(np.uint8).reshape(len(xyz), 12)
        return cls(
            header=Header.now(frame_id, seq),
            n_points=len(xyz),
            point_step=point_step,
            data=rec.tobytes(),
        )

    def xyz(self) -> np.ndarray:
        """Decode to packed finite [n,3] float32 (native fast path)."""
        from ..native import decode_cloud2

        return decode_cloud2(
            self.data, self.n_points, self.point_step,
            self.off_x, self.off_y, self.off_z,
        )

    def serialize(self) -> bytes:
        fid = self.header.frame_id.encode()
        head = struct.pack(
            "<4sBdqiH iiii".replace(" ", ""),
            _MAGIC, 1, self.header.stamp, self.header.seq, self.n_points,
            len(fid), self.point_step, self.off_x, self.off_y, self.off_z,
        )
        return head + fid + self.data

    @classmethod
    def deserialize(cls, buf: bytes) -> "PointCloud2Msg":
        fmt = "<4sBdqiH iiii".replace(" ", "")
        size = struct.calcsize(fmt)
        magic, ver, stamp, seq, n, fl, step, ox, oy, oz = struct.unpack(
            fmt, buf[:size]
        )
        if magic != _MAGIC:
            raise ValueError("bad magic")
        fid = buf[size : size + fl].decode()
        return cls(
            header=Header(frame_id=fid, stamp=stamp, seq=seq),
            n_points=n,
            point_step=step,
            data=buf[size + fl :],
            off_x=ox, off_y=oy, off_z=oz,
        )


@dataclasses.dataclass
class OccupancyGridMsg:
    """nav_msgs/OccupancyGrid payload (obstacle_detection.cpp:838-852)."""

    header: Header
    resolution: float
    width: int
    height: int
    data: np.ndarray  # [height*width] int8, row-major
    origin_position: tuple = (0.0, 0.0, 0.0)
    origin_orientation_xyzw: tuple = (0.0, 0.0, 0.707, 0.707)


@dataclasses.dataclass
class PointWithRadMsg:
    """msg/PointWithRad.msg: float32 x, y, z, r."""

    x: float
    y: float
    z: float
    r: float


@dataclasses.dataclass
class PointIndicesArrayMsg:
    """msg/PointIndicesArray.msg: PointWithRad[] points."""

    header: Header
    points: Sequence[PointWithRadMsg]

    @classmethod
    def from_array(cls, xyzr: np.ndarray, valid: np.ndarray, seq: int = 0):
        pts = [PointWithRadMsg(*row) for row in np.asarray(xyzr)[np.asarray(valid)]]
        return cls(header=Header.now("world", seq), points=pts)


@dataclasses.dataclass
class TransformStampedMsg:
    """geometry_msgs/TransformStamped equivalent for the tf bus."""

    header: Header
    child_frame_id: str
    translation: tuple  # (x, y, z)
    rotation_xyzw: tuple  # quaternion
