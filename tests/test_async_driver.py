"""Async (double-buffered) driver mode: same results, one-window latency."""

import numpy as np

from pointcloud_obstacle_processing_tpu import REFERENCE_YAML_CONFIG
from pointcloud_obstacle_processing_tpu.runtime.bus import MessageBus
from pointcloud_obstacle_processing_tpu.runtime.driver import (
    POINT_TOPIC,
    ObstacleDetectionNode,
)
from pointcloud_obstacle_processing_tpu.runtime.launch import (
    DEFAULT_SENSOR_POS,
    DEFAULT_SENSOR_QUAT,
    SyntheticKinect,
)
from pointcloud_obstacle_processing_tpu.runtime.tf import TransformBuffer

CFG = REFERENCE_YAML_CONFIG.replace(
    max_points=16384, max_voxels=4096, cluster_capacity=1024,
    max_clusters=16, accumulate_count=3, downsample_leaf_size=0.06,
)


def _run(async_mode: bool, cycles: int = 3):
    bus = MessageBus(immediate=True)
    tf = TransformBuffer()
    tf.set_static("world", "kinect2_link", DEFAULT_SENSOR_QUAT, DEFAULT_SENSOR_POS)
    node = ObstacleDetectionNode(
        CFG, bus=bus, tf_buffer=tf, async_pipeline=async_mode
    )
    kinect = SyntheticKinect(
        bus.advertise(POINT_TOPIC),
        tf.lookup_transform("world", "kinect2_link"),
        points_per_frame=4096,
    )
    grids = []
    bus.subscribe("occupancy_grid", lambda m: grids.append(m.data.copy()))
    for _ in range(cycles):
        for _ in range(CFG.accumulate_count + 1):
            kinect.emit_frame()
    if async_mode:
        node.flush()
    return node, grids


def test_async_matches_sync():
    node_s, grids_s = _run(False)
    node_a, grids_a = _run(True)
    assert len(grids_s) == len(grids_a) == 3
    for gs, ga in zip(grids_s, grids_a):
        np.testing.assert_array_equal(gs, ga)


def test_async_lags_by_one_window():
    bus = MessageBus(immediate=True)
    tf = TransformBuffer()
    tf.set_static("world", "kinect2_link", DEFAULT_SENSOR_QUAT, DEFAULT_SENSOR_POS)
    node = ObstacleDetectionNode(CFG, bus=bus, tf_buffer=tf, async_pipeline=True)
    kinect = SyntheticKinect(
        bus.advertise(POINT_TOPIC),
        tf.lookup_transform("world", "kinect2_link"),
        points_per_frame=4096,
    )
    for _ in range(CFG.accumulate_count + 1):
        kinect.emit_frame()
    # first window dispatched but nothing published yet
    assert node.pub_occupancy.n_published == 0
    for _ in range(CFG.accumulate_count + 1):
        kinect.emit_frame()
    assert node.pub_occupancy.n_published == 1
    node.flush()
    assert node.pub_occupancy.n_published == 2
