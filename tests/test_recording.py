"""Record/replay harness: a replayed scan log reproduces the live run."""

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
from pointcloud_obstacle_processing_tpu.runtime.recording import (
    ScanWriter,
    read_scans,
    replay,
)
from pointcloud_obstacle_processing_tpu.runtime.tf import TransformBuffer

CFG = REFERENCE_YAML_CONFIG.replace(
    max_points=16384, max_voxels=4096, cluster_capacity=1024,
    max_clusters=16, accumulate_count=3, downsample_leaf_size=0.06,
)


def _node():
    bus = MessageBus(immediate=True)
    tf = TransformBuffer()
    tf.set_static("world", "kinect2_link", DEFAULT_SENSOR_QUAT, DEFAULT_SENSOR_POS)
    return ObstacleDetectionNode(CFG, bus=bus, tf_buffer=tf), bus, tf


def test_replay_reproduces_live_run(tmp_path):
    log_path = str(tmp_path / "scans.pcplog")

    # live run, recording every input scan
    node1, bus1, tf1 = _node()
    writer = ScanWriter(log_path)
    bus1.subscribe(POINT_TOPIC, writer.write, queue_size=10**6)
    kinect = SyntheticKinect(
        bus1.advertise(POINT_TOPIC),
        tf1.lookup_transform("world", "kinect2_link"),
        points_per_frame=4096,
    )
    for _ in range(2 * (CFG.accumulate_count + 1)):
        kinect.emit_frame()
    writer.close()
    assert writer.n_written == 2 * (CFG.accumulate_count + 1)
    grid_live = np.asarray(node1.last_result.grid.data)

    # replay into a fresh node
    node2, bus2, _ = _node()
    n = replay(log_path, bus2.advertise(POINT_TOPIC))
    assert n == writer.n_written
    grid_replayed = np.asarray(node2.last_result.grid.data)
    np.testing.assert_array_equal(grid_live, grid_replayed)

    # log round-trips message content exactly
    msgs = list(read_scans(log_path))
    assert msgs[0].n_points == 4096
    assert msgs[0].header.frame_id == "kinect2_link"
