"""pointcloud_obstacle_processing_tpu — a TPU-native point-cloud obstacle
perception engine (JAX/XLA/Pallas) with the capabilities of the
``stateSpaceRobotics/pointcloud_obstacle_processing`` ROS+PCL node.

Raw depth/LiDAR scans in → hole-aware occupancy grid, obstacle clusters
(PointIndicesArray of PointWithRad centroids+radii), and per-stage debug
clouds out.  The whole scan→obstacles pipeline is one jit-compiled function
over fixed-shape padded device buffers; scans batch with vmap and shard over
chips with shard_map.
"""

from .config import PipelineConfig, REFERENCE_YAML_CONFIG, config_from_dict, config_from_yaml
from .types import (
    Cloud,
    ClusterSet,
    OccupancyGrid,
    PipelineResult,
    PlaneModel,
    PointIndicesArray,
    PointWithRad,
    StageStats,
)

__version__ = "0.1.0"
