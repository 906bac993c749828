"""Host runtime: pub/sub bus, tf buffer, node driver, launch composition."""

from .bus import MessageBus, Publisher, Subscription
from .driver import ObstacleDetectionNode, POINT_TOPIC
from .msgs import (
    Header,
    OccupancyGridMsg,
    PointCloud2Msg,
    PointIndicesArrayMsg,
    PointWithRadMsg,
    TransformStampedMsg,
)
from .tf import TransformBuffer
