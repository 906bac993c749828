"""Device-side compute stages (L0+L1 equivalents of the reference node)."""

from .filters import crop_box_mask, euclidean_distance, passthrough_mask
from .occupancy import crop_and_seed, grid_cell_index, grid_cell_xy, mark_obstacles
from .transforms import RigidTransform, quat_rotate, quat_to_matrix
from .voxel import voxel_downsample
