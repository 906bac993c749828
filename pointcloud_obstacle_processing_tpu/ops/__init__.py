"""Device-side compute stages (L0+L1 equivalents of the reference node)."""

from .cluster import cluster_centroids, euclidean_cluster
from .compaction import compact, extract_indices
from .filters import crop_box_mask, euclidean_distance, passthrough_mask
from .mxu_histogram import histogram2d_mxu, weighted_histogram_mxu
from .occupancy import crop_and_seed, grid_cell_index, grid_cell_xy, mark_obstacles
from .outliers import knn_mean_distances, remove_statistical_outliers
from .ransac import ransac_plane_once, segment_planes
from .shadow import cast_shadows
from .transforms import RigidTransform, quat_rotate, quat_to_matrix
from .voxel import merge_voxel_partials, voxel_downsample, voxel_partials
