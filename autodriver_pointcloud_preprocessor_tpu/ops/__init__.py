"""Filter/op library: pure ``(ScanBuffer, params) -> ScanBuffer`` kernels.

TPU-native replacements for the Open3D C++/CUDA kernel inventory in
SURVEY.md §2b. Every op is mask-only (no compaction) and jit-safe; numeric
params are traced so live reconfigure never recompiles.
"""
from .compact import (
    compact,
    compact_to,
    compaction_order,
    shrink_front,
    stream_compact_to,
    subsample_to,
)
from .crop import crop_box
from .downsample import (
    farthest_point_downsample,
    random_downsample,
    uniform_downsample,
)
from .dedup import duplicate_mask, remove_duplicates
from .finite import mask_non_finite
from .ground import remove_ground, segment_plane
from .height_ground import remove_ground_by_height
from .knn import knn_exact
from .linalg import quaternion_to_matrix, se3_matrix, smallest_eigenvector_sym3x3
from .normals import estimate_normals
from .outliers import remove_statistical_outliers
from .radius_outliers import remove_radius_outliers
from .transform import rotate_rows, se3_transform, transform_points
from .voxel import voxel_downsample
from .window import (
    fused_neighborhood_stats,
    hilbert_codes,
    morton_codes,
    window_mean_knn_dist,
    window_normal_stats,
)
