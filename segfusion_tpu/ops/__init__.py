"""TPU-native compute ops: extraction, integration, classic TSDF fusion,
ray casting, filters, distance transform."""

from .distance_transform import (distance_transform, distance_transform_1d,
                                 occupancy_to_sdf)
from .filters import median_filter3d, outlier_filter
from .geometry import (ExtractedValues, extract, extract_numw,
                       interpolation_weights, sample_ray_points,
                       trilinear_gather, trilinear_gather_numw, unproject)
from .integrate import (IntegrationResult, integrate_frame, integrate_numw,
                        integrate_semantics, integrate_semkey,
                        integrate_tsdf, pack_semantic_key,
                        unpack_semantic_key)
from .raycast import render_depth
from .tsdf_fusion import (fuse_frame, fuse_frame_multiclass,
                          tsdf_from_depth_views)
