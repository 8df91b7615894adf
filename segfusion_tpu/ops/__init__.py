"""TPU-native compute ops: extraction, integration, classic TSDF fusion,
ray casting, filters, distance transform."""

from .geometry import (ExtractedValues, extract, interpolation_weights,
                       sample_ray_points, trilinear_gather, unproject)
from .integrate import (IntegrationResult, integrate_frame,
                        integrate_semantics, integrate_tsdf,
                        pack_semantic_key, unpack_semantic_key)
