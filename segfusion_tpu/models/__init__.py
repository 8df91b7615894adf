"""Model zoo: FusionNet family (learned depth fusion) + AdapNet++
(2D semantic segmentation)."""

from .adapnet import AdapNet, Decoder, EASPP, Encoder, SSMA, SegmenterAdapter, build_adapnet
from .fusionnet import (Block, FusionNetV1, FusionNetV2, FusionNetV3, Pred,
                        VortexPooling, build_fusion_net)
