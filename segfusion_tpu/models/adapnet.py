"""AdapNet++ semantic segmentation: multi-dilation ResNet-50 encoder,
eASPP context module, SSMA multimodal fusion, 3-head decoder.

Flax re-design of the reference model (reference modules/adapnet.py):
  * BottleneckSSMA -- multi-scale residual unit with two parallel dilated
    3x3 branches                                     (adapnet.py:12-84)
  * Encoder -- ResNet-50 with surgery: last layer2 block and layer3[2:6]
    replaced by multi-dilation units, layer4 stride removed and all blocks
    replaced (output stride 16), 24-channel skips     (adapnet.py:87-149)
  * eASPP -- cascaded atrous pyramid (rates 3/6/12) + image pooling
                                                      (adapnet.py:152-216)
  * Decoder -- 3 stages with 2 skips and 2 aux heads  (adapnet.py:219-317)
  * SSMA -- self-supervised modality attention fusion (adapnet.py:320-354)
  * AdapNet -- stage 1 (single modality) / stage 2 (RGB+depth fusion)
                                                      (adapnet.py:356-415)

The reference initialises its encoder from torchvision's pretrained
ResNet-50 (adapnet.py:101); this build trains from scratch (He init) or
imports converted weights -- there is no torchvision-pretrained dependency
on the TPU stack (SURVEY.md §7 hard part 6). NHWC layout throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Bottleneck", "BottleneckSSMA", "Encoder", "EASPP", "Decoder",
           "SSMA", "AdapNet", "build_adapnet"]


def _bn(train: bool, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


class Bottleneck(nn.Module):
    """Standard ResNet-50 bottleneck (1x1 -> 3x3 -> 1x1, x4 expansion)."""
    mid: int
    stride: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.mid * 4
        residual = x
        y = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = _bn(train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.mid, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(y)
        y = _bn(train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(train, self.dtype)(y)
        if self.project or self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv",
                               dtype=self.dtype)(x)
            residual = _bn(train, self.dtype)(residual)
        return nn.relu(y + residual)


class BottleneckSSMA(nn.Module):
    """Multi-dilation bottleneck (reference modules/adapnet.py:12-84):
    1x1 -> two parallel 3x3 branches with dilations (r1, r2), each d3/2
    channels -> concat -> 1x1 back to the residual width."""
    mid: int          # out_channels in the reference (width of conv1)
    r1: int
    r2: int
    d3: int           # split width (conv2a + conv2b output channels)
    out: int          # residual width (in_channels in the reference)
    project: bool = False  # layer4[0] has a stride-1 projection downsample
    drop_out: bool = False
    drop_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = _bn(train, self.dtype)(y)
        y = nn.relu(y)

        half = self.d3 // 2
        a = nn.Conv(half, (3, 3), kernel_dilation=self.r1, padding=self.r1,
                    use_bias=False, dtype=self.dtype)(y)
        a = _bn(train, self.dtype)(a)
        a = nn.relu(a)
        b = nn.Conv(half, (3, 3), kernel_dilation=self.r2, padding=self.r2,
                    use_bias=False, dtype=self.dtype)(y)
        b = _bn(train, self.dtype)(b)
        b = nn.relu(b)
        y = jnp.concatenate([a, b], axis=-1)

        y = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(train, self.dtype)(y)
        if self.project or x.shape[-1] != self.out:
            residual = nn.Conv(self.out, (1, 1), use_bias=False,
                               name="downsample_conv", dtype=self.dtype)(x)
            residual = _bn(train, self.dtype)(residual)
        y = nn.relu(y + residual)
        if self.drop_out:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return y


class Encoder(nn.Module):
    """ResNet-50 encoder with the AdapNet++ surgery (reference
    modules/adapnet.py:87-149). Output stride 16; returns
    (features 2048ch @ /16, skip2 24ch @ /4, skip1 24ch @ /8).
    ``resn50_dropout`` gates the layer3[2] dropout (the reference's
    no_resn50_dropout() toggle, adapnet.py:386-388)."""
    dtype: Any = None
    resn50_dropout: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        # stem
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt)(x)
        x = _bn(train, dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # layer1: 3 bottlenecks, 256
        x = Bottleneck(64, project=True, dtype=dt)(x, train)
        x = Bottleneck(64, dtype=dt)(x, train)
        x = Bottleneck(64, dtype=dt)(x, train)
        skip2 = _bn(train, dt)(nn.Conv(24, (1, 1), dtype=dt)(x))

        # layer2: 4 bottlenecks, 512; last replaced by multi-dilation unit
        # (reference adapnet.py:106)
        x = Bottleneck(128, stride=2, dtype=dt)(x, train)
        x = Bottleneck(128, dtype=dt)(x, train)
        x = Bottleneck(128, dtype=dt)(x, train)
        x = BottleneckSSMA(mid=128, r1=1, r2=2, d3=64, out=512,
                           dtype=dt)(x, train)
        skip1 = _bn(train, dt)(nn.Conv(24, (1, 1), dtype=dt)(x))

        # layer3: 6 bottlenecks, 1024; blocks 2..5 replaced (adapnet.py:108-116)
        x = Bottleneck(256, stride=2, dtype=dt)(x, train)
        x = Bottleneck(256, dtype=dt)(x, train)
        for i, r2 in enumerate((2, 16, 8, 4)):
            x = BottleneckSSMA(mid=256, r1=1, r2=r2, d3=256, out=1024,
                               drop_out=(i == 0 and self.resn50_dropout),
                               dtype=dt)(x, train)

        # layer4: stride removed, 3 multi-dilation blocks (adapnet.py:118-130)
        x = BottleneckSSMA(mid=512, r1=2, r2=4, d3=512, out=2048,
                           project=True, dtype=dt)(x, train)
        x = BottleneckSSMA(mid=512, r1=2, r2=8, d3=512, out=2048,
                           dtype=dt)(x, train)
        x = BottleneckSSMA(mid=512, r1=2, r2=16, d3=512, out=2048,
                           dtype=dt)(x, train)

        return x, skip2, skip1


class EASPP(nn.Module):
    """Efficient ASPP (reference modules/adapnet.py:152-216)."""
    mid: int = 64
    out: int = 256
    rates: Sequence[int] = (3, 6, 12)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b1 = nn.relu(_bn(train, dt)(nn.Conv(self.out, (1, 1),
                                            dtype=dt)(x)))
        branches = [b1]
        for rate in self.rates:
            y = nn.Conv(self.mid, (1, 1), dtype=dt)(x)
            y = nn.relu(_bn(train, dt)(y))
            for _ in range(2):
                y = nn.Conv(self.mid, (3, 3), kernel_dilation=rate,
                            padding=rate, dtype=dt)(y)
                y = nn.relu(_bn(train, dt)(y))
            y = nn.Conv(self.out, (1, 1), dtype=dt)(y)
            y = nn.relu(_bn(train, dt)(y))
            branches.append(y)
        # image pooling branch (BN deliberately absent, adapnet.py:209-210)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.relu(nn.Conv(self.out, (1, 1), dtype=dt)(g))
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], x.shape[2],
                                 self.out)).astype(b1.dtype)
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        return nn.relu(_bn(train, dt)(nn.Conv(self.out, (1, 1),
                                              dtype=dt)(y)))


def _upsample(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "bilinear")


class Decoder(nn.Module):
    """3-stage decoder with two skips and two aux heads
    (reference modules/adapnet.py:219-317)."""
    n_classes: int
    fusion: bool = False   # fused skip gating for stage-2 models
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip1, skip2, train: bool = False):
        dt = self.dtype
        # stage 1: x2 upsample
        x = nn.ConvTranspose(256, (4, 4), strides=(2, 2), padding="SAME",
                             dtype=dt)(x)
        x = nn.relu(_bn(train, dt)(x))
        aux1 = _upsample(_bn(train, dt)(
            nn.Conv(self.n_classes, (1, 1), dtype=dt)(x)), 8)

        skip1 = skip1.astype(x.dtype)
        skip2 = skip2.astype(x.dtype)
        if self.fusion:
            g = jnp.mean(x, axis=(1, 2), keepdims=True)
            g = nn.relu(nn.Conv(24, (1, 1), name="fuse_conv1", dtype=dt)(g))
            x = jnp.concatenate([x, g * skip1], axis=-1)
        else:
            x = jnp.concatenate([x, skip1], axis=-1)

        # stage 2
        x = nn.Conv(256, (3, 3), padding=1, dtype=dt)(x)
        x = nn.relu(_bn(train, dt)(x))
        x = nn.Conv(256, (3, 3), padding=1, dtype=dt)(x)
        x = nn.relu(_bn(train, dt)(x))
        x = nn.ConvTranspose(256, (4, 4), strides=(2, 2), padding="SAME",
                             dtype=dt)(x)
        x = _bn(train, dt)(x)
        aux2 = _upsample(_bn(train, dt)(
            nn.Conv(self.n_classes, (1, 1), dtype=dt)(x)), 4)

        if self.fusion:
            g = jnp.mean(x, axis=(1, 2), keepdims=True)
            g = nn.relu(nn.Conv(24, (1, 1), name="fuse_conv2", dtype=dt)(g))
            x = jnp.concatenate([x, g * skip2], axis=-1)
        else:
            x = jnp.concatenate([x, skip2], axis=-1)

        # stage 3: to full resolution
        x = nn.Conv(256, (3, 3), padding=1, dtype=dt)(x)
        x = nn.relu(_bn(train, dt)(x))
        x = nn.Conv(256, (3, 3), padding=1, dtype=dt)(x)
        x = nn.relu(_bn(train, dt)(x))
        x = _bn(train, dt)(nn.Conv(self.n_classes, (1, 1), dtype=dt)(x))
        x = nn.ConvTranspose(self.n_classes, (8, 8), strides=(4, 4),
                             padding="SAME", dtype=dt)(x)
        res = _bn(train, dt)(x)
        return (res.astype(jnp.float32), aux1.astype(jnp.float32),
                aux2.astype(jnp.float32))


class SSMA(nn.Module):
    """Self-supervised modality attention fusion
    (reference modules/adapnet.py:320-354)."""
    features: int
    bottleneck: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        # reference: reduce_size = features / bottleneck (adapnet.py:329)
        reduce = self.features // self.bottleneck
        x12 = jnp.concatenate([x1, x2], axis=-1)
        g = nn.Conv(reduce, (3, 3), padding=1, dtype=self.dtype)(x12)
        g = nn.relu(g)
        g = nn.Conv(2 * self.features, (3, 3), padding=1,
                    dtype=self.dtype)(g)
        g = nn.sigmoid(g)
        y = x12.astype(g.dtype) * g
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(y)
        return _bn(train, self.dtype)(y)


class AdapNet(nn.Module):
    """Stage 1: single-modality AdapNet++. Stage 2: two encoders (RGB +
    depth) fused by SSMA at the bottleneck and both skips
    (reference modules/adapnet.py:356-415). Returns [res, aux1, aux2]."""
    n_classes: int
    stage: int = 1
    dtype: Any = None
    resn50_dropout: bool = True  # reference no_resn50_dropout() toggle

    @nn.compact
    def __call__(self, mod1, mod2=None, train: bool = False):
        dt = self.dtype
        rd = self.resn50_dropout
        if self.stage == 1:
            x, skip2, skip1 = Encoder(name="encoder_mod1", dtype=dt,
                                      resn50_dropout=rd)(mod1, train)
            x = EASPP(name="eASPP", dtype=dt)(x, train)
        else:
            assert mod2 is not None, "stage-2 AdapNet needs two modalities"
            m1, s2_1, s1_1 = Encoder(name="encoder_mod1", dtype=dt,
                                     resn50_dropout=rd)(mod1, train)
            m2, s2_2, s1_2 = Encoder(name="encoder_mod2", dtype=dt,
                                     resn50_dropout=rd)(mod2, train)
            m1 = EASPP(name="eASPP_mod1", dtype=dt)(m1, train)
            m2 = EASPP(name="eASPP_mod2", dtype=dt)(m2, train)
            skip2 = SSMA(24, 6, name="ssma_s2", dtype=dt)(s2_1, s2_2, train)
            skip1 = SSMA(24, 6, name="ssma_s1", dtype=dt)(s1_1, s1_2, train)
            x = SSMA(256, 16, name="ssma_res", dtype=dt)(m1, m2, train)

        res, aux1, aux2 = Decoder(self.n_classes,
                                  fusion=self.stage != 1,
                                  name="decoder", dtype=dt)(x, skip1, skip2,
                                                            train)
        return [res, aux1, aux2]


def build_adapnet(config: Any) -> AdapNet:
    """Factory from the SEMANTIC_2D_MODEL config section."""
    dtype = None
    if config.get("compute_dtype") in ("bfloat16", "bf16"):
        dtype = jnp.bfloat16
    return AdapNet(n_classes=int(config.n_classes),
                   stage=int(config.get("stage", 1)),
                   dtype=dtype,
                   resn50_dropout=bool(config.get("resn50_dropout", True)))


class SegmenterAdapter:
    """Pipeline-facing adapter: apply_fn(params_bundle, image, depth) ->
    (h, w, C) logits. ``image`` is (h, w, 3) in 0..255, ``depth`` (h, w);
    normalisation follows the reference (image/255, depth repeated to 3
    channels -- modules/pipeline.py:42-55)."""

    def __init__(self, model: AdapNet, input_mode: str = "tof_depth"):
        self.model = model
        self.input_mode = input_mode

    def apply_fn(self, params_bundle, image, depth):
        return self.apply_fn_batched(params_bundle, image[None],
                                     depth[None])[0]

    def apply_fn_batched(self, params_bundle, images, depths):
        """Batched forward: ``images`` (B, h, w, 3) in 0..255, ``depths``
        (B, h, w) -> (B, h, w, C) logits. Inference BatchNorm uses running
        stats, so each sample's logits are independent of its batch mates
        -- the sequence pipelines exploit this to amortise the per-conv
        dispatch floor over a whole frame chunk (Pipeline semantic
        pre-pass)."""
        params, batch_stats = params_bundle
        variables = {"params": params, "batch_stats": batch_stats}
        img = images / 255.0
        dep = jnp.repeat(depths[..., None], 3, axis=-1)
        if self.model.stage == 1:
            mod1 = img if self.input_mode == "image" else dep
            res, _, _ = self.model.apply(variables, mod1, train=False)
        else:
            res, _, _ = self.model.apply(variables, img, dep, train=False)
        return res
