"""Pipeline: per-frame orchestration of segment -> extract -> fuse -> integrate.

TPU-native re-design of the reference Pipeline (reference
modules/pipeline.py:12-363). The reference walks each frame through four
Python modules with host<->device copies between them; here the entire
per-frame computation -- optional AdapNet++ segmentation forward, ray
extraction, FusionNet forward, loss-target preparation and volume
integration -- is ONE jitted XLA program with the scene volume donated in
HBM. The training variant exposes a value_and_grad-ready loss with gradients
flowing only through the current frame's FusionNet forward (truncated BPTT
of length 1: the carried volume is stop_gradient'ed, matching the
reference's .detach() at modules/pipeline.py:360-361).

Shapes are static: invalid pixels are masked (weight-0 scatter lanes), not
filtered (the reference's dynamic ``valid`` indexing at
modules/pipeline.py:145-153 breaks XLA).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.fusionnet import build_fusion_net
from ..ops import geometry
from ..ops import integrate as integ
from ..ops import rowvol
from .volume import SceneVolume

__all__ = ["Pipeline", "FusionOutput"]


class RowStream(NamedTuple):
    """Row-path streaming state carried across frames and chunks: the
    slot volume plus the dirty-shadow carry -- ``shadow`` is the gather
    shadow USED for the last processed frame (built from the geo state
    before that frame's integration) and ``dirty`` that frame's
    integration-footprint tile mask (rowvol.dirty_tile_mask), so the next
    frame rebuilds only the stale tiles (rowvol.build_shadow_dirty).
    ``shadow``/``dirty`` are None when the carry is disabled
    (SETTINGS.dirty_shadow: off); bit-identical either way (the mask is
    conservative, tests/test_shadow_dirty.py)."""
    rv: rowvol.RowVolume
    shadow: Optional[jnp.ndarray]   # (shadow_rows, 128) u32 or None
    dirty: Optional[jnp.ndarray]    # (X * NJ + 1,) i32 or None


class FusionOutput(NamedTuple):
    """Loss-ready outputs (reference modules/pipeline.py:130-135)."""
    tsdf_est: jnp.ndarray     # (1, h*w, n_points)
    tsdf_fused: jnp.ndarray   # (1, h*w, n_points)
    tsdf_target: jnp.ndarray  # (1, h*w, n_points)
    mask: jnp.ndarray         # (1, h*w) valid-ray mask


def _prepare_fusion_input(depth, values: geometry.ExtractedValues,
                          sem_ids, n_points: int, n_classes: int,
                          use_semantics: bool) -> Dict[str, jnp.ndarray]:
    """Pack network inputs NHWC (reference modules/pipeline.py:74-102)."""
    h, w = depth.shape
    inputs = {
        "tsdf_values": values.fusion_values.reshape(1, h, w, n_points),
        "tsdf_weights": values.fusion_weights.reshape(1, h, w, n_points),
        "tsdf_frame": depth.reshape(1, h, w, 1),
    }
    if use_semantics:
        sem = (1.0 + sem_ids.astype(jnp.float32)) / n_classes  # (0, 1]
        inputs["semantic_frame"] = sem.reshape(1, h, w, 1)
    return inputs


def _fused_for_loss(fusion_values, fusion_weights, tsdf_est,
                    init_value: float):
    """Moving-average fusion used as the learning target transform
    (reference modules/pipeline.py:104-116)."""
    n = tsdf_est.shape[-1]
    tsdf_old = fusion_values[None, :, :n]
    weights = jnp.maximum(fusion_weights[None, :, :n], 0.0)
    tsdf_new = jnp.clip(tsdf_est, -init_value, init_value)
    return (weights * tsdf_old + tsdf_new) / (weights + 1.0)


class Pipeline:
    """Builds the fusion net (+ optional 2D segmentation net) and exposes
    jitted per-frame steps. Mirrors the reference constructor selection
    (modules/pipeline.py:27-40)."""

    def __init__(self, config, segmenter=None):
        self.config = config
        self.n_points = int(config.FUSION_MODEL.n_points)
        self.n_tail_points = int(config.FUSION_MODEL.n_tail_points)
        self.init_value = float(config.DATA.init_value)
        self.use_semantics = bool(config.FUSION_MODEL.use_semantics)
        self.semantics = bool(config.DATA.get("semantics"))
        self.semantic_strategy = config.DATA.get("semantic_strategy", "gt")
        self.n_classes = int(config.SEMANTIC_2D_MODEL.n_classes) \
            if self.semantics else 0
        # halve extraction gathers via the packed-bf16 shadow
        # (geometry.pack16_numw; 16-bit read budget == the reference's
        # float16 volumes); disable with SETTINGS.gather_precision: f32
        self.packed16_gather = config.SETTINGS.get(
            "gather_precision", "f16packed") != "f32"
        # 128-lane-row hot path (ops/rowvol.py): 4x fewer random-access
        # ops than the flat scalar path, same numerics (bf16 gather
        # precision, summation-order float tolerance). Disable with
        # SETTINGS.integration: scalar
        self.row_path = config.SETTINGS.get(
            "integration", "rows") != "scalar"
        # explicit kernel impl for the row-path shadow/reconcile
        # ("pallas"/"xla"); None = auto by array platform / default
        # backend (rowvol._impl_for). Set when jitting for a non-default
        # backend.
        self.rows_impl = config.SETTINGS.get("rows_impl", None)
        if self.rows_impl is None:
            # resolve ONCE at construction from the default backend:
            # every pipeline entry point then passes an explicit impl and
            # rowvol._impl_for's silent inside-jit tracer fallback can
            # never mispick for pipeline-driven code (VERDICT r3 weak #5;
            # callers jitting for a non-default backend set
            # SETTINGS.rows_impl explicitly)
            self.rows_impl = ("pallas" if jax.default_backend() == "tpu"
                              else "xla")
        # dirty-shadow carry: sequence scans rebuild only the shadow
        # tiles the previous frame's integration touched
        # (rowvol.build_shadow_dirty; bit-identical, the mask is
        # conservative). Disable with SETTINGS.dirty_shadow: off
        self.dirty_shadow = self.row_path and config.SETTINGS.get(
            "dirty_shadow", "on") != "off"

        # folded-BN matmul executor for v3 inference (models/
        # fusionnet_fast): "auto" enables it on the bf16 compute path
        # (the TPU perf configuration; f32 runs keep the Flax forward so
        # reference-parity goldens are byte-for-byte unaffected).
        fused = config.SETTINGS.get("fused_net", "auto")
        is_bf16 = config.FUSION_MODEL.get("compute_dtype") in (
            "bfloat16", "bf16")
        self.fused_net = (
            config.FUSION_MODEL.name == "v3"
            and not bool(config.FUSION_MODEL.get("stack_heads", False))
            and (fused == "on" or (fused == "auto" and is_bf16)))
        # matmul-form TRAINING forward (fusionnet_fast.apply_v3_train):
        # same conv-op-floor motivation as the inference executor, but on
        # the raw Flax trees with train-mode BN + dropout so grads and
        # running-stat updates match the Flax path (tolerance-level
        # numerics, not bit-exact -- dropout uses its own rng stream).
        # "auto" follows fused_net; force with SETTINGS.fused_net_train.
        ft = config.SETTINGS.get("fused_net_train", "auto")
        self.fused_net_train = (
            config.FUSION_MODEL.name == "v3"
            and not bool(config.FUSION_MODEL.get("stack_heads", False))
            and (ft == "on" or (ft == "auto" and self.fused_net)))
        self.fused_dtype = jnp.bfloat16 if is_bf16 else jnp.float32
        self.fused_conv3x3 = config.SETTINGS.get("fused_conv3x3", "dots9")
        # branch-batched vortex matmuls (6 dots vs 18 convs per vortex)
        self.fused_pack_vortex = config.SETTINGS.get(
            "fused_vortex", "plain") == "packed"

        # batched semantic pre-pass: sequence scans run the 2D segmenter
        # over the whole frame chunk BEFORE the fusion scan (the
        # prediction depends only on the frame, never on the volume), so
        # the ~85 AdapNet convs amortise their per-op dispatch floor over
        # sem_prepass_batch frames instead of paying it at batch 1 inside
        # every scan step. Per-sample numerics are unchanged (inference
        # BN uses running stats). Disable with SETTINGS.sem_prepass: off.
        self.sem_prepass = config.SETTINGS.get("sem_prepass", "on") != "off"
        self.sem_prepass_batch = int(
            config.SETTINGS.get("sem_prepass_batch", 8))

        # semantic-integration decimation: the key scatter-max runs only
        # on every k-th frame of a sequence scan (lax.cond). The key
        # scatter is row-bound at ~22 ms/frame at 448^3/256^2
        # (PERFORMANCE.md) while the semantic volume is a
        # winner-takes-max accumulator, so decimation drops observations
        # without corrupting state; the reference never updates
        # semantics during training at all (modules/integrator.py:90,
        # test=True gate). Default 1 = exact reference parity (no cond
        # in the graph). Quality cost quantified in STATUS.md. When
        # frame blocking is on (below), the unit is BLOCKS, not frames.
        self.sem_every = int(
            config.SETTINGS.get("sem_integrate_every", 1))

        # frame-block integration (SETTINGS.frame_block = k): sequence
        # scans process k frames per scan step -- every frame in the
        # block extracts against the SAME pre-block state, the fusion/
        # segmentation nets run batched over the block, and the geo
        # scatter-add, key scatter-max and shadow rebuild are paid ONCE
        # per block. The scatters' cost is dominated by a fixed
        # full-state pass per scatter OP (~17 ms geo + ~8.5 ms key at
        # 448^3, PERFORMANCE.md "scatter cost model"), which this
        # amortises by k. APPROXIMATION: frame i>0 of a block fuses
        # against state that is missing the block's earlier frames'
        # updates (the scatter itself stays an exact commutative sum /
        # max -- only the values the net SEES are up to k-1 frames
        # stale). k=1 (default) is the exact per-frame recurrence;
        # quality cost at k>1 quantified by tools/run_quality_demo.py
        # (STATUS.md). Inference-only; training always steps per frame.
        # Env SEGFUSION_FRAME_BLOCK overrides for no-edit A/B runs.
        _fb = os.environ.get("SEGFUSION_FRAME_BLOCK")
        self.frame_block = max(1, int(
            _fb if _fb else config.SETTINGS.get("frame_block", 1)))

        # geo accumulator dtype for the row path (SETTINGS.geo_dtype:
        # "float32" exact | "bfloat16"). bf16 halves the geo state bytes
        # and with them the scatter-add's fixed full-state pass -- the
        # floor-setter of every mode (PERFORMANCE.md scatter cost model)
        # -- at the price of RTNE rounding per accumulation; the
        # reference itself stores float16 volumes
        # (modules/integrator.py:79-88). Canonical SceneVolume stays f32
        # either way (exit reconcile upcasts). Env SEGFUSION_GEO_DTYPE
        # overrides for no-edit A/B runs.
        _gd = os.environ.get("SEGFUSION_GEO_DTYPE") \
            or config.SETTINGS.get("geo_dtype", "float32")
        self.geo_dtype = jnp.bfloat16 if _gd in ("bfloat16", "bf16") \
            else jnp.float32

        self.fusion_net = build_fusion_net(config.FUSION_MODEL)
        # segmenter: optional object with .apply_fn(params, image, depth)
        # -> (h, w, C) logits (+ optional .apply_fn_batched with a
        # leading frame axis), used when semantic_strategy == 'predict'
        self.segmenter = segmenter

    # -- parameter init -------------------------------------------------------

    def init_fusion_params(self, rng, h: int, w: int):
        dummy = {
            "tsdf_values": jnp.zeros((1, h, w, self.n_points)),
            "tsdf_weights": jnp.zeros((1, h, w, self.n_points)),
            "tsdf_frame": jnp.zeros((1, h, w, 1)),
        }
        if self.use_semantics:
            dummy["semantic_frame"] = jnp.zeros((1, h, w, 1))
        variables = self.fusion_net.init(rng, dummy, train=False)
        return variables["params"], variables.get("batch_stats", {})

    # -- shared core ----------------------------------------------------------

    def prepare_params(self, params, batch_stats):
        """Fold ``(params, batch_stats)`` for the inference fast path
        (models/fusionnet_fast) when enabled -- call ONCE per stream,
        outside the frame scan, so the fold doesn't re-run per frame.
        Returns a ``params_and_stats`` pytree accepted by every fuse
        step; a no-op passthrough when the fast path is off. Training
        steps always need the RAW tuple (autodiff through the Flax
        forward)."""
        if not self.fused_net:
            return params, batch_stats
        if isinstance(params, dict) and "meta" in params:
            return params, batch_stats       # already folded
        # host-side cache: per-frame callers (``fuse``) pass the same
        # concrete param objects every frame; re-folding would dispatch
        # ~340 tiny host ops per frame (seconds through the relay)
        cached = getattr(self, "_fold_cache", None)
        if cached is not None and cached[0] is params \
                and cached[1] is batch_stats:   # identity (strong refs --
            return cached[2], batch_stats       # no id() recycling)
        from ..models import fusionnet_fast as ff
        cfgm = self.config.FUSION_MODEL
        folded = ff.fold_v3(params, batch_stats,
                            growth_factor=int(cfgm.growth_factor),
                            use_semantics=self.use_semantics,
                            n_points=self.n_points,
                            output_scale=float(cfgm.output_scale),
                            pack_vortex=self.fused_pack_vortex)
        self._fold_cache = (params, batch_stats, folded)
        return folded, batch_stats

    def _network_estimate(self, params, batch_stats, inputs, train, rng):
        if isinstance(params, dict) and "meta" in params and not train:
            from ..models import fusionnet_fast as ff
            est = ff.apply_v3(params, inputs, dtype=self.fused_dtype,
                              conv3x3=self.fused_conv3x3)
            return est[..., : self.n_points], batch_stats
        if train and self.fused_net_train \
                and not (isinstance(params, dict) and "meta" in params):
            from ..models import fusionnet_fast as ff
            cfg = self.config.FUSION_MODEL
            est, new_stats = ff.apply_v3_train(
                params, batch_stats, inputs, rng,
                growth_factor=int(cfg.growth_factor),
                use_semantics=self.use_semantics,
                n_points=self.n_points,
                output_scale=float(cfg.output_scale),
                dropout_rate=float(cfg.get("dropout", 0.2)),
                dtype=self.fused_dtype, conv3x3=self.fused_conv3x3)
            return est, new_stats
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = self.fusion_net.apply(
                variables, inputs, train=True,
                rngs={"dropout": rng} if rng is not None else None,
                mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            out = self.fusion_net.apply(variables, inputs, train=False)
            new_stats = batch_stats
        # NHWC (1,h,w,n_points) -> (1, h*w, n_points)
        b, h, w, c = out.shape
        est = out[..., : self.n_points].reshape(b, h * w, self.n_points)
        return est, new_stats

    def _predict_semantics(self, seg_params, image, depth):
        """2D segmentation forward + winner (reference
        modules/pipeline.py:42-60, 181-185)."""
        logits = self.segmenter.apply_fn(seg_params, image, depth)
        probs = jax.nn.softmax(logits, axis=-1)
        scores = jnp.max(probs, axis=-1)
        ids = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        return ids.reshape(-1), scores.reshape(-1)

    def _frame_semantics(self, frame, seg_params, stop_grad=False):
        """Per-frame (sem_ids, scores), each (h*w,): the pre-pass values
        when the sequence scan attached them as xs (``sem_ids_pre``),
        else the per-frame segmenter forward / gt labels."""
        if "sem_ids_pre" in frame:
            return frame["sem_ids_pre"], frame["sem_scores_pre"]
        if self.semantic_strategy == "predict":
            sem_ids, scores = self._predict_semantics(
                seg_params, frame["image"], frame["depth_input"])
            if stop_grad:
                sem_ids = jax.lax.stop_gradient(sem_ids)
                scores = jax.lax.stop_gradient(scores)
            return sem_ids, scores
        sem_ids = frame["semantic_gt"].reshape(-1).astype(jnp.uint8)
        return sem_ids, jnp.ones_like(sem_ids, jnp.float32)

    def _predict_semantics_batched(self, seg_params, images, depths):
        """Chunk-batched segmenter forward: (T, h, w, 3)/(T, h, w) ->
        ids (T, h*w) u8, scores (T, h*w) f32. Frames run through the net
        ``sem_prepass_batch`` at a time (a lax.scan over ceil(T/B)
        batches; T is padded by repeating the last frame), amortising the
        per-conv dispatch floor while bounding activation memory."""
        T = images.shape[0]
        B = max(1, min(self.sem_prepass_batch, T))
        pad = (-T) % B
        if pad:
            images = jnp.concatenate(
                [images, jnp.repeat(images[-1:], pad, axis=0)])
            depths = jnp.concatenate(
                [depths, jnp.repeat(depths[-1:], pad, axis=0)])
        imgs = images.reshape(-1, B, *images.shape[1:])
        deps = depths.reshape(-1, B, *depths.shape[1:])

        def body(_, xy):
            img, dep = xy
            logits = self.segmenter.apply_fn_batched(seg_params, img, dep)
            probs = jax.nn.softmax(logits, axis=-1)
            scores = jnp.max(probs, axis=-1)
            ids = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
            return None, (ids.reshape(B, -1), scores.reshape(B, -1))

        _, (ids, scores) = jax.lax.scan(body, None, (imgs, deps))
        npix = ids.shape[-1]
        return ids.reshape(-1, npix)[:T], scores.reshape(-1, npix)[:T]

    def _sem_prepass_frames(self, frames, seg_params, need_sem: bool):
        """Attach pre-pass semantics to a (T, ...) frame-stream dict when
        the pre-pass applies; otherwise return ``frames`` unchanged."""
        if not (need_sem and self.sem_prepass
                and self.semantic_strategy == "predict"
                and self.segmenter is not None
                and hasattr(self.segmenter, "apply_fn_batched")
                and "image" in frames):
            return frames
        ids, scores = self._predict_semantics_batched(
            seg_params, frames["image"], frames["depth_input"])
        out = dict(frames)
        out["sem_ids_pre"] = ids
        out["sem_scores_pre"] = scores
        return out

    def _extract(self, depth, extrinsics, intrinsics, volume: SceneVolume):
        """Extraction over the accumulator state."""
        return geometry.extract_numw(depth, extrinsics, intrinsics,
                                     volume.num, volume.weights,
                                     volume.origin, volume.resolution,
                                     init_value=self.init_value,
                                     n_points=self.n_points,
                                     packed16=self.packed16_gather)

    def _extract_gt(self, depth, extrinsics, intrinsics, gt_tsdf,
                    volume: SceneVolume):
        """GT extraction: explicit gt value volume + the estimate's weight
        volume (reference modules/pipeline.py:309-315)."""
        return geometry.extract(depth, extrinsics, intrinsics, gt_tsdf,
                                volume.weights, volume.origin,
                                volume.resolution, n_points=self.n_points)

    def _volume_update_args(self, values: geometry.ExtractedValues,
                            tsdf_est, filtered_depth):
        """Static-shape analogue of _prepare_volume_update (reference
        modules/pipeline.py:137-171): first n_tail_points of each ray,
        rays masked by depth != 0. Returns lin/valid (factored fast path)
        or indices depending on what the extraction produced."""
        t = self.n_tail_points
        upd_values = jnp.clip(tsdf_est[0, :, :t], -self.init_value,
                              self.init_value)
        upd_weights = values.weights[:, :t]
        ray_mask = filtered_depth.reshape(-1) != 0.0
        if values.lin is not None:
            return (upd_values, (values.lin[:, :t], values.valid[:, :t]),
                    upd_weights, ray_mask)
        return upd_values, values.indices[:, :t], upd_weights, ray_mask

    @staticmethod
    def _integrate_geo(volume, upd_values, upd_idx, upd_weights, ray_mask):
        if isinstance(upd_idx, tuple):
            lin, valid = upd_idx
            return integ.integrate_numw_lin(volume.num, volume.weights,
                                            upd_values, lin, valid,
                                            upd_weights, ray_mask)
        return integ.integrate_numw(volume.num, volume.weights, upd_values,
                                    upd_idx, upd_weights, ray_mask)

    @staticmethod
    def _integrate_sem(volume, sem_ids, scores, upd_idx, ray_mask):
        if isinstance(upd_idx, tuple):
            lin, valid = upd_idx
            return integ.integrate_semkey_lin(volume.semkey, sem_ids,
                                              scores, lin, valid, ray_mask)
        return integ.integrate_semkey(volume.semkey, sem_ids, scores,
                                      upd_idx, ray_mask)

    # -- jitted steps -----------------------------------------------------------

    def step_fuse_impl(self, params_and_stats, volume: SceneVolume,
                       frame: Dict[str, jnp.ndarray],
                       seg_params) -> SceneVolume:
        """Inference step, un-jitted (composable under vmap / shard_map /
        scan). Reference Pipeline.fuse (modules/pipeline.py:173-248):
        integrates TSDF and, when semantics are on, the label/score
        volumes."""
        if self.row_path:
            layout, rv = self._rows_from_volume(volume)
            rv, _ = self.step_fuse_rows_impl(params_and_stats, layout, rv,
                                             frame, seg_params)
            return self._volume_from_rows(rv, layout)
        params, batch_stats = params_and_stats
        depth = frame["depth"]
        filtered = jnp.where(frame["mask"], depth, 0.0)

        if self.semantics:
            sem_ids, scores = self._frame_semantics(frame, seg_params)
        else:
            sem_ids = scores = None

        values = self._extract(depth, frame["extrinsics"],
                               frame["intrinsics"], volume)
        sem_img = (sem_ids.reshape(depth.shape)
                   if self.use_semantics else None)
        inputs = _prepare_fusion_input(depth, values, sem_img,
                                       self.n_points, self.n_classes,
                                       self.use_semantics)
        tsdf_est, _ = self._network_estimate(params, batch_stats, inputs,
                                             train=False, rng=None)
        upd_values, upd_idx, upd_weights, ray_mask = \
            self._volume_update_args(values, tsdf_est, filtered)

        new_num, new_w = self._integrate_geo(volume, upd_values, upd_idx,
                                             upd_weights, ray_mask)
        if self.semantics:
            new_key = self._integrate_sem(volume, sem_ids, scores, upd_idx,
                                          ray_mask)
        else:
            new_key = volume.semkey
        return SceneVolume(num=new_num, weights=new_w, semkey=new_key,
                           origin=volume.origin,
                           resolution=volume.resolution,
                           init_value=volume.init_value)

    # -- row-layout fast path (ops/rowvol.py) ---------------------------------

    def _rows_from_volume(self, volume: SceneVolume):
        layout = rowvol.RowLayout.for_shape(tuple(volume.num.shape))
        geo, key = rowvol.rows_from_volume(volume.num, volume.weights,
                                           volume.semkey, layout,
                                           geo_dtype=self.geo_dtype)
        rv = rowvol.RowVolume(geo=geo, key=key, origin=volume.origin,
                              resolution=volume.resolution,
                              init_value=volume.init_value)
        return layout, rv

    def _volume_from_rows(self, rv: rowvol.RowVolume, layout) -> SceneVolume:
        num, w, key = rowvol.volume_from_rows(rv.geo, rv.key, layout,
                                              impl=self.rows_impl)
        return SceneVolume(num=num, weights=w, semkey=key,
                           origin=rv.origin, resolution=rv.resolution,
                           init_value=rv.init_value)

    # jitted host-level conversions for row-state carrying (fuse_many):
    # the slot state is bit-exactly equivalent to the canonical state
    # under further integration (reconcile is linear; adding the comp-0
    # repack's zeros is IEEE-exact), so chunks can chain on the row form
    # and materialise only when the database is read.
    def _enter_rows_impl(self, layout, volume: SceneVolume):
        geo, key = rowvol.rows_from_volume(volume.num, volume.weights,
                                           volume.semkey, layout,
                                           geo_dtype=self.geo_dtype)
        return rowvol.RowVolume(geo=geo, key=key, origin=volume.origin,
                                resolution=volume.resolution,
                                init_value=volume.init_value)

    # NOT donated: the database keeps its SceneVolume alive (reset() /
    # eval paths may still touch it while the row state is carried)
    _enter_rows = functools.partial(jax.jit,
                                    static_argnums=(0, 1))(_enter_rows_impl)

    def _exit_rows_impl(self, layout, rv: rowvol.RowVolume) -> SceneVolume:
        return self._volume_from_rows(rv, layout)

    # The donation here always triggers XLA's "donated buffers were not
    # usable" warning: geo/key can never alias the differently-shaped
    # canonical outputs. It is still load-bearing -- it invalidates the
    # caller's row-state references so the ~4.3 GB slot state (448^3)
    # frees as soon as the exit reconcile is done, instead of surviving
    # in rowstate dicts while the canonical volume materialises.
    _exit_rows = functools.partial(jax.jit, static_argnums=(0, 1),
                                   donate_argnums=(2,))(_exit_rows_impl)

    # non-donating variant: materialise a SceneVolume view while KEEPING
    # the row state (mid-stream evals in row-carrying trainers)
    _peek_rows = functools.partial(jax.jit,
                                   static_argnums=(0, 1))(_exit_rows_impl)

    def _new_stream(self, layout, rv: rowvol.RowVolume) -> RowStream:
        """Fresh streaming state: an all-dirty mask over a zero shadow,
        so the first frame of the stream rebuilds every tile (= a full
        build). With the carry disabled the shadow/dirty slots are None
        and every frame rebuilds fully."""
        if not self.dirty_shadow:
            return RowStream(rv, None, None)
        _, NJ = rowvol.shadow_tiling(layout)
        nt = layout.X * NJ
        shadow = jnp.zeros((layout.shadow_rows, 128), jnp.uint32)
        dirty = jnp.concatenate([jnp.ones((nt,), jnp.int32),
                                 jnp.zeros((1,), jnp.int32)])
        return RowStream(rv, shadow, dirty)

    @staticmethod
    def _drop_carry(stream: RowStream) -> rowvol.RowVolume:
        """Free the dead dirty-shadow carry before an exit
        materialisation. The carried shadow is 1.4 GB at 448^3 and unused
        once the stream ends; HBM headroom during the exit reconcile is
        tight (the exit OOMs with it alive, /tmp/bench_head.log). Blocks
        on the slot state first so the deletes land after the last chunk
        completes."""
        if stream.shadow is not None:
            # scalar readback, not block_until_ready: the axon relay's
            # block_until_ready returns before enqueued work completes
            # (CLAUDE.md), and deleting a buffer a pending program reads
            # must wait for the real completion
            float(stream.rv.geo[0, 0])
            stream.shadow.delete()
            stream.dirty.delete()
        return stream.rv

    @staticmethod
    def _reset_stream(stream: RowStream) -> RowStream:
        """Zero the scene state mid-scan (training resets): a zero geo
        state's shadow is all-zero bits (pack16_numw(0, 0) == 0), so the
        carried shadow resets to zeros with a CLEAN dirty mask -- no
        rebuild needed on the next frame for reset tiles."""
        rv = stream.rv._replace(geo=jnp.zeros_like(stream.rv.geo),
                                key=jnp.zeros_like(stream.rv.key))
        if stream.shadow is None:
            return RowStream(rv, None, None)
        return RowStream(rv, jnp.zeros_like(stream.shadow),
                         jnp.zeros_like(stream.dirty))

    def _row_frontend(self, layout, rv: rowvol.RowVolume, frame,
                      seg_params, stop_sem_grad: bool = False,
                      shadow_carry=None):
        """Shared row-path front end: semantic prediction, ray sampling,
        shadow build + extraction, fusion-net input packing. Everything
        here is constant w.r.t. the fusion params (extraction feeds the
        net and the loss as data), so the training step keeps it outside
        the autodiff trace.

        ``shadow_carry`` is the optional ``(prev_shadow, dirty)`` pair
        from the LAST processed frame (RowStream): when given, only the
        dirty tiles are rebuilt and the returned carry ``(shadow,
        new_dirty)`` feeds the next frame; when None a full rebuild runs
        and the returned carry is None."""
        depth = frame["depth"]
        filtered = jnp.where(frame["mask"], depth, 0.0)

        if self.semantics:
            sem_ids, scores = self._frame_semantics(
                frame, seg_params, stop_grad=stop_sem_grad)
        else:
            sem_ids = scores = None

        points_w = geometry.unproject(depth, frame["extrinsics"],
                                      frame["intrinsics"])
        eye_w = frame["extrinsics"][:3, 3].astype(jnp.float32)
        points_v, _ = geometry.sample_ray_points(
            points_w, eye_w, rv.origin, rv.resolution, self.n_points)
        cr = rowvol.corner_rows(points_v, layout)
        if shadow_carry is not None:
            prev_shadow, dirty = shadow_carry
            shadow = rowvol.build_shadow_dirty(rv.geo, prev_shadow, dirty,
                                               layout, impl=self.rows_impl)
            # tail slice only: the integrate scatters use
            # cr.*rows[:, :, :t] and corner_rows is pointwise, so tiles
            # touched by samples beyond the tail are never written --
            # masking on the tail keeps the bit-level conservativeness
            # guarantee while marking fewer tiles dirty
            new_carry = (shadow, rowvol.dirty_tile_mask(
                points_v[:, :self.n_tail_points], layout))
        else:
            shadow = rowvol.build_shadow(rv.geo, layout,
                                         impl=self.rows_impl)
            new_carry = None
        fv, fw = rowvol.extract_rows(shadow, cr, self.init_value,
                                     geometry.INVALID_TSDF_FILL)

        h, w = depth.shape
        inputs = {
            "tsdf_values": fv.reshape(1, h, w, self.n_points),
            "tsdf_weights": fw.reshape(1, h, w, self.n_points),
            "tsdf_frame": depth.reshape(1, h, w, 1),
        }
        if self.use_semantics:
            sem = (1.0 + sem_ids.reshape(depth.shape).astype(jnp.float32)
                   ) / self.n_classes
            inputs["semantic_frame"] = sem.reshape(1, h, w, 1)
        return cr, fv, fw, inputs, sem_ids, scores, filtered, new_carry

    def step_fuse_rows_impl(self, params_and_stats, layout,
                            rv: rowvol.RowVolume, frame, seg_params,
                            shadow_carry=None, do_sem=None):
        """Inference step over the row-layout state: 2 row gathers + 1
        512-lane scatter-add + 1 256-lane scatter-max per (ray, sample)
        replace the flat path's 8/16/8 scalar random accesses. Same
        pipeline semantics as :meth:`step_fuse_impl`. Returns
        ``(new_rv, new_shadow_carry)`` (carry None iff ``shadow_carry``
        was None -- see :meth:`_row_frontend`). ``do_sem`` is the
        optional traced semantic-decimation gate (sequence scans pass
        ``frame_idx % sem_every == 0`` when SETTINGS.sem_integrate_every
        > 1)."""
        params, batch_stats = params_and_stats
        cr, _, _, inputs, sem_ids, scores, filtered, new_carry = \
            self._row_frontend(layout, rv, frame, seg_params,
                               shadow_carry=shadow_carry)
        tsdf_est, _ = self._network_estimate(params, batch_stats, inputs,
                                             train=False, rng=None)

        t = self.n_tail_points
        upd_values = jnp.clip(tsdf_est[0, :, :t], -self.init_value,
                              self.init_value)
        ray_mask = filtered.reshape(-1) != 0.0
        sem_key = (integ.pack_semantic_key(scores, sem_ids)
                   if self.semantics else None)
        new_geo, new_key = rowvol.integrate_rows(
            rv.geo, rv.key, cr, upd_values, sem_key, ray_mask, t,
            do_sem=do_sem)
        return rv._replace(geo=new_geo, key=new_key), new_carry

    # -- frame-block path (SETTINGS.frame_block > 1) ---------------------------

    def _block_semantics(self, frames, seg_params):
        """Block-batched (sem_ids, scores), each (k, h*w): pre-pass
        values when attached, else a vmapped segmenter forward / gt."""
        if "sem_ids_pre" in frames:
            return frames["sem_ids_pre"], frames["sem_scores_pre"]
        if self.semantic_strategy == "predict":
            return jax.vmap(lambda im, d: self._predict_semantics(
                seg_params, im, d))(frames["image"], frames["depth_input"])
        k = frames["depth"].shape[0]
        sem_ids = frames["semantic_gt"].reshape(k, -1).astype(jnp.uint8)
        return sem_ids, jnp.ones_like(sem_ids, jnp.float32)

    def _network_estimate_batch(self, params, batch_stats, inputs):
        """(k, h, w, C) NHWC inputs -> (k, h*w, n_points) inference
        estimates. The fused executor maps over the block (its
        dot_generals batch on the MXU); the Flax module takes the block
        as its native NHWC batch."""
        if isinstance(params, dict) and "meta" in params:
            from ..models import fusionnet_fast as ff
            est = jax.vmap(lambda inp: ff.apply_v3(
                params, inp, dtype=self.fused_dtype,
                conv3x3=self.fused_conv3x3))(inputs)   # (k, 1, h*w, p)
            return est[:, 0, :, : self.n_points]
        out = self.fusion_net.apply(
            {"params": params, "batch_stats": batch_stats}, inputs,
            train=False)
        b, h, w, _ = out.shape
        return out[..., : self.n_points].reshape(b, h * w, self.n_points)

    def step_fuse_rows_block_impl(self, params_and_stats, layout,
                                  rv: rowvol.RowVolume, frames, seg_params,
                                  shadow_carry=None, do_sem=None):
        """k-frame block inference step: ``frames`` leaves have a leading
        block axis (k, ...). Every frame extracts against the SAME
        pre-block slot state (one shadow build), the nets run batched
        over the block, and the block's k*n rays integrate through ONE
        geo scatter-add + ONE key scatter-max -- the scatters' fixed
        full-state pass (PERFORMANCE.md) is paid once per block instead
        of once per frame. The integration itself is the exact
        commutative sum/max of all k frames' updates; the approximation
        is only that frame i's fusion-net inputs miss frames 0..i-1 of
        its own block (quantified: tools/run_quality_demo.py). Replaces
        the per-frame recurrence of :meth:`step_fuse_rows_impl`
        (reference modules/pipeline.py:173-248) when
        SETTINGS.frame_block > 1."""
        params, batch_stats = params_and_stats
        depth = frames["depth"]                        # (k, h, w)
        k, h, w = depth.shape
        n = h * w
        filtered = jnp.where(frames["mask"], depth, 0.0)

        if self.semantics:
            sem_ids, scores = self._block_semantics(frames, seg_params)
        else:
            sem_ids = scores = None

        points_w = jax.vmap(geometry.unproject)(
            depth, frames["extrinsics"], frames["intrinsics"])
        eyes = frames["extrinsics"][:, :3, 3].astype(jnp.float32)
        points_v, _ = jax.vmap(
            lambda pw, eye: geometry.sample_ray_points(
                pw, eye, rv.origin, rv.resolution, self.n_points)
        )(points_w, eyes)
        points_v = points_v.reshape(k * n, self.n_points, 3)
        cr = rowvol.corner_rows(points_v, layout)

        if shadow_carry is not None:
            prev_shadow, dirty = shadow_carry
            shadow = rowvol.build_shadow_dirty(rv.geo, prev_shadow, dirty,
                                               layout, impl=self.rows_impl)
            new_carry = (shadow, rowvol.dirty_tile_mask(
                points_v[:, :self.n_tail_points], layout))
        else:
            shadow = rowvol.build_shadow(rv.geo, layout,
                                         impl=self.rows_impl)
            new_carry = None
        fv, fw = rowvol.extract_rows(shadow, cr, self.init_value,
                                     geometry.INVALID_TSDF_FILL)

        inputs = {
            "tsdf_values": fv.reshape(k, h, w, self.n_points),
            "tsdf_weights": fw.reshape(k, h, w, self.n_points),
            "tsdf_frame": depth.reshape(k, h, w, 1),
        }
        if self.use_semantics:
            sem = (1.0 + sem_ids.astype(jnp.float32)) / self.n_classes
            inputs["semantic_frame"] = sem.reshape(k, h, w, 1)
        tsdf_est = self._network_estimate_batch(params, batch_stats,
                                                inputs)   # (k, n, p)

        t = self.n_tail_points
        upd_values = jnp.clip(tsdf_est[..., :t], -self.init_value,
                              self.init_value).reshape(k * n, t)
        ray_mask = filtered.reshape(-1) != 0.0
        sem_key = (integ.pack_semantic_key(scores.reshape(-1),
                                           sem_ids.reshape(-1))
                   if self.semantics else None)
        new_geo, new_key = rowvol.integrate_rows(
            rv.geo, rv.key, cr, upd_values, sem_key, ray_mask, t,
            do_sem=do_sem)
        return rv._replace(geo=new_geo, key=new_key), new_carry

    def step_train_rows_impl(self, params, batch_stats, layout,
                             rv: rowvol.RowVolume, gt_shadow, frame,
                             seg_params, rng, shadow_carry=None):
        """Training step over the row-layout state -- the slot-layout
        port of :meth:`step_train_impl` (reference Pipeline.fuse_training,
        modules/pipeline.py:251-363). The gt target extraction reads a
        pre-packed CONSTANT gt shadow (rowvol.shadow_from_canonical with
        w = 1, built once per chunk), so the per-frame cost is one extra
        128-lane gather per (ray, sample, x-corner). Gradients flow only
        through the FusionNet forward: extraction/shadow (incl. the
        Pallas kernel) stay outside the autodiff trace, and the volume
        update integrates stop_gradient'ed estimates (truncated BPTT
        length 1, reference modules/pipeline.py:360-361). Returns
        ``(loss, grads, new_rv, new_stats, new_shadow_carry)``."""
        cr, fv, fw, inputs, _, _, filtered, new_carry = self._row_frontend(
            layout, rv, frame, seg_params, stop_sem_grad=True,
            shadow_carry=shadow_carry)
        # gt fusion_values: the shadow packs (bf16(gt) | bf16(1.0)), so
        # extract_rows returns bf16-rounded gt values -- the documented
        # 16-bit gather precision of the row path (vs the flat path's f32
        # gt reads; bf16 keeps sign(gt) exact for the cosine loss term).
        gv, _ = rowvol.extract_rows(gt_shadow, cr, self.init_value,
                                    geometry.INVALID_TSDF_FILL)
        ray_mask = filtered.reshape(-1) != 0.0

        from ..utils.losses import fusion_loss
        loss_cfg = self.config.TRAINING.loss

        def loss_fn(p):
            tsdf_est, new_stats = self._network_estimate(
                p, batch_stats, inputs, train=True, rng=rng)
            tsdf_fused = _fused_for_loss(fv, fw, tsdf_est, self.init_value)
            tsdf_target = gv[None, :, : self.n_points]
            loss = fusion_loss(tsdf_fused, tsdf_target, ray_mask[None],
                               w_l1=float(loss_cfg.w_l1),
                               w_l2=float(loss_cfg.w_l2),
                               w_cos=float(loss_cfg.w_cos))
            return loss, (tsdf_est, new_stats)

        (loss, (tsdf_est, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        tsdf_est = jax.lax.stop_gradient(tsdf_est)
        t = self.n_tail_points
        upd_values = jnp.clip(tsdf_est[0, :, :t], -self.init_value,
                              self.init_value)
        # semantics not updated during training (reference test=False,
        # modules/pipeline.py:350-357)
        new_geo, new_key = rowvol.integrate_rows(
            rv.geo, rv.key, cr, upd_values, None, ray_mask, t)
        return (loss, grads, rv._replace(geo=new_geo, key=new_key),
                new_stats, new_carry)

    def step_train_impl(self, params, batch_stats, volume: SceneVolume,
                        gt_tsdf, frame, seg_params, rng
                        ) -> Tuple[jnp.ndarray, Any, SceneVolume, Any]:
        """Training step, un-jitted (reference Pipeline.fuse_training,
        modules/pipeline.py:251-363 + train_fusion.py:166-175): returns
        (loss, grads, new_volume, new_batch_stats). The volume update is
        detached from the autodiff trace (truncated BPTT length 1)."""
        depth = frame["depth"]
        filtered = jnp.where(frame["mask"], depth, 0.0)

        if self.semantics:
            sem_ids, scores = self._frame_semantics(frame, seg_params,
                                                    stop_grad=True)
        else:
            sem_ids = scores = None

        values = self._extract(depth, frame["extrinsics"],
                               frame["intrinsics"], volume)
        values_gt = self._extract_gt(depth, frame["extrinsics"],
                                     frame["intrinsics"], gt_tsdf, volume)
        sem_img = (sem_ids.reshape(depth.shape)
                   if self.use_semantics else None)
        inputs = _prepare_fusion_input(depth, values, sem_img,
                                       self.n_points, self.n_classes,
                                       self.use_semantics)
        ray_mask = filtered.reshape(-1) != 0.0

        from ..utils.losses import fusion_loss
        loss_cfg = self.config.TRAINING.loss

        def loss_fn(p):
            tsdf_est, new_stats = self._network_estimate(
                p, batch_stats, inputs, train=True, rng=rng)
            tsdf_fused = _fused_for_loss(values.fusion_values,
                                         values.fusion_weights, tsdf_est,
                                         self.init_value)
            tsdf_target = values_gt.fusion_values[None, :, : self.n_points]
            loss = fusion_loss(tsdf_fused, tsdf_target, ray_mask[None],
                               w_l1=float(loss_cfg.w_l1),
                               w_l2=float(loss_cfg.w_l2),
                               w_cos=float(loss_cfg.w_cos))
            return loss, (tsdf_est, new_stats)

        (loss, (tsdf_est, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        # integrate detached estimates (reference .detach() write-back,
        # modules/pipeline.py:360-361; semantics not updated during training
        # for speed, modules/pipeline.py:350-357 test=False)
        tsdf_est = jax.lax.stop_gradient(tsdf_est)
        upd_values, upd_idx, upd_weights, ray_mask2 = \
            self._volume_update_args(values, tsdf_est, filtered)
        new_num, new_w = self._integrate_geo(volume, upd_values, upd_idx,
                                             upd_weights, ray_mask2)
        new_volume = SceneVolume(num=new_num, weights=new_w,
                                 semkey=volume.semkey,
                                 origin=volume.origin,
                                 resolution=volume.resolution,
                                 init_value=volume.init_value)
        return loss, grads, new_volume, new_stats

    # jitted entry points with donated volume buffers (the in-place HBM
    # update; self is a static arg -- one cache entry per Pipeline)
    _step_fuse = functools.partial(jax.jit, static_argnums=(0,),
                                   donate_argnums=(2,))(step_fuse_impl)
    _step_train = functools.partial(jax.jit, static_argnums=(0,),
                                    donate_argnums=(3,))(step_train_impl)

    def fuse_sequence_impl(self, params_and_stats, volume: SceneVolume,
                           frames: Dict[str, jnp.ndarray],
                           seg_params) -> SceneVolume:
        """Fuse a whole frame sequence device-side with ``lax.scan``.

        ``frames`` is the per-frame dict with a leading time axis (T, ...).
        One XLA program fuses all T frames -- the recurrent volume state
        never leaves HBM and there is a single host dispatch for the whole
        stream (the reference's per-frame Python loop, train_fusion.py:145,
        pays a host round-trip per frame). This is the production serving
        path for pre-staged frame batches.

        On the row path the canonical<->row conversions happen ONCE at
        the chunk boundaries; the scan carries the split row state (plus
        the dirty-shadow carry: only the tiles the previous frame's
        integration touched are rebuilt), so the per-frame cost is pure
        row gathers/scatters.
        """
        if self.row_path:
            layout, rv = self._rows_from_volume(volume)
            stream = self.fuse_sequence_rows_impl(
                layout, params_and_stats, self._new_stream(layout, rv),
                frames, seg_params)
            return self._volume_from_rows(stream.rv, layout)

        frames = self._sem_prepass_frames(frames, seg_params,
                                          need_sem=self.semantics)

        def body(vol, frame):
            return self.step_fuse_impl(params_and_stats, vol, frame,
                                       seg_params), None

        new_volume, _ = jax.lax.scan(body, volume, frames)
        return new_volume

    fuse_sequence = functools.partial(jax.jit, static_argnums=(0,),
                                      donate_argnums=(2,))(fuse_sequence_impl)

    def fuse_sequence_rows_impl(self, layout, params_and_stats,
                                stream: RowStream, frames,
                                seg_params) -> RowStream:
        """Row-state-to-row-state sequence fusion: like
        :meth:`fuse_sequence` but the canonical<->slot conversions stay
        OUTSIDE -- callers that stream many chunks (fuse_many, benches)
        carry the RowStream (slot state + dirty-shadow carry, see
        :meth:`_new_stream`) across chunk boundaries and materialise a
        SceneVolume only when the database is actually read (the entry
        scatter + exit reconciles cost ~130 ms per boundary at 448^3,
        tools/profile_trace.py)."""
        frames = self._sem_prepass_frames(frames, seg_params,
                                          need_sem=self.semantics)
        decimate = self.semantics and self.sem_every > 1
        T = jax.tree_util.tree_leaves(frames)[0].shape[0]

        kb = self.frame_block
        if kb > 1:
            # frame-block path: scan over ceil(T/kb) k-frame blocks
            # (step_fuse_rows_block_impl). The tail pads with all-masked
            # copies of the last frame -- weight-0 / key-0 no-op
            # integrations, exactly like fuse_many's chunk padding.
            pad = (-T) % kb
            if pad:
                frames = dict(frames)
                for key in frames:
                    x = frames[key]
                    frames[key] = jnp.concatenate(
                        [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
                frames["mask"] = frames["mask"].at[T:].set(False)
            nb = (T + pad) // kb
            frames = jax.tree_util.tree_map(
                lambda x: x.reshape((nb, kb) + x.shape[1:]), frames)
            bidxs = jnp.arange(nb, dtype=jnp.int32)

            def block_body(stream, xs):
                frames_k, idx = xs
                carry = (None if stream.shadow is None
                         else (stream.shadow, stream.dirty))
                do_sem = (idx % self.sem_every == 0) if decimate else None
                rv, carry = self.step_fuse_rows_block_impl(
                    params_and_stats, layout, stream.rv, frames_k,
                    seg_params, shadow_carry=carry, do_sem=do_sem)
                if carry is None:
                    return RowStream(rv, None, None), None
                return RowStream(rv, carry[0], carry[1]), None

            stream, _ = jax.lax.scan(block_body, stream, (frames, bidxs))
            return stream

        # per-chunk phase: frame 0 of every chunk integrates semantics,
        # so the decimation rate holds across fuse_many chunk boundaries
        # without a cross-chunk counter in the carry
        idxs = jnp.arange(T, dtype=jnp.int32)

        def row_body(stream, xs):
            frame, idx = xs
            carry = (None if stream.shadow is None
                     else (stream.shadow, stream.dirty))
            do_sem = (idx % self.sem_every == 0) if decimate else None
            rv, carry = self.step_fuse_rows_impl(
                params_and_stats, layout, stream.rv, frame, seg_params,
                shadow_carry=carry, do_sem=do_sem)
            if carry is None:
                return RowStream(rv, None, None), None
            return RowStream(rv, carry[0], carry[1]), None

        stream, _ = jax.lax.scan(row_body, stream, (frames, idxs))
        return stream

    fuse_sequence_rows = functools.partial(
        jax.jit, static_argnums=(0, 1),
        donate_argnums=(3,))(fuse_sequence_rows_impl)

    # -- host-facing API (reference signatures) ---------------------------------

    @staticmethod
    def _frame_from_batch(batch, input_key: str, xp=jnp):
        """Host batch dict (leading batch dim 1) -> frame dict.

        ``xp=jnp`` (default) produces device arrays for immediate single-
        frame use; ``xp=np`` keeps the frame on the host -- the chunked
        streaming paths buffer HOST frames and ship each chunk as ONE
        stacked transfer per field (per-array device_put through the
        relay costs 25-50 ms dispatch each; see fuse_many)."""
        def squeeze(x):
            x = xp.asarray(x)
            return x[0] if x.ndim and x.shape[0] == 1 else x

        f32 = xp.float32
        frame = {
            "depth": squeeze(batch[input_key]).astype(f32),
            "extrinsics": squeeze(batch["extrinsics"]).astype(f32),
            "intrinsics": squeeze(batch["intrinsics"]).astype(f32),
            "mask": squeeze(batch["mask"]),
        }
        if "image" in batch:
            frame["image"] = squeeze(batch["image"]).astype(f32)
            frame["depth_input"] = frame["depth"]
        if "semantic_gt" in batch:
            frame["semantic_gt"] = squeeze(batch["semantic_gt"])
        return frame

    @staticmethod
    def _stack_host_frames(frames):
        """Stack a list of HOST frame dicts to one (T, ...) device batch:
        one np.stack + jnp.asarray per field (a single async H2D transfer
        each, issued while earlier device work is still running)."""
        import numpy as np
        return {k: jnp.asarray(np.stack([f[k] for f in frames]))
                for k in frames[0]}

    def train_sequence_impl(self, params, batch_stats, volume: SceneVolume,
                            gt_tsdf, frames, seg_params, rngs, reset_flags):
        """Train over a frame chunk with one ``lax.scan``: per-frame grads
        are accumulated by SUM (the reference's accumulation_steps
        semantics -- torch .backward() sums into .grad,
        train_fusion.py:182-189), the volume and BN stats carry through,
        and per-frame random resets (reference train_fusion.py:159-163)
        apply via lax.cond on host-provided flags.

        Returns (loss_sum, grad_sum, new_volume, new_batch_stats).

        On the row path the scan carries the slot state (one
        canonical<->row conversion per chunk) and the gt target volume is
        pre-packed once into a constant shadow -- the same per-frame
        row-op costs as inference plus the net backward.
        """
        if self.row_path:
            layout, rv = self._rows_from_volume(volume)
            gt_shadow = self._gt_shadow_impl(layout, gt_tsdf)
            loss_sum, grad_sum, stream, stats = \
                self.train_sequence_rows_impl(
                    layout, params, batch_stats,
                    self._new_stream(layout, rv), gt_shadow, frames,
                    seg_params, rngs, reset_flags)
            return (loss_sum, grad_sum,
                    self._volume_from_rows(stream.rv, layout), stats)

        grad_zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        frames = self._sem_prepass_frames(
            frames, seg_params,
            need_sem=self.semantics and self.use_semantics)

        def body(carry, inp):
            volume, stats, grad_acc, loss_acc = carry
            frame, rng, reset = inp
            volume = jax.lax.cond(reset, lambda v: v.reset(), lambda v: v,
                                  volume)
            loss, grads, volume, stats = self.step_train_impl(
                params, stats, volume, gt_tsdf, frame, seg_params, rng)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return (volume, stats, grad_acc, loss_acc + loss), None

        (volume, stats, grad_sum, loss_sum), _ = jax.lax.scan(
            body, (volume, batch_stats, grad_zero, jnp.float32(0.0)),
            (frames, rngs, reset_flags))
        return loss_sum, grad_sum, volume, stats

    train_sequence = functools.partial(jax.jit, static_argnums=(0,),
                                       donate_argnums=(3,))(
                                           train_sequence_impl)

    def _gt_shadow_impl(self, layout, gt_tsdf):
        """Pack a gt value volume into a constant target shadow (w = 1);
        built once per scene and cached by row-carrying trainers."""
        return rowvol.shadow_from_canonical(
            gt_tsdf.astype(jnp.float32),
            jnp.ones_like(gt_tsdf, jnp.float32), layout)

    _gt_shadow = functools.partial(jax.jit, static_argnums=(0, 1))(
        _gt_shadow_impl)

    def train_sequence_rows_impl(self, layout, params, batch_stats,
                                 stream: RowStream, gt_shadow, frames,
                                 seg_params, rngs, reset_flags):
        """Row-state-to-row-state :meth:`train_sequence`: the slot state
        (a RowStream -- slot volume + dirty-shadow carry) and the packed
        gt shadow stay OUTSIDE, so chunked trainers carry them across
        optimizer steps and skip the per-chunk canonical<->slot
        conversions (train_fusion.py row-carry)."""
        grad_zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        frames = self._sem_prepass_frames(
            frames, seg_params,
            need_sem=self.semantics and self.use_semantics)

        def row_body(carry, inp):
            stream, stats, grad_acc, loss_acc = carry
            frame, rng, reset = inp
            stream = jax.lax.cond(reset, self._reset_stream,
                                  lambda s: s, stream)
            sc = (None if stream.shadow is None
                  else (stream.shadow, stream.dirty))
            loss, grads, rv, stats, sc = self.step_train_rows_impl(
                params, stats, layout, stream.rv, gt_shadow, frame,
                seg_params, rng, shadow_carry=sc)
            stream = (RowStream(rv, None, None) if sc is None
                      else RowStream(rv, sc[0], sc[1]))
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return (stream, stats, grad_acc, loss_acc + loss), None

        (stream, stats, grad_sum, loss_sum), _ = jax.lax.scan(
            row_body, (stream, batch_stats, grad_zero, jnp.float32(0.0)),
            (frames, rngs, reset_flags))
        return loss_sum, grad_sum, stream, stats

    train_sequence_rows = functools.partial(
        jax.jit, static_argnums=(0, 1),
        donate_argnums=(4,))(train_sequence_rows_impl)

    def fuse_many(self, batches, database, params, batch_stats,
                  seg_params=None, chunk: int = 16,
                  max_live_scenes: Optional[int] = None):
        """Stream a list/iterator of host batches through chunked
        ``fuse_sequence`` calls: frames are buffered PER SCENE and each
        scene's buffer is flushed as one fixed-size chunk (tail-padded
        with all-masked no-op frames to keep shapes static) -- one device
        dispatch per chunk. Per-scene buffering keeps the chunk size (and
        thus the dispatch amortisation) intact under interleaved frame
        orderings: Replica ``hybrid`` with load_scenes_at_once>1 and
        ScanNet ``max_depth_diversity`` interleave scenes per-frame, which
        would otherwise collapse chunks to length ~1 (PERFORMANCE.md's
        per-frame dispatch failure mode). Within a scene arrival order is
        preserved, so the result is bit-identical to per-frame
        :meth:`fuse` calls.

        Host IO overlaps the device scan: frames are buffered as HOST
        numpy arrays and each chunk ships as one stacked async H2D
        transfer per field immediately followed by the (async) scan
        dispatch -- the loop returns to decoding the next frames while
        the device is still fusing the previous chunk (nothing blocks
        until a result is read back).

        On the row path the per-scene state is carried ACROSS chunks in
        slot form (fuse_sequence_rows) and materialised back into the
        database once at the end -- the canonical<->slot conversions
        (~130 ms per boundary at 448^3) are paid once per scene instead
        of once per chunk. Equivalent to per-frame :meth:`fuse` up to f32
        re-association of the boundary reconciles (semantic keys exact).

        ``max_live_scenes`` (default SETTINGS.max_live_row_scenes, 1)
        bounds HBM: a live row-carried scene holds slot state + shadow
        (~5.7 GB at 448^3) next to its canonical database volume, so
        interleaved multi-scene streams must not accumulate carries for
        every scene. Least-recently-flushed scenes are materialised back
        to the database and re-entered if more frames arrive (a
        ~130 ms/boundary cost that only interleaved orderings pay)."""
        import numpy as np
        params, batch_stats = self.prepare_params(params, batch_stats)
        if max_live_scenes is None:
            max_live_scenes = int(self.config.SETTINGS.get(
                "max_live_row_scenes", 1))
        pending: Dict[str, list] = {}
        rowstate: Dict[str, tuple] = {}   # insertion-ordered: LRU first

        def evict(scene_id: str):
            layout, stream = rowstate.pop(scene_id)
            database.update(scene_id,
                            self._exit_rows(layout,
                                            self._drop_carry(stream)))

        def flush(scene_id: str):
            frames = pending.pop(scene_id, [])
            if not frames:
                return
            n = len(frames)
            if n < chunk:  # pad with no-op frames (mask all False)
                pad = dict(frames[-1])
                pad["mask"] = np.zeros_like(frames[-1]["mask"])
                frames = frames + [pad] * (chunk - n)
            stacked = self._stack_host_frames(frames)
            if self.row_path:
                if scene_id not in rowstate:
                    while len(rowstate) >= max(1, max_live_scenes):
                        evict(next(iter(rowstate)))
                    volume = database.volumes[scene_id]
                    layout = rowvol.RowLayout.for_shape(
                        tuple(volume.num.shape))
                    rowstate[scene_id] = (layout, self._new_stream(
                        layout, self._enter_rows(layout, volume)))
                layout, stream = rowstate.pop(scene_id)  # re-insert last
                stream = self.fuse_sequence_rows(
                    layout, (params, batch_stats), stream, stacked,
                    seg_params)
                rowstate[scene_id] = (layout, stream)
            else:
                volume = database.volumes[scene_id]
                new_volume = self.fuse_sequence((params, batch_stats),
                                                volume, stacked,
                                                seg_params)
                database.update(scene_id, new_volume)

        for batch in batches:
            if not np.all(np.isfinite(np.asarray(batch["extrinsics"]))):
                continue
            scene_id = self._scene_of(batch)
            pending.setdefault(scene_id, []).append(
                self._frame_from_batch(batch, self.config.DATA.input,
                                       xp=np))
            if len(pending[scene_id]) == chunk:
                flush(scene_id)
        for scene_id in list(pending):
            flush(scene_id)
        for scene_id in list(rowstate):
            evict(scene_id)

    def fuse(self, batch, database, params, batch_stats, seg_params=None):
        """Online inference on one frame; updates the database in place
        (reference Pipeline.fuse, modules/pipeline.py:173-248).

        Parity API: each call pays the full canonical<->slot conversion
        (~the price of several fused frames at 448^3). For streams of
        frames use :meth:`fuse_many`, which carries the slot/row state
        across calls per scene and converts once per scene."""
        scene_id = self._scene_of(batch)
        frame = self._frame_from_batch(batch, self.config.DATA.input)
        volume = database.volumes[scene_id]
        new_volume = self._step_fuse(self.prepare_params(params,
                                                         batch_stats),
                                     volume, frame, seg_params)
        database.update(scene_id, new_volume)

    def fuse_training(self, batch, database, params, batch_stats,
                      seg_params=None, rng=None):
        """One training frame: returns (loss, grads, new_batch_stats) and
        updates the database (reference Pipeline.fuse_training,
        modules/pipeline.py:251-363)."""
        scene_id = self._scene_of(batch)
        frame = self._frame_from_batch(batch, self.config.DATA.input)
        volume = database.volumes[scene_id]
        gt = database.scenes_gt[scene_id]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        loss, grads, new_volume, new_stats = self._step_train(
            params, batch_stats, volume, gt, frame, seg_params, rng)
        database.update(scene_id, new_volume)
        return loss, grads, new_stats

    @staticmethod
    def _scene_of(batch) -> str:
        fid = batch["frame_id"]
        if isinstance(fid, (list, tuple)):
            fid = fid[0]
        return str(fid).split("/", 1)[0]
