"""Convert reference PyTorch checkpoints into this framework's params.

The reference ships `.pth.tar` torch checkpoints (reference
utils/saving.py:67-91). This converter maps a torch ``state_dict`` onto the
Flax parameter/batch-stats trees by **execution order with shape checking**:
both the reference FusionNet family and this build apply their conv/BN
layers in the same sequence (construction order == execution order for
these architectures), so flattening both sides in order and pairing
conv<->Conv and BN<->BatchNorm entries gives an exact 1:1 mapping without a
hand-written name table. Conv kernels are transposed OIHW -> HWIO.

Covers FusionNet v1/v2/v3 (reference modules/model.py) via pure order
matching. AdapNet++ registers skip convs out of execution order, so
``convert_adapnet_state_dict`` (below) instead uses an explicit
name-prefix table per submodule; it is parity-tested in
tests/test_adapnet_parity.py. ``convert_resnet50_encoder`` imports a
torchvision resnet50 state_dict into the surgically-modified Encoder
(reference modules/adapnet.py:87-149) for ImageNet-initialised stage-1
training.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["convert_fusionnet_state_dict", "convert_adapnet_state_dict",
           "convert_resnet50_encoder", "load_torch_checkpoint"]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint's model_state as numpy arrays."""
    import torch
    ck = torch.load(path, map_location="cpu", weights_only=False)
    state = ck.get("model_state", ck)
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _natural_key(path: Tuple[str, ...]):
    def piece(s: str):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", s)]
    return [piece(p) for p in path]


def _flatten_flax(tree, prefix=()) -> List[Tuple[Tuple[str, ...], Any]]:
    out = []
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k in tree:
            out.extend(_flatten_flax(tree[k], prefix + (str(k),)))
    else:
        out.append((prefix, tree))
    return out


def _fusionnet_module_order(model_cfg) -> List[tuple]:
    """Flax module path prefixes of a FusionNet in execution order
    (== the reference's construction/state-dict order), as
    ``(prefix_tuple, head_index_or_None)``. For the stacked v3 heads
    (models/fusionnet.py DualHead), the SAME DualHead modules appear
    once per head with the head slice index -- their param leaves carry
    a leading axis of 2."""
    name = model_cfg.get("name", "v3")
    use_sem = bool(model_cfg.get("use_semantics", False))
    if name == "v1":
        return [((f"Block_{i}",), None) for i in range(4)] \
            + [((f"Pred_{i}",), None) for i in range(4)]
    g = int(model_cfg.get("growth_factor", 6)) - 1
    if name == "v2":
        return [((f"Block_{i}",), None) for i in range(g)] \
            + [(("VortexPooling_0",), None), (("VortexPooling_1",), None)] \
            + [((f"Pred_{i}",), None) for i in range(g)]
    # v3: tsdf head, optional semantic head, final vortex, preds
    preds = [((f"Pred_{i}",), None) for i in range(g)]
    if use_sem and model_cfg.get("stack_heads", False):
        head = [(("DualHead_0", f"Block_{i}"),) for i in range(g)] \
            + [(("DualHead_0", "VortexPooling_0"),)]
        return ([(p[0], 0) for p in head] + [(p[0], 1) for p in head]
                + [(("VortexPooling_0",), None)] + preds)
    if use_sem:
        def head(nm):
            return [((nm, f"Block_{i}"), None) for i in range(g)] \
                + [((nm, "VortexPooling_0"), None)]
        return (head("head_tsdf") + head("head_sem")
                + [(("VortexPooling_0",), None)] + preds)
    return [(("FusionHead_0", f"Block_{i}"), None) for i in range(g)] \
        + [(("FusionHead_0", "VortexPooling_0"), None),
           (("VortexPooling_0",), None)] + preds


def _ordered_flax_layers(params, batch_stats, model_cfg):
    """Group flax leaves into (module_path, kind, dict, head) in execution
    order: module path prefixes per the model config, and within each
    module Conv_k followed by BatchNorm_k for ascending k (matching the
    conv->BN interleaving of the reference Sequentials).
    kind: 'conv' (kernel[, bias]) or 'bn' (scale, bias, mean, var);
    head: slice index into a stacked head axis, or None."""
    leaves = _flatten_flax(params)
    stats = dict(_flatten_flax(batch_stats))
    by_module: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for path, leaf in leaves:
        by_module.setdefault(path[:-1], {})[path[-1]] = leaf

    def module_layers(prefix: Tuple[str, ...], head):
        convs = {}
        bns = {}
        for path, entry in by_module.items():
            if path[:len(prefix)] != prefix:
                continue
            idx = int(path[-1].rsplit("_", 1)[1])
            if path[-1].startswith("Conv"):
                convs[idx] = (path, entry)
            elif path[-1].startswith("BatchNorm"):
                e = dict(entry)
                e["mean"] = stats.get(path + ("mean",))
                e["var"] = stats.get(path + ("var",))
                bns[idx] = (path, e)
        out = []
        for k in sorted(set(convs) | set(bns)):
            if k in convs:
                out.append((convs[k][0], "conv", convs[k][1], head))
            if k in bns:
                out.append((bns[k][0], "bn", bns[k][1], head))
        return out

    layers = []
    for prefix, head in _fusionnet_module_order(model_cfg):
        layers.extend(module_layers(prefix, head))
    return layers


def _ordered_torch_layers(state: Dict[str, np.ndarray]):
    """Group torch state-dict entries into (name, kind, dict) preserving
    registration order."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    order: List[str] = []
    for key, val in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        mod, leaf = key.rsplit(".", 1)
        if mod not in groups:
            groups[mod] = {}
            order.append(mod)
        groups[mod][leaf] = val
    layers = []
    for mod in order:
        g = groups[mod]
        if "running_mean" in g:
            layers.append((mod, "bn", g))
        elif "weight" in g and g["weight"].ndim == 4:
            layers.append((mod, "conv", g))
        elif "weight" in g:
            layers.append((mod, "other", g))
    return layers


def convert_fusionnet_state_dict(torch_state: Dict[str, np.ndarray],
                                 flax_params, flax_batch_stats, model_cfg):
    """Map a reference FusionNet torch state_dict onto (params, batch_stats)
    templates. ``model_cfg`` is the FUSION_MODEL config section (needed to
    reconstruct execution order). Raises on any shape mismatch (no silent
    partial loads)."""
    import jax

    flax_layers = _ordered_flax_layers(flax_params, flax_batch_stats,
                                       model_cfg)
    torch_layers = [l for l in _ordered_torch_layers(torch_state)
                    if l[1] in ("conv", "bn")]
    n_f = len(flax_layers)
    n_t = len(torch_layers)
    if n_f != n_t:
        raise ValueError(
            f"layer count mismatch: flax has {n_f}, torch has {n_t} -- "
            "are model config (n_points/growth_factor/use_semantics) equal?")

    new_params = jax.tree_util.tree_map(np.array, flax_params)
    new_stats = jax.tree_util.tree_map(np.array, flax_batch_stats)

    def set_leaf(tree, path, value, head):
        node = tree
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        if head is None:
            if tuple(old.shape) != tuple(value.shape):
                raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                                 f"{old.shape} vs {value.shape}")
            node[path[-1]] = value.astype(old.dtype)
        else:   # stacked head axis (leading dim = n heads)
            if tuple(old.shape[1:]) != tuple(value.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}[{head}]: "
                    f"{old.shape[1:]} vs {value.shape}")
            old[head] = value.astype(old.dtype)

    for (fpath, fkind, fentry, fhead), (tname, tkind, tentry) in zip(
            flax_layers, torch_layers):
        if fkind != tkind:
            raise ValueError(f"layer kind mismatch: {fpath} ({fkind}) vs "
                             f"{tname} ({tkind})")
        if fkind == "conv":
            w = np.transpose(tentry["weight"], (2, 3, 1, 0))  # OIHW->HWIO
            set_leaf(new_params, fpath + ("kernel",), w, fhead)
            if "bias" in fentry and "bias" in tentry:
                set_leaf(new_params, fpath + ("bias",), tentry["bias"],
                         fhead)
        else:
            set_leaf(new_params, fpath + ("scale",), tentry["weight"],
                     fhead)
            set_leaf(new_params, fpath + ("bias",), tentry["bias"], fhead)
            set_leaf(new_stats, fpath + ("mean",), tentry["running_mean"],
                     fhead)
            set_leaf(new_stats, fpath + ("var",), tentry["running_var"],
                     fhead)
    return new_params, new_stats


# ---------------------------------------------------------------------------
# AdapNet++ conversion (explicit name map; the reference encoder registers
# skip convs before the backbone so order-matching cannot work)
# ---------------------------------------------------------------------------

def _encoder_name_map(prefix: str):
    """torch-module-name -> (flax module path, kind) for one Encoder."""
    m = {}

    def bottleneck(t, f):
        m[f"{t}.conv1"] = (f + ("Conv_0",), "conv")
        m[f"{t}.bn1"] = (f + ("BatchNorm_0",), "bn")
        m[f"{t}.conv2"] = (f + ("Conv_1",), "conv")
        m[f"{t}.bn2"] = (f + ("BatchNorm_1",), "bn")
        m[f"{t}.conv3"] = (f + ("Conv_2",), "conv")
        m[f"{t}.bn3"] = (f + ("BatchNorm_2",), "bn")
        m[f"{t}.downsample.0"] = (f + ("downsample_conv",), "conv")
        m[f"{t}.downsample.1"] = (f + ("BatchNorm_3",), "bn")

    def ssma_block(t, f):
        m[f"{t}.conv1"] = (f + ("Conv_0",), "conv")
        m[f"{t}.bn1"] = (f + ("BatchNorm_0",), "bn")
        m[f"{t}.conv2a"] = (f + ("Conv_1",), "conv")
        m[f"{t}.bn2a"] = (f + ("BatchNorm_1",), "bn")
        m[f"{t}.conv2b"] = (f + ("Conv_2",), "conv")
        m[f"{t}.bn2b"] = (f + ("BatchNorm_2",), "bn")
        m[f"{t}.conv3"] = (f + ("Conv_3",), "conv")
        m[f"{t}.bn3"] = (f + ("BatchNorm_3",), "bn")
        m[f"{t}.downsample.0"] = (f + ("downsample_conv",), "conv")
        m[f"{t}.downsample.1"] = (f + ("BatchNorm_4",), "bn")

    r = f"{prefix}.res_n50_enc"
    m[f"{r}.conv1"] = ((prefix, "Conv_0"), "conv")
    m[f"{r}.bn1"] = ((prefix, "BatchNorm_0"), "bn")
    m[f"{prefix}.enc_skip2_conv"] = ((prefix, "Conv_1"), "conv")
    m[f"{prefix}.enc_skip2_conv_bn"] = ((prefix, "BatchNorm_1"), "bn")
    m[f"{prefix}.enc_skip1_conv"] = ((prefix, "Conv_2"), "conv")
    m[f"{prefix}.enc_skip1_conv_bn"] = ((prefix, "BatchNorm_2"), "bn")

    for i in range(3):                        # layer1
        bottleneck(f"{r}.layer1.{i}", (prefix, f"Bottleneck_{i}"))
    for i in range(3):                        # layer2.0-2
        bottleneck(f"{r}.layer2.{i}", (prefix, f"Bottleneck_{3 + i}"))
    ssma_block(f"{r}.layer2.3", (prefix, "BottleneckSSMA_0"))
    for i in range(2):                        # layer3.0-1
        bottleneck(f"{r}.layer3.{i}", (prefix, f"Bottleneck_{6 + i}"))
    for i in range(4):                        # layer3.2-5
        ssma_block(f"{r}.layer3.{2 + i}", (prefix,
                                           f"BottleneckSSMA_{1 + i}"))
    for i in range(3):                        # layer4
        ssma_block(f"{r}.layer4.{i}", (prefix, f"BottleneckSSMA_{5 + i}"))
    return m


def _easpp_name_map(t_prefix: str, f_prefix: str):
    m = {f"{t_prefix}.branch1_conv": ((f_prefix, "Conv_0"), "conv"),
         f"{t_prefix}.branch1_bn": ((f_prefix, "BatchNorm_0"), "bn")}
    for b in range(3):
        seq = f"{t_prefix}.branch234.{b}"
        for slot, (tidx, fidx) in enumerate(
                zip((0, 3, 6, 9), range(1 + 4 * b, 5 + 4 * b))):
            m[f"{seq}.{tidx}"] = ((f_prefix, f"Conv_{fidx}"), "conv")
            m[f"{seq}.{tidx + 1}"] = ((f_prefix, f"BatchNorm_{fidx}"), "bn")
    m[f"{t_prefix}.branch5_conv"] = ((f_prefix, "Conv_13"), "conv")
    # branch5_bn is registered but unused in the reference forward
    m[f"{t_prefix}.eASPP_fin_conv"] = ((f_prefix, "Conv_14"), "conv")
    m[f"{t_prefix}.eASPP_fin_bn"] = ((f_prefix, "BatchNorm_13"), "bn")
    return m


def _decoder_name_map():
    d = "decoder"
    m = {
        f"{d}.deconv1": ((d, "ConvTranspose_0"), "convT"),
        f"{d}.deconv1_bn": ((d, "BatchNorm_0"), "bn"),
        f"{d}.aux_conv1": ((d, "Conv_0"), "conv"),
        f"{d}.aux_conv1_bn": ((d, "BatchNorm_1"), "bn"),
        f"{d}.fuse_conv1": ((d, "fuse_conv1"), "conv"),
        f"{d}.stage2.0": ((d, "Conv_1"), "conv"),
        f"{d}.stage2.1": ((d, "BatchNorm_2"), "bn"),
        f"{d}.stage2.3": ((d, "Conv_2"), "conv"),
        f"{d}.stage2.4": ((d, "BatchNorm_3"), "bn"),
        f"{d}.stage2.6": ((d, "ConvTranspose_1"), "convT"),
        f"{d}.stage2.7": ((d, "BatchNorm_4"), "bn"),
        f"{d}.aux_conv2": ((d, "Conv_3"), "conv"),
        f"{d}.aux_conv2_bn": ((d, "BatchNorm_5"), "bn"),
        f"{d}.fuse_conv2": ((d, "fuse_conv2"), "conv"),
        f"{d}.stage3.0": ((d, "Conv_4"), "conv"),
        f"{d}.stage3.1": ((d, "BatchNorm_6"), "bn"),
        f"{d}.stage3.3": ((d, "Conv_5"), "conv"),
        f"{d}.stage3.4": ((d, "BatchNorm_7"), "bn"),
        f"{d}.stage3.6": ((d, "Conv_6"), "conv"),
        f"{d}.stage3.7": ((d, "BatchNorm_8"), "bn"),
        f"{d}.stage3.8": ((d, "ConvTranspose_2"), "convT"),
        f"{d}.stage3.9": ((d, "BatchNorm_9"), "bn"),
    }
    return m


def _ssma_name_map(t_prefix: str, f_prefix: str):
    return {
        f"{t_prefix}.link.0": ((f_prefix, "Conv_0"), "conv"),
        f"{t_prefix}.link.2": ((f_prefix, "Conv_1"), "conv"),
        f"{t_prefix}.final_conv.0": ((f_prefix, "Conv_2"), "conv"),
        f"{t_prefix}.final_conv.1": ((f_prefix, "BatchNorm_0"), "bn"),
    }


def adapnet_name_map(stage: int):
    """Full torch-module-name -> (flax path, kind) map for AdapNet
    (reference modules/adapnet.py:356-384 construction)."""
    m = {}
    m.update(_encoder_name_map("encoder_mod1"))
    if stage == 1:
        m.update(_easpp_name_map("eASPP", "eASPP"))
    else:
        m.update(_encoder_name_map("encoder_mod2"))
        m.update(_easpp_name_map("eASPP_mod1", "eASPP_mod1"))
        m.update(_easpp_name_map("eASPP_mod2", "eASPP_mod2"))
        m.update(_ssma_name_map("ssma_res", "ssma_res"))
        m.update(_ssma_name_map("ssma_s1", "ssma_s1"))
        m.update(_ssma_name_map("ssma_s2", "ssma_s2"))
    m.update(_decoder_name_map())
    return m


def convert_adapnet_state_dict(torch_state: Dict[str, np.ndarray],
                               flax_params, flax_batch_stats, stage: int):
    """Map a reference AdapNet torch state_dict onto Flax templates.

    Conv kernels OIHW -> HWIO; ConvTranspose kernels (in, out, kH, kW) ->
    flipped HWIO (flax conv_transpose with transpose_kernel=False applies
    the kernel unflipped, torch flips). Unused reference entries
    (branch5_bn, num_batches_tracked) are ignored; any flax leaf without a
    torch source raises.
    """
    import jax

    name_map = adapnet_name_map(stage)
    new_params = jax.tree_util.tree_map(np.asarray, flax_params)
    new_stats = jax.tree_util.tree_map(np.asarray, flax_batch_stats)

    def set_leaf(tree, path, value, required=True):
        node = tree
        for p in path[:-1]:
            if p not in node:
                if required:
                    raise KeyError(f"no flax node {'/'.join(path)}")
                return False
            node = node[p]
        if path[-1] not in node:
            if required:
                raise KeyError(f"no flax leaf {'/'.join(path)}")
            return False
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{old.shape} vs {value.shape}")
        node[path[-1]] = value.astype(old.dtype)
        return True

    assigned = set()

    def assign(tree, path, value):
        if set_leaf(tree, path, value, required=False):
            assigned.add(path)

    for tname, (fpath, kind) in name_map.items():
        w_key = f"{tname}.weight"
        if w_key not in torch_state:
            continue  # e.g. downsample of blocks that have none
        if kind == "conv":
            w = np.transpose(torch_state[w_key], (2, 3, 1, 0))
            assign(new_params, fpath + ("kernel",), w)
            if f"{tname}.bias" in torch_state:
                assign(new_params, fpath + ("bias",),
                       torch_state[f"{tname}.bias"])
        elif kind == "convT":
            # torch (in, out, kH, kW) -> flax (kH, kW, in, out), spatially
            # flipped (torch convtranspose applies the flipped kernel)
            w = np.transpose(torch_state[w_key], (2, 3, 0, 1))
            w = w[::-1, ::-1]
            assign(new_params, fpath + ("kernel",), np.ascontiguousarray(w))
            if f"{tname}.bias" in torch_state:
                assign(new_params, fpath + ("bias",),
                       torch_state[f"{tname}.bias"])
        else:  # bn
            assign(new_params, fpath + ("scale",), torch_state[w_key])
            assign(new_params, fpath + ("bias",),
                   torch_state[f"{tname}.bias"])
            assign(new_stats, fpath + ("mean",),
                   torch_state[f"{tname}.running_mean"])
            assign(new_stats, fpath + ("var",),
                   torch_state[f"{tname}.running_var"])

    # completeness: every flax leaf must have received a torch value
    missing = ["/".join(path) for path, _ in _flatten_flax(new_params)
               if path not in assigned]
    missing += ["/".join(path) for path, _ in _flatten_flax(new_stats)
                if path not in assigned]
    if missing:
        raise KeyError(f"unconverted flax leaves: {missing[:8]}"
                       f"{' ...' if len(missing) > 8 else ''}")
    return new_params, new_stats


# ---------------------------------------------------------------------------
# torchvision ResNet-50 -> Encoder import (ImageNet init for stage-1
# segmentation training, matching the reference's pretrained=True surgery)
# ---------------------------------------------------------------------------

def _resnet50_surviving_map(prefix: str):
    """torchvision-resnet50 state_dict name -> (flax path, kind) for the
    weights that SURVIVE the reference's encoder surgery
    (reference modules/adapnet.py:101-130):

      * layer1.[0-2], layer2.[0-2], layer3.[0-1]: intact bottlenecks
      * layer2.3, layer3.[2-5], layer4.[0-2]: replaced by multi-dilation
        units that keep only the original conv1/bn1 (copy_from,
        adapnet.py:43-44)
      * layer4.0.downsample: kept with its stride forced to 1
        (adapnet.py:125-126; 1x1 kernel, weights unchanged)

    NOT imported (fresh init, as in the reference): the stem conv1/bn1
    (re-created at adapnet.py:103-104), the skip convs, the dilated
    branch convs (conv2a/b, conv3) of replaced units, and the fc head."""
    m = {}

    def bottleneck(t, f):
        m[f"{t}.conv1"] = (f + ("Conv_0",), "conv")
        m[f"{t}.bn1"] = (f + ("BatchNorm_0",), "bn")
        m[f"{t}.conv2"] = (f + ("Conv_1",), "conv")
        m[f"{t}.bn2"] = (f + ("BatchNorm_1",), "bn")
        m[f"{t}.conv3"] = (f + ("Conv_2",), "conv")
        m[f"{t}.bn3"] = (f + ("BatchNorm_2",), "bn")
        m[f"{t}.downsample.0"] = (f + ("downsample_conv",), "conv")
        m[f"{t}.downsample.1"] = (f + ("BatchNorm_3",), "bn")

    for i in range(3):
        bottleneck(f"layer1.{i}", (prefix, f"Bottleneck_{i}"))
    for i in range(3):
        bottleneck(f"layer2.{i}", (prefix, f"Bottleneck_{3 + i}"))
    m["layer2.3.conv1"] = ((prefix, "BottleneckSSMA_0", "Conv_0"), "conv")
    m["layer2.3.bn1"] = ((prefix, "BottleneckSSMA_0", "BatchNorm_0"), "bn")
    for i in range(2):
        bottleneck(f"layer3.{i}", (prefix, f"Bottleneck_{6 + i}"))
    for i in range(4):
        f = (prefix, f"BottleneckSSMA_{1 + i}")
        m[f"layer3.{2 + i}.conv1"] = (f + ("Conv_0",), "conv")
        m[f"layer3.{2 + i}.bn1"] = (f + ("BatchNorm_0",), "bn")
    for i in range(3):
        f = (prefix, f"BottleneckSSMA_{5 + i}")
        m[f"layer4.{i}.conv1"] = (f + ("Conv_0",), "conv")
        m[f"layer4.{i}.bn1"] = (f + ("BatchNorm_0",), "bn")
    m["layer4.0.downsample.0"] = ((prefix, "BottleneckSSMA_5",
                                   "downsample_conv"), "conv")
    m["layer4.0.downsample.1"] = ((prefix, "BottleneckSSMA_5",
                                   "BatchNorm_4"), "bn")
    return m


def convert_resnet50_encoder(torch_state: Dict[str, np.ndarray],
                             flax_params, flax_batch_stats,
                             encoders=("encoder_mod1",)):
    """Import a torchvision resnet50 ``state_dict`` into the Encoder
    submodule(s) of an AdapNet params/batch_stats tree, seeding stage-1
    training from ImageNet weights like the reference
    (modules/adapnet.py:101, resnet50(pretrained=True)).

    Only the weights that survive the reference's surgery are written
    (see _resnet50_surviving_map); everything else keeps its fresh init.
    Returns (params, batch_stats, n_imported_arrays); raises on shape
    mismatch or if nothing could be imported."""
    import jax

    new_params = jax.tree_util.tree_map(np.asarray, flax_params)
    new_stats = jax.tree_util.tree_map(np.asarray, flax_batch_stats)

    def set_leaf(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                raise KeyError(f"no flax node {'/'.join(path)}")
            node = node[p]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{old.shape} vs {value.shape}")
        node[path[-1]] = value.astype(old.dtype)

    n = 0
    for enc in encoders:
        if enc not in new_params:
            raise KeyError(f"no encoder submodule {enc!r} in params "
                           f"(have {sorted(new_params)[:6]})")
        for tname, (fpath, kind) in _resnet50_surviving_map(enc).items():
            w_key = f"{tname}.weight"
            if w_key not in torch_state:
                if ".downsample." in tname:
                    continue  # only the first block of a stage projects
                raise KeyError(f"torchvision state_dict missing {w_key} -- "
                               "is this a resnet50 checkpoint?")
            if kind == "conv":
                w = np.transpose(torch_state[w_key], (2, 3, 1, 0))
                set_leaf(new_params, fpath + ("kernel",), w)
                n += 1
            else:
                set_leaf(new_params, fpath + ("scale",),
                         torch_state[w_key])
                set_leaf(new_params, fpath + ("bias",),
                         torch_state[f"{tname}.bias"])
                set_leaf(new_stats, fpath + ("mean",),
                         torch_state[f"{tname}.running_mean"])
                set_leaf(new_stats, fpath + ("var",),
                         torch_state[f"{tname}.running_var"])
                n += 4
    return new_params, new_stats, n
