"""Convert reference PyTorch checkpoints into this framework's params.

The reference ships `.pth.tar` torch checkpoints (reference
utils/saving.py:67-91). This converter maps a torch ``state_dict`` onto the
Flax parameter/batch-stats trees by **execution order with shape checking**:
both the reference FusionNet family and this build apply their conv/BN
layers in the same sequence (construction order == execution order for
these architectures), so flattening both sides in order and pairing
conv<->Conv and BN<->BatchNorm entries gives an exact 1:1 mapping without a
hand-written name table. Conv kernels are transposed OIHW -> HWIO.

Covers FusionNet v1/v2/v3 (reference modules/model.py). The AdapNet++
encoder registers skip convs before the backbone, breaking pure order
matching -- AdapNet conversion is intentionally not claimed here.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["convert_fusionnet_state_dict", "load_torch_checkpoint"]


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


def _fusionnet_module_order(model_cfg) -> List[str]:
    """Top-level flax module names of a FusionNet in execution order
    (== the reference's construction/state-dict order)."""
    name = model_cfg.get("name", "v3")
    use_sem = bool(model_cfg.get("use_semantics", False))
    if name == "v1":
        return [f"Block_{i}" for i in range(4)] \
            + [f"Pred_{i}" for i in range(4)]
    g = int(model_cfg.get("growth_factor", 6)) - 1
    if name == "v2":
        return [f"Block_{i}" for i in range(g)] \
            + ["VortexPooling_0", "VortexPooling_1"] \
            + [f"Pred_{i}" for i in range(g)]
    # v3: tsdf head, optional semantic head, final vortex, preds
    order = [f"Block_{i}" for i in range(g)] + ["VortexPooling_0"]
    if use_sem:
        order += [f"Block_{i}" for i in range(g, 2 * g)]
        order += ["VortexPooling_1", "VortexPooling_2"]
    else:
        order += ["VortexPooling_1"]
    order += [f"Pred_{i}" for i in range(g)]
    return order


def _ordered_flax_layers(params, batch_stats, model_cfg):
    """Group flax leaves into (module_path, kind, dict) in execution order:
    top-level modules per the model config, and within each module
    Conv_k followed by BatchNorm_k for ascending k (matching the
    conv->BN interleaving of the reference Sequentials).
    kind: 'conv' (kernel[, bias]) or 'bn' (scale, bias, mean, var)."""
    leaves = _flatten_flax(params)
    stats = dict(_flatten_flax(batch_stats))
    by_module: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for path, leaf in leaves:
        by_module.setdefault(path[:-1], {})[path[-1]] = leaf

    def module_layers(top: str):
        convs = {}
        bns = {}
        for path, entry in by_module.items():
            if not path or path[0] != top:
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
                out.append((convs[k][0], "conv", convs[k][1]))
            if k in bns:
                out.append((bns[k][0], "bn", bns[k][1]))
        return out

    layers = []
    for top in _fusionnet_module_order(model_cfg):
        layers.extend(module_layers(top))
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

    new_params = jax.tree_util.tree_map(np.asarray, flax_params)
    new_stats = jax.tree_util.tree_map(np.asarray, flax_batch_stats)

    def set_leaf(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{old.shape} vs {value.shape}")
        node[path[-1]] = value.astype(old.dtype)

    for (fpath, fkind, fentry), (tname, tkind, tentry) in zip(flax_layers,
                                                              torch_layers):
        if fkind != tkind:
            raise ValueError(f"layer kind mismatch: {fpath} ({fkind}) vs "
                             f"{tname} ({tkind})")
        if fkind == "conv":
            w = np.transpose(tentry["weight"], (2, 3, 1, 0))  # OIHW->HWIO
            set_leaf(new_params, fpath + ("kernel",), w)
            if "bias" in fentry and "bias" in tentry:
                set_leaf(new_params, fpath + ("bias",), tentry["bias"])
        else:
            set_leaf(new_params, fpath + ("scale",), tentry["weight"])
            set_leaf(new_params, fpath + ("bias",), tentry["bias"])
            set_leaf(new_stats, fpath + ("mean",), tentry["running_mean"])
            set_leaf(new_stats, fpath + ("var",), tentry["running_var"])
    return new_params, new_stats
