"""Checkpointing: msgpack-serialised pytrees with best/last semantics.

Replaces the reference's torch.save state_dict checkpoints
(reference utils/saving.py:67-91, utils/loading.py:60-201) with flax
serialization. Provides the reference's cross-checkpoint surgery utilities:
``remove_parent`` / ``select_child`` (strip key prefixes,
utils/loading.py:190-201) and ``separate_pipeline`` (split a pipeline
checkpoint into a standalone fusion checkpoint, utils/loading.py:161-187).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "remove_parent",
           "select_child", "separate_pipeline", "save_checkpoint_orbax",
           "load_checkpoint_orbax"]


def _to_host(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], path: str):
    """Serialise a checkpoint dict (params / batch_stats / opt_state /
    epoch / metrics) to ``path``. Arbitrary pytrees (e.g. optax states)
    are converted to nested dicts first."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = serialization.to_state_dict(_to_host(state))
    payload = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, state_dict):
    """Restore a raw dict into the structure of ``template`` (shape-checked
    via flax.serialization.from_state_dict)."""
    return serialization.from_state_dict(template, state_dict)


def remove_parent(tree: Mapping, parent: str) -> Dict:
    """Strip a top-level key prefix (the reference strips 'module.' /
    '_fusion_network.' prefixes from torch state dicts,
    utils/loading.py:190-195). For nested dicts this lifts the child."""
    if parent in tree:
        return dict(tree[parent])
    # flat 'a.b.c' style keys
    out = {}
    pref = parent + "."
    for k, v in tree.items():
        out[k[len(pref):] if isinstance(k, str) and k.startswith(pref)
            else k] = v
    return out


def select_child(tree: Mapping, child: str) -> Dict:
    """Keep only the subtree under ``child``
    (reference utils/loading.py:197-201)."""
    if child in tree:
        return dict(tree[child])
    out = {}
    pref = child + "."
    for k, v in tree.items():
        if isinstance(k, str) and k.startswith(pref):
            out[k[len(pref):]] = v
    return out


def separate_pipeline(pipeline_ckpt_path: str, fusion_out_path: str,
                      key: str = "fusion") -> Dict:
    """Split a pipeline checkpoint into a standalone fusion-network
    checkpoint (reference utils/loading.py:161-187)."""
    ckpt = load_checkpoint(pipeline_ckpt_path)
    fusion = {
        "params": ckpt.get("params", {}).get(key, ckpt.get("params")),
        "batch_stats": ckpt.get("batch_stats", {}).get(
            key, ckpt.get("batch_stats", {})),
        "epoch": ckpt.get("epoch", 0),
    }
    save_checkpoint(fusion, fusion_out_path)
    return fusion


# ---------------------------------------------------------------------------
# orbax backend: async, multi-host/sharded-array capable checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(state: Dict[str, Any], path: str,
                          wait: bool = True):
    """Save via orbax StandardCheckpointer (a directory checkpoint).

    Use for multi-chip runs where params/volumes are sharded jax.Arrays --
    orbax writes each shard from its owning host; the msgpack backend is
    the simple single-host default."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), serialization.to_state_dict(state),
               force=True)
    if wait:
        ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, template=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path),
                             serialization.to_state_dict(template))
    return ckptr.restore(os.path.abspath(path))
