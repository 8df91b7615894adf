"""Config system: YAML -> attribute-accessible nested config.

Drop-in compatible with the reference YAML schema (6 sections: SETTINGS,
FUSION_MODEL, SEMANTIC_2D_MODEL, TRAINING, TESTING, DATA; see reference
configs/fusion/replica_accuracy.yaml:1-75 and utils/loading.py:9-19), but adds
defaults + light validation that the reference lacks.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Mapping

import yaml


class Config(dict):
    """Attribute-accessible nested dict (the reference uses EasyDict;
    reference utils/loading.py:16-19). Mutable at runtime by design --
    the pipeline patches derived fields (e.g. FUSION_MODEL.resx)."""

    def __init__(self, d: Mapping | None = None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, Mapping) and not isinstance(value, Config):
            value = Config(value)
        elif isinstance(value, list):
            value = [Config(v) if isinstance(v, Mapping) else v for v in value]
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        del self[key]

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(dict(self), memo))

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def to_dict(self) -> dict:
        def conv(v):
            if isinstance(v, Config):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self)

    def save_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)


# Defaults patched into configs when absent (the reference patches these with
# scattered try/except in utils/setup.py:29-70; we centralise them).
_DEFAULTS = {
    "SETTINGS": {
        "gpu": True,
        "num_workers": 0,
        "experiment_path": "workspace/default",
        "save_mode": "test",
        "eval_freq": 2000,
        "log_freq": 250,
        "seed": 1911,
        "implementation": "efficient",
    },
    "FUSION_MODEL": {
        "name": "v3",
        "output_scale": 1.0,
        "n_points": 9,
        "n_tail_points": 7,
        "growth_factor": 6,
        "use_semantics": False,
        "pretrained": None,
    },
    "SEMANTIC_2D_MODEL": {
        "stage": 1,
        "n_classes": 30,
    },
    "TRAINING": {
        "train_batch_size": 1,
        "train_shuffle": False,
        "train_ratio": 1,
        "val_batch_size": 1,
        "val_shuffle": False,
        "val_ratio": 1,
        "n_epochs": 1,
        "resume": None,
        "optimizer": {"name": "rmsprop", "lr": 1.0e-5, "momentum": 0.9,
                      "weight_decay": 0.01, "eps": 1.0e-9},
        "scheduler": {"name": "poly_lr", "max_iter": 50000},
        "loss": {"name": "fusion", "w_l1": 1.0, "w_l2": 10.0, "w_cos": 0.1},
        "optimization": {"reset_strategy": False, "reset_prob": 0.01,
                         "clipping": True, "accumulation_steps": 8},
    },
    "TESTING": {
        "test_batch_size": 1,
        "test_shuffle": False,
        "test_ratio": 1,
        "outlier_filter_val": 2,
        "fusion_model_path": None,
        "semantic_2d_model_path": None,
    },
    "DATA": {
        "dataset": "Synthetic",
        "root_dir": None,
        "semantics": None,
        "semantic_strategy": "gt",
        "semantic_grid": False,
        "data_load_strategy": "max_depth_diversity",
        "load_scenes_at_once": 1,
        "intensity_grad": False,
        "input": "tof_depth",
        "target": "depth_gt",
        "resx": 256,
        "resy": 256,
        "train_scene_list": None,
        "val_scene_list": None,
        "test_scene_list": None,
        "init_value": 0.1,
        "truncation_strategy": "standard",
        "normalize": True,
        "pad": 2,
        "frame_ratio": 1,
        "scene_list": None,
        "mode": "train",
        "transform": None,
        "noise_scale": 1.0,
        "outlier_scale": 3.0,
        "outlier_fraction": 0.99,
    },
}


def _merge_defaults(cfg: Config, defaults: Mapping) -> Config:
    for k, v in defaults.items():
        if k not in cfg or cfg[k] is None:
            cfg[k] = copy.deepcopy(v)
        elif isinstance(v, Mapping) and isinstance(cfg[k], Config):
            _merge_defaults(cfg[k], v)
    return cfg


def load_config(path: str) -> Config:
    """Load a YAML config file; reference utils/loading.py:9-19."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"config file not found: {path}")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config(raw)
    # legacy alias used by some reference configs
    if "SEMANTIC_MODEL" in cfg and "SEMANTIC_2D_MODEL" not in cfg:
        cfg["SEMANTIC_2D_MODEL"] = cfg["SEMANTIC_MODEL"]
    return _merge_defaults(cfg, _DEFAULTS)


def load_config_from_yaml(path: str) -> Config:  # reference-name alias
    return load_config(path)


def get_data_config(config: Config, mode: str) -> Config:
    """Derive the per-mode (train/val/test) data config view;
    reference utils/setup.py:29-70."""
    data = copy.deepcopy(config.DATA)
    data.mode = mode
    if mode == "train":
        data.scene_list = data.get("train_scene_list")
        data.frame_ratio = config.TRAINING.get("train_ratio", 1)
    elif mode == "val":
        data.scene_list = data.get("val_scene_list")
        data.frame_ratio = config.TRAINING.get("val_ratio", 1)
    elif mode == "test":
        data.scene_list = data.get("test_scene_list")
        data.frame_ratio = config.TESTING.get("test_ratio", 1)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    data.implementation = config.SETTINGS.implementation
    data.device = config.SETTINGS.get("device", None)
    if config.DATA.get("semantics"):
        data.n_classes = config.SEMANTIC_2D_MODEL.n_classes
    return data
