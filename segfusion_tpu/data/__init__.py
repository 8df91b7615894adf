"""Datasets + host-side streaming.

Factory mirrors the reference's dataset selection (reference
utils/setup.py:73-77, minus the eval() indirection)."""

from .prefetch import PrefetchLoader
from .replica import Replica
from .scannet import ScanNet
from .synthetic import Synthetic

_DATASETS = {"Replica": Replica, "ScanNet": ScanNet, "Synthetic": Synthetic}


def get_data(name: str, config_data):
    if name not in _DATASETS:
        raise NotImplementedError(f"Dataset {name} not implemented "
                                  f"(available: {sorted(_DATASETS)})")
    return _DATASETS[name](config_data)
