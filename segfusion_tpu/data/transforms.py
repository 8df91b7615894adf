"""Frame-dict transforms: array conversion + device placement.

Equivalent of reference utils/transform.py:5-37 (ToTensor HWC->CHW +
to_device). This framework keeps NHWC (TPU-native), so ToTensor reduces to
dtype normalisation; ``to_device`` is a jax.device_put over the dict.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["ToArray", "to_device"]


class ToArray:
    """Normalise a frame dict's fields to numpy arrays with canonical
    dtypes (images float32 NHWC, depths float32, masks bool, labels uint8,
    matrices float32)."""

    _FLOAT_KEYS = ("image", "tof_depth", "depth_gt", "extrinsics",
                   "intrinsics")

    def __call__(self, sample: Dict) -> Dict:
        out = dict(sample)
        for k in self._FLOAT_KEYS:
            if k in out and isinstance(out[k], np.ndarray):
                out[k] = out[k].astype(np.float32)
        if "mask" in out:
            out["mask"] = np.asarray(out["mask"]).astype(bool)
        if "semantic_gt" in out:
            out["semantic_gt"] = np.asarray(out["semantic_gt"]).astype(
                np.uint8)
        return out


def to_device(batch: Dict, device=None) -> Dict:
    """Move a batch dict's array fields to a device
    (reference utils/transform.py:24-37)."""
    import jax

    def put(v):
        if isinstance(v, np.ndarray) or hasattr(v, "dtype"):
            return jax.device_put(v, device)
        return v

    return {k: put(v) for k, v in batch.items()}
