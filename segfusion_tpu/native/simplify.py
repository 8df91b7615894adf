"""ctypes wrapper for the QEM mesh decimator (simplify.cpp), with the
vertex-clustering fallback. Replaces the reference's meshlabserver
quadric-decimation shell-out (deps/mesh-fusion/3_simplify.py:56-61 +
simplification.mlx)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["simplify_quadric", "simplify_cluster", "build_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "simplify.cpp")
_SO = os.path.join(_HERE, "libsimplify.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_native(force: bool = False) -> bool:
    global _build_failed
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        _SRC, "-o", _SO],
                       check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        _build_failed = True
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO):
            if _build_failed or not build_native():
                return None
        lib = ctypes.CDLL(_SO)
        lib.simplify_qem.restype = ctypes.c_int32
        lib.simplify_qem.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def simplify_quadric(vertices: np.ndarray, faces: np.ndarray,
                     target_faces: int = 5000,
                     quality_thr: float = 0.5
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """QEM edge-collapse decimation to <= ``target_faces`` (the
    reference simplification.mlx contract: TargetFaceNum 5000,
    QualityThr 0.5, optimal placement, normal preservation, autoclean).
    Falls back to vertex clustering when the native build is
    unavailable."""
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    if len(f) <= target_faces:
        return v, f
    lib = _load()
    if lib is None:
        return _cluster_to_target(v, f, target_faces)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    onv = ctypes.c_int64()
    onf = ctypes.c_int64()
    rc = lib.simplify_qem(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        int(target_faces), float(quality_thr),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(onv), ctypes.byref(onf))
    if rc != 0:
        return _cluster_to_target(v, f, target_faces)
    return (out_v[:onv.value].copy(), out_f[:onf.value].copy())


def simplify_cluster(vertices: np.ndarray, faces: np.ndarray,
                     cluster: float) -> Tuple[np.ndarray, np.ndarray]:
    """Grid vertex clustering: snap to a ``cluster``-sized grid, merge,
    drop degenerate faces. Coarser than QEM but has no target-count
    search; kept for the --method cluster tool path."""
    verts = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    keys = np.floor(verts / cluster).astype(np.int64)
    lin = (keys[:, 0] * 73856093) ^ (keys[:, 1] * 19349663) \
        ^ (keys[:, 2] * 83492791)
    uniq, inverse = np.unique(lin, return_inverse=True)
    new_verts = np.zeros((len(uniq), 3), np.float64)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(new_verts, inverse, verts)
    np.add.at(counts, inverse, 1)
    new_verts /= counts[:, None]

    new_faces = inverse[faces]
    good = ((new_faces[:, 0] != new_faces[:, 1])
            & (new_faces[:, 1] != new_faces[:, 2])
            & (new_faces[:, 0] != new_faces[:, 2]))
    return new_verts.astype(np.float32), new_faces[good].astype(np.int32)


def _cluster_to_target(v, f, target_faces):
    """Clustering fallback searching the grid size that lands near the
    face target (bisection on cluster size)."""
    lo = 1e-5 * float(np.ptp(v))
    hi = 0.5 * float(np.ptp(v))
    best = (v, f)
    for _ in range(24):
        mid = np.sqrt(lo * hi)
        sv, sf = simplify_cluster(v, f, mid)
        if len(sf) > target_faces:
            lo = mid
        else:
            best = (sv, sf)
            hi = mid
    return best
