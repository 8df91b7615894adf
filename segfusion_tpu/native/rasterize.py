"""ctypes wrapper for the software depth rasterizer (rasterize.cpp), with a
numpy fallback. Replaces the reference's pyrender GL bridge
(deps/mesh-fusion/librender/pyrender.pyx:19-51)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["rasterize_depth", "rasterize", "build_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rasterize.cpp")
_SO = os.path.join(_HERE, "librasterize.so")
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
        if not hasattr(lib, "rasterize_full"):
            # stale .so predating the full-render entry point
            if _build_failed or not build_native(force=True):
                return None
            lib = ctypes.CDLL(_SO)
        lib.rasterize_depth.restype = None
        lib.rasterize_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rasterize_full.restype = None
        lib.rasterize_full.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def rasterize_depth(vertices: np.ndarray, faces: np.ndarray,
                    view: np.ndarray, intrinsics: np.ndarray,
                    h: int, w: int, znear: float = 0.05,
                    zfar: float = 100.0) -> np.ndarray:
    """Render a z-buffered depth map of a triangle mesh.

    Args:
      vertices: (n, 3) world coords.
      faces: (m, 3) triangle indices.
      view: (4, 4) world->camera matrix (z forward, y down, x right).
      intrinsics: (3, 3).
    Returns:
      (h, w) float32 depth (0 = no hit).
    """
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    vw = np.ascontiguousarray(view, np.float32)
    k = np.ascontiguousarray(intrinsics, np.float32)
    out = np.zeros((h, w), np.float32)

    lib = _load()
    if lib is not None:
        lib.rasterize_depth(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
            vw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, znear, zfar,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return _rasterize_numpy(v, f, vw, k, h, w, znear, zfar)[0]


def rasterize(vertices: np.ndarray, faces: np.ndarray,
              view: np.ndarray, intrinsics: np.ndarray,
              h: int, w: int, znear: float = 0.05, zfar: float = 100.0,
              colors: Optional[np.ndarray] = None):
    """Full render: the reference librender return triple
    (deps/mesh-fusion/librender/pyrender.pyx:51).

    Args:
      colors: optional (n, 3) per-vertex colors in [0, 1]; when None the
        mesh is flat-shaded from the camera-space face normal (the GL
        renderer's coloring=False mode).
    Returns:
      depth (h, w) float32 (0 = no hit), mask (h, w) bool,
      rgb (h, w, 3) uint8.
    """
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    vw = np.ascontiguousarray(view, np.float32)
    k = np.ascontiguousarray(intrinsics, np.float32)
    col = (np.ascontiguousarray(colors, np.float32)
           if colors is not None else None)
    depth = np.zeros((h, w), np.float32)
    mask = np.zeros((h, w), np.uint8)
    rgb = np.zeros((h, w, 3), np.uint8)

    lib = _load()
    if lib is not None:
        lib.rasterize_full(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
            vw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            col.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if col is not None else None,
            h, w, znear, zfar,
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return depth, mask.astype(bool), rgb
    depth, rgb = _rasterize_numpy(v, f, vw, k, h, w, znear, zfar, col)
    return depth, depth > 0, rgb


def _rasterize_numpy(v, f, view, k, h, w, znear, zfar, colors=None):
    """Vectorised-per-triangle fallback (slow; native is preferred).
    Returns (depth, rgb); rgb mirrors rasterize_full's interpolation."""
    cam = v @ view[:3, :3].T + view[:3, 3]
    depth = np.zeros((h, w), np.float32)
    rgb = np.zeros((h, w, 3), np.uint8)
    fx, cx, fy, cy = k[0, 0], k[0, 2], k[1, 1], k[1, 2]
    for tri in f:
        a, b, c = cam[tri]
        if min(a[2], b[2], c[2]) < znear or max(a[2], b[2], c[2]) > zfar:
            continue
        pts = np.array([[fx * p[0] / p[2] + cx, fy * p[1] / p[2] + cy]
                        for p in (a, b, c)])
        x0 = max(0, int(np.floor(pts[:, 0].min())))
        x1 = min(w - 1, int(np.ceil(pts[:, 0].max())))
        y0 = max(0, int(np.floor(pts[:, 1].min())))
        y1 = min(h - 1, int(np.ceil(pts[:, 1].max())))
        if x0 > x1 or y0 > y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5,
                             np.arange(y0, y1 + 1) + 0.5)
        (ua, va), (ub, vb), (uc, vc) = pts
        area = (ub - ua) * (vc - va) - (uc - ua) * (vb - va)
        if abs(area) < 1e-12:
            continue
        w0 = ((ub - xs) * (vc - ys) - (uc - xs) * (vb - ys)) / area
        w1 = ((uc - xs) * (va - ys) - (ua - xs) * (vc - ys)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        inv_z = w0 / a[2] + w1 / b[2] + w2 / c[2]
        with np.errstate(divide="ignore"):
            z = np.where(inv_z > 0, 1.0 / inv_z, 0.0)
        patch = depth[y0:y1 + 1, x0:x1 + 1]
        write = inside & (z >= znear) & (z <= zfar) \
            & ((patch == 0) | (z < patch))
        patch[write] = z[write]
        if colors is not None:
            ca, cb, cc2 = colors[tri]
            shade = (w0[..., None] / a[2] * ca + w1[..., None] / b[2] * cb
                     + w2[..., None] / c[2] * cc2) * z[..., None]
        else:
            e0, e1 = b - a, c - a
            n = np.cross(e0, e1)
            nl = np.linalg.norm(n)
            s = 0.2 + 0.8 * abs(n[2]) / nl if nl > 0 else 0.2
            shade = np.broadcast_to(
                np.float64(s), z.shape + (3,))
        val = np.clip(shade, 0, 1) * 255.0 + 0.5
        rgb[y0:y1 + 1, x0:x1 + 1][write] = val[write].astype(np.uint8)
    return depth, rgb
