"""Marching-tetrahedra isosurface extraction: ctypes wrapper + numpy fallback.

``marching_cubes(volume, level, spacing)`` mirrors the call sites of the
reference's skimage.measure.marching_cubes_lewiner (reference
modules/database.py:120-122, utils/saving.py:44-46) and the vendored PyMCubes
(deps/mesh-fusion/libmcubes/mcubes.pyx:22-27). The C++ kernel (mcubes.cpp) is
compiled on first use; a vectorised numpy implementation of the same
marching-tetrahedra scheme is the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["marching_cubes", "build_native", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mcubes.cpp")
_SO = os.path.join(_HERE, "libmcubes.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_native(force: bool = False) -> bool:
    """Compile mcubes.cpp -> libmcubes.so. Returns True on success."""
    global _build_failed
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
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
        lib.mt_run.restype = ctypes.c_int
        lib.mt_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def marching_cubes(volume: np.ndarray, level: float = 0.0,
                   spacing: float = 1.0
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the isosurface of ``volume`` at ``level``.

    Returns (vertices (n,3) float32 scaled by ``spacing``, faces (m,3) int32,
    normals (n,3) float32 pointing toward increasing values). Raises
    ValueError if the level is not crossed (matching skimage behaviour).
    """
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    vmin, vmax = float(vol.min()), float(vol.max())
    if not (vmin < level < vmax) and not (vmin <= level <= vmax):
        raise ValueError(
            f"level {level} is outside volume range [{vmin}, {vmax}]")

    lib = _load()
    if lib is not None:
        vp = ctypes.POINTER(ctypes.c_float)()
        fp = ctypes.POINTER(ctypes.c_int32)()
        npn = ctypes.POINTER(ctypes.c_float)()
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        rc = lib.mt_run(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vol.shape[0], vol.shape[1], vol.shape[2],
            ctypes.c_float(level), ctypes.c_float(spacing),
            ctypes.byref(vp), ctypes.byref(fp), ctypes.byref(npn),
            ctypes.byref(nv), ctypes.byref(nf))
        if rc != 0:
            raise MemoryError("mt_run failed")
        try:
            n, m = nv.value, nf.value
            verts = np.ctypeslib.as_array(vp, shape=(max(n, 1), 3))[:n].copy()
            faces = np.ctypeslib.as_array(fp, shape=(max(m, 1), 3))[:m].copy()
            normals = np.ctypeslib.as_array(npn, shape=(max(n, 1), 3))[:n].copy()
        finally:
            lib.mt_free(vp)
            lib.mt_free(fp)
            lib.mt_free(npn)
        if n == 0:
            raise ValueError("no isosurface at the requested level")
        return verts, faces, normals

    return _marching_tetrahedra_numpy(vol, level, spacing)


# ---------------------------------------------------------------------------
# numpy fallback: the same Kuhn 6-tet marching tetrahedra, vectorised
# ---------------------------------------------------------------------------

_TETS = np.array([[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
                  [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], np.int64)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]],
                      np.int64)
_TET_TRIS = [
    [], [(0, 1, 2)], [(0, 3, 4)], [(1, 2, 3), (3, 2, 4)],
    [(1, 3, 5)], [(0, 3, 5), (0, 5, 2)], [(0, 1, 5), (0, 5, 4)],
    [(2, 4, 5)],
    [(2, 4, 5)], [(0, 4, 5), (0, 5, 1)], [(0, 3, 5), (0, 5, 2)],
    [(1, 3, 5)], [(1, 2, 3), (3, 2, 4)], [(0, 3, 4)], [(0, 1, 2)], [],
]
_CORNER_OFF = np.array([[(c & 1), ((c >> 1) & 1), ((c >> 2) & 1)]
                        for c in range(8)], np.int64)


def _marching_tetrahedra_numpy(vol, level, spacing):
    nx, ny, nz = vol.shape
    # corner values for every cube: (nx-1, ny-1, nz-1, 8)
    base = np.stack(np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                                np.arange(nz - 1), indexing="ij"),
                    axis=-1).reshape(-1, 3)                     # (C, 3)
    corner_idx = base[:, None, :] + _CORNER_OFF[None, :, :]     # (C, 8, 3)
    cv = vol[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]

    active = ~(np.all(cv < level, axis=1) | np.all(cv >= level, axis=1))
    base = base[active]
    corner_idx = corner_idx[active]
    cv = cv[active]
    if len(base) == 0:
        raise ValueError("no isosurface at the requested level")

    edge_keys = []
    edge_a = []
    edge_b = []
    tris = []

    lin_all = (corner_idx[..., 0] * ny + corner_idx[..., 1]) * nz \
        + corner_idx[..., 2]                                    # (C, 8)

    for t in range(6):
        tc = _TETS[t]                                           # 4 corners
        tv = cv[:, tc]                                          # (C, 4)
        mask = ((tv < level) * np.array([1, 2, 4, 8])).sum(axis=1)
        for case in range(1, 15):
            sel = np.nonzero(mask == case)[0]
            if len(sel) == 0:
                continue
            for tri in _TET_TRIS[case]:
                vids = []
                for e in tri:
                    a, b = _TET_EDGES[e]
                    ca, cb = tc[a], tc[b]
                    la = lin_all[sel, ca]
                    lb = lin_all[sel, cb]
                    key = np.where(la < lb, la * (nx * ny * nz) + lb,
                                   lb * (nx * ny * nz) + la)
                    edge_keys.append(key)
                    edge_a.append(np.stack([corner_idx[sel, ca, 0],
                                            corner_idx[sel, ca, 1],
                                            corner_idx[sel, ca, 2],
                                            cv[sel, ca]], axis=1))
                    edge_b.append(np.stack([corner_idx[sel, cb, 0],
                                            corner_idx[sel, cb, 1],
                                            corner_idx[sel, cb, 2],
                                            cv[sel, cb]], axis=1))
                    vids.append(len(edge_keys) - 1)
                tris.append((vids, len(sel)))

    keys = np.concatenate(edge_keys)
    ea = np.concatenate(edge_a)
    eb = np.concatenate(edge_b)
    uniq, first, inverse = np.unique(keys, return_index=True,
                                     return_inverse=True)

    # interpolate one vertex per unique edge
    a = ea[first]
    b = eb[first]
    denom = a[:, 3] - b[:, 3]
    tpar = np.where(np.abs(denom) > 1e-12, (a[:, 3] - level) / denom, 0.5)
    tpar = np.clip(tpar, 0.0, 1.0)
    verts = a[:, :3] + tpar[:, None] * (b[:, :3] - a[:, :3])

    # assemble faces: blocks of edges were appended per (tri, selection)
    offsets = np.concatenate([[0], np.cumsum([len(k) for k in edge_keys])])
    faces = []
    blk = 0
    for vids, cnt in tris:
        f = np.stack([inverse[offsets[v]:offsets[v] + cnt] for v in vids],
                     axis=1)
        faces.append(f)
        blk += 1
    faces = np.concatenate(faces, axis=0).astype(np.int32)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    # gradient normals at vertices (nearest-cell central differences)
    gi = np.clip(np.round(verts).astype(np.int64), 0,
                 np.array([nx - 1, ny - 1, nz - 1]))
    gx, gy, gz = np.gradient(vol)
    normals = np.stack([gx[gi[:, 0], gi[:, 1], gi[:, 2]],
                        gy[gi[:, 0], gi[:, 1], gi[:, 2]],
                        gz[gi[:, 0], gi[:, 1], gi[:, 2]]], axis=1)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = np.where(norm > 1e-12, normals / norm, [0, 0, 1.0])

    return (verts.astype(np.float32) * spacing, faces,
            normals.astype(np.float32))
