"""Shared helpers for the offline watertight-mesh preprocessing pipeline.

Port of the reference's mesh-fusion utilities (reference
deps/mesh-fusion/common.py:12-537 Mesh class + IO, 2_fusion.py:99-152
Fibonacci-sphere view sampling) onto this framework's native rasterizer and
JAX fusion kernels.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from segfusion_tpu.utils.meshio import (read_off, read_ply, write_off,
                                        write_obj, write_ply)  # noqa: E402

__all__ = ["load_mesh", "save_mesh", "fibonacci_sphere_views",
           "look_at_view"]


def load_mesh(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".off":
        return read_off(path)
    if ext == ".ply":
        return read_ply(path)
    raise ValueError(f"unsupported mesh format {ext}")


def save_mesh(path: str, vertices, faces, normals=None):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".off":
        write_off(path, vertices, faces)
    elif ext == ".ply":
        write_ply(path, vertices, faces, normals=normals)
    elif ext == ".obj":
        write_obj(path, vertices, faces)
    else:
        raise ValueError(f"unsupported mesh format {ext}")


def fibonacci_sphere_views(n_views: int, radius: float = 1.0) -> np.ndarray:
    """Camera centres on a Fibonacci sphere (the reference renders ~100
    such views per mesh, deps/mesh-fusion/2_fusion.py:99-152)."""
    pts = []
    offset = 2.0 / n_views
    increment = math.pi * (3.0 - math.sqrt(5.0))
    for i in range(n_views):
        y = ((i * offset) - 1) + offset / 2
        r = math.sqrt(max(0.0, 1 - y * y))
        phi = i * increment
        pts.append([math.cos(phi) * r * radius, y * radius,
                    math.sin(phi) * r * radius])
    return np.asarray(pts, np.float32)


def look_at_view(eye: np.ndarray, target=np.zeros(3),
                 up=np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """world->camera matrix with z forward / y down / x right."""
    fwd = target - eye
    n = np.linalg.norm(fwd)
    fwd = fwd / max(n, 1e-12)
    upv = up if abs(np.dot(fwd, up)) < 0.99 else np.array([1.0, 0.0, 0.0])
    right = np.cross(fwd, upv)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return np.linalg.inv(c2w).astype(np.float32)
