#!/usr/bin/env python
"""Step 2: watertight TSDF fusion of scaled meshes.

Port of reference deps/mesh-fusion/2_fusion.py:99-280: render ~100
Fibonacci-sphere depth views of each mesh (native software rasterizer
replacing the GL renderer), thicken by a depth offset (the reference's
depth-offset + grey-erosion step, :176-185), TSDF-fuse all views on the
accelerator (segfusion_tpu.ops.tsdf_fusion, replacing libfusion{cpu,gpu}),
and export the watertight marching-cubes mesh (+ optionally the sdf hdf5
consumed by the datasets' get_grid).

Usage: python tools/preprocess/fuse.py --in_dir scaled/ --out_dir fused/
       [--n_views 100] [--resolution 256] [--image_size 640]
       [--save_sdf]
"""

import argparse
import glob
import os
import sys

import numpy as np

from common import fibonacci_sphere_views, load_mesh, look_at_view, save_mesh

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from segfusion_tpu.native.rasterize import rasterize_depth  # noqa: E402


def erode_depth(d):
    """3x3 grey erosion (separable min filter) over VALID depth pixels.

    The reference erodes the rendered depth map with
    ``grey_erosion(depth, size=(3, 3))`` (2_fusion.py:176-185) to thicken
    thin structures; there the background is zfar (large), so the erosion
    dilates object silhouettes by one pixel. Our rasterizer marks misses
    with 0, so zeros are lifted to +inf for the min and restored after.
    """
    di = np.where(d > 0, d, np.inf)
    e = np.minimum(di, np.minimum(np.roll(di, 1, 0), np.roll(di, -1, 0)))
    if e.shape[0] == 1:                 # degenerate single row: no
        e[0] = di[0]                    # vertical neighbours at all
    else:                               # un-wrap the roll at the borders
        e[0] = np.minimum(di[0], di[1])
        e[-1] = np.minimum(di[-1], di[-2])
    e2 = np.minimum(e, np.minimum(np.roll(e, 1, 1), np.roll(e, -1, 1)))
    if e2.shape[1] == 1:
        e2[:, 0] = e[:, 0]
    else:
        e2[:, 0] = np.minimum(e[:, 0], e[:, 1])
        e2[:, -1] = np.minimum(e[:, -1], e[:, -2])
    return np.where(np.isfinite(e2), e2, 0.0).astype(d.dtype)


def fuse_mesh(verts, faces, n_views=100, grid_res=256, image_size=640,
              truncation_factor=10.0, depth_offset=1.5):
    import jax.numpy as jnp
    from segfusion_tpu.ops.tsdf_fusion import tsdf_from_depth_views

    f = image_size * 1.2
    k = np.array([[f, 0, image_size / 2], [0, f, image_size / 2],
                  [0, 0, 1]], np.float32)
    voxel = 1.0 / grid_res
    truncation = truncation_factor * voxel

    eyes = fibonacci_sphere_views(n_views, radius=1.2)
    depths, projs = [], []
    for eye in eyes:
        view = look_at_view(eye)
        d = rasterize_depth(verts, faces, view, k, image_size, image_size,
                            znear=0.2, zfar=3.0)
        # enlarge the object slightly: pull depth TOWARD the camera (the
        # reference SUBTRACTS the offset, 2_fusion.py:176-181 -- with the
        # free-space-positive sdf convention a smaller depth grows the
        # object), then 3x3 grey-erode to thicken thin structures
        # (2_fusion.py:182).
        d = np.where(d > 0, np.maximum(d - depth_offset * voxel, 1e-6), 0.0)
        d = erode_depth(d)
        depths.append(d)
        projs.append((k @ view[:3, :4]).astype(np.float32))

    origin = np.array([-0.5, -0.5, -0.5], np.float32)
    tsdf, weights = tsdf_from_depth_views(
        np.stack(depths), np.stack(projs), (grid_res,) * 3, origin, voxel,
        truncation)
    return np.asarray(tsdf), np.asarray(weights), origin, voxel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_views", type=int, default=100)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--image_size", type=int, default=640)
    ap.add_argument("--save_sdf", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from segfusion_tpu.native.mcubes import marching_cubes

    for path in sorted(glob.glob(os.path.join(args.in_dir, "*.off"))):
        name = os.path.splitext(os.path.basename(path))[0]
        verts, faces = load_mesh(path)
        tsdf, weights, origin, voxel = fuse_mesh(
            verts, faces, args.n_views, args.resolution, args.image_size)

        mv, mf, mn = marching_cubes(tsdf, 0.0, spacing=voxel)
        mv = mv + origin[None, :]
        save_mesh(os.path.join(args.out_dir, name + ".off"), mv, mf)
        print(f"{name}: {len(mv)} verts {len(mf)} faces")

        if args.save_sdf:
            import h5py
            bbox = np.stack([origin, origin + voxel * args.resolution],
                            axis=1)
            with h5py.File(os.path.join(args.out_dir, name + "_sdf.hdf"),
                           "w") as hf:
                ds = hf.create_dataset("sdf", shape=(1,) + tsdf.shape,
                                       data=tsdf[None], compression="gzip")
                hf.attrs["voxel_size"] = voxel
                hf.attrs["bbox"] = bbox


if __name__ == "__main__":
    main()
