"""Build all native components: ``python -m segfusion_tpu.native.build``."""

from . import mcubes, rasterize, simplify

if __name__ == "__main__":
    import numpy as np

    ok = mcubes.build_native(force=True)
    print(f"libmcubes.so: {'built' if ok else 'BUILD FAILED'}")
    ok_r = rasterize.build_native(force=True)
    print(f"librasterize.so: {'built' if ok_r else 'BUILD FAILED'}")
    ok_s = simplify.build_native(force=True)
    print(f"libsimplify.so: {'built' if ok_s else 'BUILD FAILED'}")

    if ok:
        x, y, z = np.mgrid[:24, :24, :24]
        sphere = np.sqrt((x - 12.) ** 2 + (y - 12.) ** 2
                         + (z - 12.) ** 2) - 8.0
        v, f, n = mcubes.marching_cubes(sphere.astype(np.float32), 0.0)
        print(f"smoke test: sphere mesh {len(v)} verts {len(f)} faces")
        if ok_s:
            sv, sf = simplify.simplify_quadric(v, f, target_faces=300)
            print(f"smoke test: QEM decimated to {len(sv)} verts "
                  f"{len(sf)} faces")
        if ok_r:
            view = np.eye(4, dtype=np.float32)
            view[2, 3] = 40.0
            K = np.array([[60., 0, 32], [0, 60., 32], [0, 0, 1]],
                         np.float32)
            d, m, rgb = rasterize.rasterize(v - 12.0, f, view, K, 64, 64)
            print(f"smoke test: render hit {int(m.sum())} px, "
                  f"rgb mean {rgb[m].mean():.1f}")
