"""Build all native components: ``python -m segfusion_tpu.native.build``."""

from . import mcubes

if __name__ == "__main__":
    ok = mcubes.build_native(force=True)
    print(f"libmcubes.so: {'built' if ok else 'BUILD FAILED'}")
    if ok:
        import numpy as np
        x, y, z = np.mgrid[:24, :24, :24]
        sphere = np.sqrt((x - 12.) ** 2 + (y - 12.) ** 2
                         + (z - 12.) ** 2) - 8.0
        v, f, n = mcubes.marching_cubes(sphere.astype(np.float32), 0.0)
        print(f"smoke test: sphere mesh {len(v)} verts {len(f)} faces")
