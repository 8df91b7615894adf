"""Native (C++) host-side components: marching-tetrahedra mesh extraction
(mcubes), built on demand with g++. Device-side hot kernels live in
segfusion_tpu.ops (JAX/Pallas) -- see SURVEY.md §2.5 for the mapping from
the reference's Cython/CUDA deps."""

from .mcubes import build_native, marching_cubes, native_available
