"""TV-L1 TSDF refinement (Zach et al. primal-dual).

Device-side equivalent of the reference's (unused but shipped) CUDA TV-L1
refiner (reference deps/mesh-fusion/libfusiongpu/fusion_zach_tvl1.cu:3-60):
minimises  TV(u) + lambda * sum_i w_i |u - f_i|  over the voxel grid with a
first-order primal-dual scheme. Here the histogram data term is simplified
to the fused observation (f = tsdf, w = weights), which is the common
single-observation form:  TV(u) + lambda * w |u - f|.

The iteration is a ``lax.fori_loop`` of pure elementwise + shift ops --
bandwidth-bound, VPU-friendly, no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["tvl1_refine"]


def _grad(u):
    """Forward differences with replicated boundary (zero flux)."""
    gx = jnp.concatenate([u[1:] - u[:-1], jnp.zeros_like(u[:1])], axis=0)
    gy = jnp.concatenate([u[:, 1:] - u[:, :-1],
                          jnp.zeros_like(u[:, :1])], axis=1)
    gz = jnp.concatenate([u[:, :, 1:] - u[:, :, :-1],
                          jnp.zeros_like(u[:, :, :1])], axis=2)
    return gx, gy, gz


def _div(px, py, pz):
    """Backward-difference divergence (adjoint of _grad)."""
    dx = jnp.concatenate([px[:1], px[1:-1] - px[:-2], -px[-2:-1]], axis=0)
    dy = jnp.concatenate([py[:, :1], py[:, 1:-1] - py[:, :-2],
                          -py[:, -2:-1]], axis=1)
    dz = jnp.concatenate([pz[:, :, :1], pz[:, :, 1:-1] - pz[:, :, :-2],
                          -pz[:, :, -2:-1]], axis=2)
    return dx + dy + dz


@functools.partial(jax.jit, static_argnames=("n_iters",))
def tvl1_refine(tsdf: jnp.ndarray, weights: jnp.ndarray,
                lam: float = 0.5, n_iters: int = 50,
                tau: float = 0.125, sigma: float = 0.125) -> jnp.ndarray:
    """Refine a fused TSDF volume with TV-L1 regularisation.

    Args:
      tsdf: (x, y, z) fused values f.
      weights: (x, y, z) observation weights (0 = unobserved; those voxels
        are driven purely by the TV term).
      lam: data-term weight.
      n_iters: primal-dual iterations.

    Returns:
      refined (x, y, z) volume.
    """
    f = tsdf.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    u = f
    ubar = f
    p = (jnp.zeros_like(f),) * 3

    def body(_, state):
        u, ubar, px, py, pz = state
        # dual ascent + projection onto |p| <= 1
        gx, gy, gz = _grad(ubar)
        px = px + sigma * gx
        py = py + sigma * gy
        pz = pz + sigma * gz
        norm = jnp.maximum(1.0, jnp.sqrt(px * px + py * py + pz * pz))
        px, py, pz = px / norm, py / norm, pz / norm
        # primal descent + weighted L1 shrinkage toward f
        u_old = u
        v = u + tau * _div(px, py, pz)
        thresh = tau * lam * w
        diff = v - f
        u = f + jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - thresh, 0.0)
        ubar = 2.0 * u - u_old
        return (u, ubar, px, py, pz)

    u, _, _, _, _ = jax.lax.fori_loop(0, n_iters, body,
                                      (u, ubar, *p))
    return u
