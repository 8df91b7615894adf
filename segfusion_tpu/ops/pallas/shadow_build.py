"""Pallas TPU kernel for the per-frame gather-shadow build.

``rowvol.build_shadow`` reconciles the 4-copy split scatter state into the
stride-64 packed-bf16 gather shadow once per frame. The XLA implementation
is a chain of pads/concats/stacks that materialises ~16 multi-hundred-MB
intermediates: measured 85 ms/frame at 448^3 (tools/probe_shadow_steps.py)
against ~5 ms of raw HBM traffic (read 2.7 GB f32 state + write 1.5 GB u32
shadow). This kernel does the whole reconcile -> pack -> restride in ONE
pass through VMEM.

Key structural fact (see rowvol.build_shadow): every output shadow row of
volume-x slice ``x`` depends ONLY on state rows of the same ``x`` -- the
y-realignment crosses q and the z-realignment crosses z-blocks, but
nothing crosses x. The grid therefore tiles (x, q-tile) with NO halo
exchange: the q-1 / q+1 neighbours needed by the cy-realignment are fed
as row-shifted *views* of the same flat state array (a shifted slice of
rows costs nothing), with the q==0 / q==Q-1 wrap garbage masked in-kernel
by a global-q iota.

Environment constraints honoured (probed in tools/probe_pallas_caps.py):
Mosaic here rejects f16 and 16-bit bitcasts, so the 16-bit halves are
bf16, packed through full-width f32<->i32 bitcasts only (see _pack16 --
the same format geometry.pack16_numw uses on the XLA side); 64-lane
static slices/concats, major-dim reshapes, 128-lane component slices,
and 3-D iota masks are all supported and used.

Reference semantics being reproduced: modules/extractor.py:640-681 reads
(tsdf, weight) pairs per trilinear corner; this shadow serves those reads
as packed (bf16 num | bf16 w) lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tq(Q: int, max_tq: int = 32) -> int:
    for tq in range(min(max_tq, Q), 0, -1):
        if Q % tq == 0:
            return tq
    return 1


def _pack16(num, w):
    """(bf16(num) << 16) | bf16(w) -- same format as geometry.pack16_numw.

    Native f32->bf16 converts (RTNE) with only full-width f32<->i32
    bitcasts: Mosaic on this stack cannot lower f16 or 16-bit bitcasts
    (probed in tools/probe_pallas_caps.py), but bf16's bit pattern is
    simply the high half of the widened f32, so no 16-bit type is ever
    materialised. ~4 ops/element vs ~28 for the earlier integer-RTNE f16
    pack, which dominated the kernel's VPU time."""
    nb = jax.lax.bitcast_convert_type(
        num.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    wb = jax.lax.bitcast_convert_type(
        w.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    hi = nb & jnp.int32(-65536)              # 0xFFFF0000 in signed i32
    lo = (wb >> 16) & jnp.int32(0xFFFF)      # mask the arith-shift fill
    return jax.lax.bitcast_convert_type(hi | lo, jnp.uint32)


def _kernel(c00, c01, c10, c11, s00, s01, s10, s11, out,
            *, TQ, Q, ZB0, ZB1, NBS):
    """One (x, q-tile) block: 4 direct copy views + 4 q-shifted views in,
    (2, 1, TQ*NBS, 256) packed shadow rows out."""
    j = pl.program_id(1)
    q0 = j * TQ

    # global-q masks for the shifted views (the shift is a row-offset view
    # of the flat state; at q==0 / q==Q-1 it reads a neighbouring x's rows
    # and must contribute zero, exactly like the XLA qshift's zero-pad)
    qg = q0 + jax.lax.broadcasted_iota(jnp.int32, (TQ, 1, 1), 0)
    mnext = jnp.where(qg < Q - 1, 1.0, 0.0)     # row q+1 valid
    mprev = jnp.where(qg > 0, 1.0, 0.0)         # row q-1 valid

    def view(ref, nblk, mask=None):
        v = ref[0].reshape(TQ, nblk, 512)
        return v if mask is None else v * mask

    def comps(v):
        return [v[:, :, 128 * i:128 * (i + 1)] for i in range(4)]

    d0 = _zmerge(comps(view(c00, ZB0)), comps(view(c01, ZB1)), TQ, ZB0, ZB1)
    d1 = _zmerge(comps(view(c10, ZB0)), comps(view(c11, ZB1)), TQ, ZB0, ZB1)
    # q-shifted d's from the shifted views (shift commutes with zmerge)
    d0m = _zmerge(comps(view(s00, ZB0, mnext)),
                  comps(view(s01, ZB1, mnext)), TQ, ZB0, ZB1)  # d0 at q+1
    d1p = _zmerge(comps(view(s10, ZB0, mprev)),
                  comps(view(s11, ZB1, mprev)), TQ, ZB0, ZB1)  # d1 at q-1

    # component order: [numA, numB, wA, wB]. Note pair (cy=0, col B) and
    # pair (cy=1, col A) are the SAME sums (both are y-column 2q+1 seen
    # from either parity) -- pack and restride them once.
    p0a = _blocks64(_pack16(d0[0] + d1p[1], d0[2] + d1p[3]), TQ, ZB0)
    mid = _blocks64(_pack16(d0[1] + d1[0], d0[3] + d1[2]), TQ, ZB0)
    p1b = _blocks64(_pack16(d1[1] + d0m[0], d1[3] + d0m[2]), TQ, ZB0)

    out[0, 0] = jnp.concatenate([p0a, mid], axis=-1).reshape(TQ * NBS, 256)
    out[1, 0] = jnp.concatenate([mid, p1b], axis=-1).reshape(TQ * NBS, 256)


def _lo64(shape):
    """lane < 64 mask (Mosaic: 64-lane slices carry a lane offset that
    concats reject, so half-lane ops use roll + this mask instead)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) < 64


def _zmerge(s0, s1, TQ, ZB0, ZB1):
    """Per component: add the cz=1 copy (blocks at z = 128b - 64, stored
    at b-1) into the cz=0 128-grid. Mirrors rowvol.build_shadow's zmerge
    on a q-tile: merged lanes [:64] += hi[k-1], lanes [64:] += lo[k]."""
    from jax.experimental.pallas import tpu as pltpu
    outs = []
    for c0, c1 in zip(s0, s1):
        # r: lanes [0:64] = hi (c1 lanes 64:), lanes [64:128] = lo
        r = pltpu.roll(c1, 64, c1.ndim - 1)
        zb = jnp.zeros((TQ, 1, 128), c1.dtype)
        rshift = jnp.concatenate([zb, r], axis=1)[:, :ZB0]  # r at blk k-1
        rpad = (jnp.concatenate(
            [r, jnp.zeros((TQ, ZB0 - ZB1, 128), c1.dtype)], axis=1)
            if ZB0 > ZB1 else r[:, :ZB0])
        outs.append(c0 + jnp.where(_lo64(rpad.shape), rshift, rpad))
    return outs


def _blocks64(p, TQ, ZB0):
    """128-grid (TQ, ZB0, 128) -> stride-64 (TQ, 2*ZB0, 128) blocks:
    even block 2k = grid block k; odd 2k+1 = [k lanes 64: | k+1 lanes :64]."""
    from jax.experimental.pallas import tpu as pltpu
    nxt = jnp.concatenate(
        [p[:, 1:], jnp.zeros((TQ, 1, 128), p.dtype)], axis=1)
    rp = pltpu.roll(p, 64, 2)      # lanes[:64] = p hi
    rn = pltpu.roll(nxt, 64, 2)    # lanes[64:] = nxt lo
    odd = jnp.where(_lo64(rp.shape), rp, rn)
    return jnp.stack([p, odd], axis=2).reshape(TQ, 2 * ZB0, 128)


def build_shadow_pallas(geo: jnp.ndarray, layout, interpret: bool = False,
                        max_tq: int = 32) -> jnp.ndarray:
    """Drop-in Pallas replacement for ``rowvol.build_shadow`` (bit-exact:
    same reconcile arithmetic, same f32->bf16 RTNE packing)."""
    L = layout
    X, Q, ZB0, ZB1, NBS = L.X, L.Q, L.ZB0, L.ZB1, L.NBS
    TQ = _pick_tq(Q, max_tq)
    n0, n1 = X * Q * ZB0, X * Q * ZB1
    offs = {  # copy start rows in the flat state (see rowvol layout)
        (0, 0): 0,
        (0, 1): n0,
        (1, 0): n0 + n1,
        (1, 1): 2 * n0 + n1,
    }

    def direct(cy, cz):
        nblk = ZB1 if cz else ZB0
        off = offs[(cy, cz)]
        return geo[off:off + X * Q * nblk].reshape(X, Q * nblk, 512)

    def shifted(cy, cz, dq):
        """Row view shifted so local row q holds copy row q+dq; the wrap
        rows at x boundaries are masked in-kernel."""
        nblk = ZB1 if cz else ZB0
        off = offs[(cy, cz)] + dq * nblk
        lo, hi = max(off, 0), min(off + X * Q * nblk, geo.shape[0])
        v = geo[lo:hi]
        pads = (lo - off, off + X * Q * nblk - hi)
        if pads != (0, 0):
            v = jnp.pad(v, ((pads[0], pads[1]), (0, 0)))
        return v.reshape(X, Q * nblk, 512)

    inputs = [direct(0, 0), direct(0, 1), direct(1, 0), direct(1, 1),
              shifted(0, 0, +1), shifted(0, 1, +1),   # d0 at q+1
              shifted(1, 0, -1), shifted(1, 1, -1)]   # d1 at q-1

    def spec(nblk):
        return pl.BlockSpec((1, TQ * nblk, 512), lambda x, j: (x, j, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, TQ=TQ, Q=Q, ZB0=ZB0, ZB1=ZB1, NBS=NBS),
        grid=(X, Q // TQ),
        in_specs=[spec(ZB0), spec(ZB1), spec(ZB0), spec(ZB1),
                  spec(ZB0), spec(ZB1), spec(ZB0), spec(ZB1)],
        out_specs=pl.BlockSpec((2, 1, TQ * NBS, 256),
                               lambda x, j: (0, x, j, 0)),
        out_shape=jax.ShapeDtypeStruct((2, X, Q * NBS, 256), jnp.uint32),
        interpret=interpret,
    )(*inputs)
    return out.reshape(L.shadow_rows, 256)
