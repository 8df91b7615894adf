"""Row-layout scene state: 128-lane-row gather/scatter for the fusion hot
path.

Motivation (measured on TPU v5e, tools/probe_row_ops.py /
probe_row_widths.py): XLA random access costs ~8-15 ns per
scattered/gathered ELEMENT, but whole lane-aligned ROWS of a 2-D operand
move for about the same price per ROW (gather u32: 13.2/16.3/20.6 ns at
width 128/256/512; scatter-add f32: 15.8/21.3/27.9; scatter-max i32
128: 18, 256: 25.3). The reference integration hot path
(modules/integrator.py:55-124, modules/extractor.py:640-681) is
scalar-random-access bound at 8 accesses per (ray, sample); grouping
those accesses into rows cuts the random-op count 4x on the gather side
and 8x on the scatter side:

  * z in lanes: the trilinear z-corner pair (z, z+-1) is 2 lanes of one
    128-lane z-block;
  * y-pairing: the y-corner pair (y, y+-1) is 2 adjacent columns, laid
    side by side in a 256/512-lane row;
  * num|w interleave: the two scatter-add targets share one row.

So ONE 256-lane gather serves 4 of the 8 corners (both y, both z) and
ONE 512-lane scatter-add applies 8 of the 16 scalar update elements
(4 corners x {num, w}); per (ray, sample) that is 2 gathers + 2
scatter-adds + 2 scatter-maxes instead of 8 + 16 + 8 scalar ops.

Straddle-free by construction
-----------------------------
* Gather shadow (read-only, rebuilt per frame): u32-packed
  (num f16 | w f16), 2 y-parity copies, z-blocks OVERLAPPED with stride
  112 -- any z-run of length <= 16 lies fully inside block
  ``z_lo // 112``, so the z-pair never straddles a block; the y-parity
  copy ``y_lo % 2`` holds the y-pair in one row.
* Scatter state (persistent, donated): 4 copies indexed by
  (y-parity cy, z-parity cz). Copy cz=1's z-blocks start 64 lanes early;
  a z-pair straddles cz=0 only when z_lo % 128 == 127 and cz=1 only when
  z_lo % 128 == 63, never both. Scatter combiners are linear (add) /
  monotone (max), so the true state is reconcile(copies) -- computed only
  at read boundaries (per-frame shadow build, scan-exit materialise).

All shapes static; invalid corners/rays are zero-weight (or zero-key)
lanes, exactly like the flat path (ops/integrate.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["RowLayout", "RowVolume", "rows_from_volume", "volume_from_rows",
           "build_shadow", "corner_rows", "extract_rows", "integrate_rows"]

_SHADOW_STRIDE = 112  # 128-wide blocks every 112 z: runs <= 16 never straddle


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class RowLayout(NamedTuple):
    """Static layout constants derived from the canonical volume shape."""
    X: int
    Y: int
    Z: int
    Zp: int      # z padded to a multiple of 128
    ZB: int      # z-blocks per copy (uniform: Zp//128 + 1 covers cz=1)
    Q: int       # y-pairs per copy (uniform: Y//2 + 1 covers cy=1)
    NBS: int     # shadow z-blocks (stride 112)

    @staticmethod
    def for_shape(shape: Tuple[int, int, int]) -> "RowLayout":
        X, Y, Z = int(shape[0]), int(shape[1]), int(shape[2])
        Zp = _cdiv(Z, 128) * 128
        return RowLayout(X=X, Y=Y, Z=Z, Zp=Zp, ZB=Zp // 128 + 1,
                         Q=Y // 2 + 1, NBS=_cdiv(Zp, _SHADOW_STRIDE))

    # scatter-state rows: copies (cy, cz) outermost, then (x, q, b)
    @property
    def rows(self) -> int:
        return 4 * self.X * self.Q * self.ZB

    @property
    def shadow_rows(self) -> int:
        return 2 * self.X * self.Q * self.NBS


class RowVolume(NamedTuple):
    """Scene state in scatter-row form (carried through row-path scans;
    converted from/to SceneVolume at scan boundaries)."""
    geo: jnp.ndarray      # (rows, 512) f32 lanes [numA|numB|wA|wB]
    key: jnp.ndarray      # (rows, 256) i32 lanes [keyA|keyB]
    origin: jnp.ndarray
    resolution: jnp.ndarray
    init_value: float


# -- canonical <-> rows -------------------------------------------------------

def _pad_yz(a, L: RowLayout):
    """(X, Y, Z) -> (X, 2Q + 1, Zp): y padded for both parities' pair
    grids, z padded to Zp."""
    return jnp.pad(a, ((0, 0), (0, 2 * L.Q + 1 - L.Y), (0, L.Zp - L.Z)))


def rows_from_volume(num, w, key, layout: RowLayout):
    """Split-copy row state from canonical (X, Y, Z) arrays. All mass
    goes to copy (cy=0, cz=0); the other three copies start at the
    combiner's neutral element (0 for add; 0 for the non-negative packed
    key's max)."""
    L = layout

    def pairs00(a):
        """canonical -> (X, Q, ZB*128) for copy (0, 0): A=2q, B=2q+1,
        z-block b starts at 128b."""
        ap = _pad_yz(a, L)                       # (X, 2Q+1, Zp)
        A = ap[:, 0:2 * L.Q:2]                   # (X, Q, Zp)
        B = ap[:, 1:2 * L.Q + 1:2]
        zpad = ((0, 0), (0, 0), (0, L.ZB * 128 - L.Zp))
        return jnp.pad(A, zpad), jnp.pad(B, zpad)

    nA, nB = pairs00(num.astype(jnp.float32))
    wA, wB = pairs00(w.astype(jnp.float32))
    geo00 = jnp.concatenate(
        [x.reshape(L.X, L.Q, L.ZB, 128) for x in (nA, nB, wA, wB)],
        axis=-1).reshape(L.X * L.Q * L.ZB, 512)
    geo = jnp.concatenate(
        [geo00, jnp.zeros((3 * L.X * L.Q * L.ZB, 512), jnp.float32)],
        axis=0)

    kA, kB = pairs00(key.astype(jnp.int32))
    key00 = jnp.concatenate(
        [x.reshape(L.X, L.Q, L.ZB, 128) for x in (kA, kB)],
        axis=-1).reshape(L.X * L.Q * L.ZB, 256)
    krows = jnp.concatenate(
        [key00, jnp.zeros((3 * L.X * L.Q * L.ZB, 256), jnp.int32)],
        axis=0)
    return geo, krows


def _copy_to_canonical(part, cy: int, cz: int, L: RowLayout):
    """One copy's one component: (X, Q, ZB, 128) -> canonical (X, Y, Zp)
    contribution. A-lanes sit at y = 2q + cy, B at 2q + 1 + cy; z-block b
    covers z = 128b - 64cz + lane."""
    A, B = part                                   # each (X, Q, ZB, 128)
    flat = [x.reshape(L.X, L.Q, L.ZB * 128) for x in (A, B)]
    if cz == 1:
        flat = [x[:, :, 64:64 + L.Zp] for x in flat]
    else:
        flat = [x[:, :, :L.Zp] for x in flat]
    inter = jnp.stack(flat, axis=2).reshape(L.X, 2 * L.Q, L.Zp)
    if cy == 1:
        inter = jnp.pad(inter, ((0, 0), (1, 0), (0, 0)))
    return inter[:, :L.Y, :]


def volume_from_rows(geo, key, layout: RowLayout):
    """Reconcile the four copies back to canonical (X, Y, Z)."""
    L = layout
    geo = geo.reshape(4, L.X, L.Q, L.ZB, 512)
    key = key.reshape(4, L.X, L.Q, L.ZB, 256)

    num = jnp.zeros((L.X, L.Y, L.Zp), jnp.float32)
    w = jnp.zeros((L.X, L.Y, L.Zp), jnp.float32)
    k = jnp.zeros((L.X, L.Y, L.Zp), jnp.int32)
    for cy in (0, 1):
        for cz in (0, 1):
            c = cy * 2 + cz
            g = geo[c]
            num = num + _copy_to_canonical((g[..., 0:128], g[..., 128:256]),
                                           cy, cz, L)
            w = w + _copy_to_canonical((g[..., 256:384], g[..., 384:512]),
                                       cy, cz, L)
            kk = key[c]
            k = jnp.maximum(k, _copy_to_canonical(
                (kk[..., 0:128], kk[..., 128:256]), cy, cz, L))
    return num[:, :, :L.Z], w[:, :, :L.Z], k[:, :, :L.Z]


# -- gather shadow ------------------------------------------------------------

def build_shadow(geo, layout: RowLayout) -> jnp.ndarray:
    """Split state -> (shadow_rows, 256) u32 y-paired overlapped-z
    shadow of packed (num f16 | w f16). One fused dense pass per frame."""
    L = layout
    g = geo.reshape(4, L.X, L.Q, L.ZB, 512)
    num = jnp.zeros((L.X, L.Y, L.Zp), jnp.float32)
    w = jnp.zeros((L.X, L.Y, L.Zp), jnp.float32)
    for cy in (0, 1):
        for cz in (0, 1):
            c = cy * 2 + cz
            gg = g[c]
            num = num + _copy_to_canonical(
                (gg[..., 0:128], gg[..., 128:256]), cy, cz, L)
            w = w + _copy_to_canonical(
                (gg[..., 256:384], gg[..., 384:512]), cy, cz, L)

    num16 = jax.lax.bitcast_convert_type(
        num.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    w16 = jax.lax.bitcast_convert_type(
        w.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    packed = (num16 << 16) | w16                  # (X, Y, Zp)

    packed = jnp.pad(packed, ((0, 0), (0, 2 * L.Q + 1 - L.Y), (0, 0)))
    copies = []
    for cy in (0, 1):
        A = packed[:, cy:cy + 2 * L.Q:2]          # (X, Q, Zp)
        B = packed[:, cy + 1:cy + 1 + 2 * L.Q:2]
        blocks = []
        for src in (A, B):
            bl = []
            for b in range(L.NBS):
                lo = b * _SHADOW_STRIDE
                if lo + 128 <= L.Zp:
                    bl.append(src[:, :, lo:lo + 128])
                else:
                    bl.append(jnp.pad(src[:, :, lo:L.Zp],
                                      ((0, 0), (0, 0),
                                       (0, lo + 128 - L.Zp))))
            blocks.append(jnp.stack(bl, axis=2))  # (X, Q, NBS, 128)
        copies.append(jnp.concatenate(blocks, axis=-1))
    return jnp.stack(copies, axis=0).reshape(L.shadow_rows, 256)


# -- corner geometry ----------------------------------------------------------

class CornerRows(NamedTuple):
    """Row-grouped trilinear corner data, shapes (n, p[, 2])."""
    g_rows: jnp.ndarray    # (n, p, 2) shadow row per x-corner
    s_rows: jnp.ndarray    # (n, p, 2) scatter row per x-corner
    lane0: jnp.ndarray     # (n, p) shadow lane of z-corner 0 (within A)
    lane1: jnp.ndarray     # (n, p) shadow lane of z-corner 1
    slane0: jnp.ndarray    # (n, p) scatter lane of z-corner 0
    slane1: jnp.ndarray    # (n, p) scatter lane of z-corner 1
    wx: jnp.ndarray        # (n, p, 2) x-corner weights
    vx: jnp.ndarray        # (n, p, 2) x-corner validity
    wyA: jnp.ndarray       # (n, p) weight mass on column A (pair low y)
    wyB: jnp.ndarray       # (n, p) weight mass on column B
    vyA: jnp.ndarray       # (n, p) column A in-bounds
    vyB: jnp.ndarray       # (n, p) column B in-bounds
    wz0: jnp.ndarray       # (n, p) z-corner-0 weight
    wz1: jnp.ndarray       # (n, p) z-corner-1 weight
    vz0: jnp.ndarray       # (n, p) z-corner-0 in-bounds
    vz1: jnp.ndarray       # (n, p) z-corner-1 in-bounds


def corner_rows(points_v: jnp.ndarray, layout: RowLayout) -> CornerRows:
    """Row/lane/weight decomposition of the 8 trilinear corners -- same
    candidate/weight math as geometry.interpolation_weights (reference
    'center' scheme, modules/extractor.py:533-593)."""
    L = layout
    idx = jnp.floor(points_v)
    center = idx + 0.5
    neighbor = jnp.sign(center - points_v)
    alpha = jnp.abs(points_v - center)

    def axis(a, dim):
        c0 = idx[..., a].astype(jnp.int32)
        c1 = (idx[..., a] + neighbor[..., a]).astype(jnp.int32)
        v0 = (c0 >= 0) & (c0 < dim)
        v1 = (c1 >= 0) & (c1 < dim)
        return c0, c1, v0, v1, 1.0 - alpha[..., a], alpha[..., a]

    x0, x1, vx0, vx1, wx0, wx1 = axis(0, L.X)
    y0, y1, vy0, vy1, wy0, wy1 = axis(1, L.Y)
    z0, z1, vz0, vz1, wz0, wz1 = axis(2, L.Z)

    # --- y pair: physical columns A = y_lo, B = y_lo + 1 (clipped pair
    # base so out-of-range corners fall on masked, not wrong, columns);
    # map the two y candidates onto them by comparison.
    y_lo_c = jnp.clip(jnp.minimum(y0, y1), 0, L.Y - 1)
    yA, yB = y_lo_c, y_lo_c + 1
    wyA = jnp.where(y0 == yA, wy0, 0.0) + jnp.where(y1 == yA, wy1, 0.0)
    wyB = jnp.where(y0 == yB, wy0, 0.0) + jnp.where(y1 == yB, wy1, 0.0)
    vyA = ((y0 == yA) & vy0) | ((y1 == yA) & vy1)
    vyB = ((y0 == yB) & vy0) | ((y1 == yB) & vy1)
    cy = y_lo_c % 2
    q = y_lo_c // 2

    # --- z pair lanes
    z_lo = jnp.clip(jnp.minimum(z0, z1), 0, L.Zp - 1)
    z0c = jnp.clip(z0, 0, L.Zp - 1)
    z1c = jnp.clip(z1, 0, L.Zp - 1)
    # shadow (overlapped blocks; run of <= 2 fits block z_lo // 112)
    gb = z_lo // _SHADOW_STRIDE
    lane0 = z0c - gb * _SHADOW_STRIDE
    lane1 = z1c - gb * _SHADOW_STRIDE
    # scatter (z-parity copies)
    use_cz1 = (z_lo % 128 == 127) & (z1c != z0c)
    cz = use_cz1.astype(jnp.int32)
    b0 = z_lo // 128
    b1 = (z_lo + 64) // 128
    sb = jnp.where(use_cz1, b1, b0)
    base = jnp.where(use_cz1, b1 * 128 - 64, b0 * 128)
    slane0 = z0c - base
    slane1 = z1c - base

    # --- rows per x-corner
    xs = jnp.stack([jnp.clip(x0, 0, L.X - 1),
                    jnp.clip(x1, 0, L.X - 1)], axis=-1)   # (n, p, 2)
    g_rows = ((cy[..., None] * L.X + xs) * L.Q + q[..., None]) * L.NBS \
        + gb[..., None]
    s_rows = (((cy * 2 + cz)[..., None] * L.X + xs) * L.Q
              + q[..., None]) * L.ZB + sb[..., None]

    return CornerRows(
        g_rows=g_rows, s_rows=s_rows,
        lane0=lane0, lane1=lane1, slane0=slane0, slane1=slane1,
        wx=jnp.stack([wx0, wx1], -1).astype(jnp.float32),
        vx=jnp.stack([vx0, vx1], -1),
        wyA=wyA.astype(jnp.float32), wyB=wyB.astype(jnp.float32),
        vyA=vyA, vyB=vyB,
        wz0=wz0.astype(jnp.float32), wz1=wz1.astype(jnp.float32),
        vz0=vz0, vz1=vz1)


# -- extraction ---------------------------------------------------------------

def _pick2(rows: jnp.ndarray, lane0, lane1):
    """rows (..., 128): select two lanes per row without a gather --
    one-hot multiply + lane reduction (VPU)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
    h0 = iota == lane0[..., None]
    h1 = iota == lane1[..., None]
    z = jnp.zeros_like(rows)
    g0 = jnp.sum(jnp.where(h0, rows, z), axis=-1)
    g1 = jnp.sum(jnp.where(h1, rows, z), axis=-1)
    return g0, g1


def _unpack(g):
    num = jax.lax.bitcast_convert_type(
        (g >> 16).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    w = jax.lax.bitcast_convert_type(
        (g & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return num, w


def extract_rows(shadow: jnp.ndarray, cr: CornerRows, init_value: float,
                 fill_value: float):
    """Trilinear (fusion_values, fusion_weights): TWO 256-lane row
    gathers per (ray, sample) -- numerically the packed-f16 flat path
    (geometry.trilinear_gather_packed16) with 4x fewer random accesses."""
    rows = jnp.take(shadow, cr.g_rows, axis=0)        # (n, p, 2, 256)
    ex = lambda t: t[..., None]                       # add x-corner axis

    def column(col_rows, vy, wy):
        g0, g1 = _pick2(col_rows, ex(cr.lane0), ex(cr.lane1))
        n0, w0 = _unpack(g0)
        n1, w1 = _unpack(g1)

        def corner(nc, wc, vz):
            v = jnp.where(wc > 0, nc / jnp.maximum(wc, 1e-12),
                          jnp.float32(init_value))
            valid = cr.vx & ex(vy & vz)
            return (jnp.where(valid, v, jnp.float32(fill_value)),
                    jnp.where(valid, wc, 0.0))

        v0, fw0 = corner(n0, w0, cr.vz0)
        v1, fw1 = corner(n1, w1, cr.vz1)
        wz0, wz1 = ex(cr.wz0), ex(cr.wz1)
        wyx = ex(wy)
        return (wyx * (wz0 * v0 + wz1 * v1),
                wyx * (wz0 * fw0 + wz1 * fw1))

    vA, wA = column(rows[..., 0:128], cr.vyA, cr.wyA)
    vB, wB = column(rows[..., 128:256], cr.vyB, cr.wyB)
    fusion_values = jnp.sum(cr.wx * (vA + vB), axis=-1)
    fusion_weights = jnp.sum(cr.wx * (wA + wB), axis=-1)
    # y-corners whose column fell outside the clipped pair are always out
    # of bounds: they read fill_value with their full trilinear weight
    # (reference container scheme) but carry no fusion weight. Per-axis
    # weights each sum to 1, so their collective mass is 1 - wyA - wyB.
    fusion_values = fusion_values \
        + (1.0 - cr.wyA - cr.wyB) * jnp.float32(fill_value)
    return fusion_values, fusion_weights


# -- integration --------------------------------------------------------------

def _two_lane_vec(width, lane0, lane1, v0, v1):
    """(..., width) vector with v0 at lane0 + v1 at lane1 (summing when
    the lanes coincide, the degenerate sign-0 corner case)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, lane0.shape + (width,),
                                    lane0.ndim)
    return (jnp.where(iota == lane0[..., None], v0[..., None], 0)
            + jnp.where(iota == lane1[..., None], v1[..., None], 0))


def integrate_rows(geo, key, cr: CornerRows, values, sem_key, ray_mask,
                   n_tail: int):
    """Scatter the frame's updates into the split row state: ONE 512-lane
    scatter-add (num and w, both y columns, both z corners) and ONE
    256-lane scatter-max per (ray, tail-sample, x-corner). Reference
    update math: modules/integrator.py:55-124."""
    t = n_tail

    def cut(a):
        return a[:, :t]

    wx = cut(cr.wx) * cut(cr.vx)
    if ray_mask is not None:
        wx = wx * ray_mask[:, None, None]
    wz0 = cut(cr.wz0) * cut(cr.vz0)
    wz1 = cut(cr.wz1) * cut(cr.vz1)
    wyA = cut(cr.wyA) * cut(cr.vyA)
    wyB = cut(cr.wyB) * cut(cr.vyB)
    vals = values[:, :t].astype(jnp.float32)

    # z-pair lanes, broadcast over the x-corner axis: (n, t, 2)
    l0 = jnp.broadcast_to(cut(cr.slane0)[..., None], wx.shape)
    l1 = jnp.broadcast_to(cut(cr.slane1)[..., None], wx.shape)

    def geo_lanes(wy):
        # one y column's (n, t, 2, 128) lane vectors
        w0 = wx * (wy * wz0)[..., None]
        w1 = wx * (wy * wz1)[..., None]
        wvec = _two_lane_vec(128, l0, l1, w0, w1)
        nvec = _two_lane_vec(128, l0, l1, w0 * vals[..., None],
                             w1 * vals[..., None])
        return nvec, wvec

    # lanes [numA | numB | wA | wB]
    nA, wvA = geo_lanes(wyA)
    nB, wvB = geo_lanes(wyB)
    upd = jnp.concatenate([nA, nB, wvA, wvB], axis=-1)    # (n, t, 2, 512)
    rows = cut(cr.s_rows).reshape(-1)
    new_geo = geo.at[rows].add(upd.reshape(-1, 512))

    if sem_key is None:
        return new_geo, key
    k = sem_key.astype(jnp.int32)[:, None, None]
    if ray_mask is not None:
        k = jnp.where(ray_mask[:, None, None], k, 0)
    kx = jnp.where(cut(cr.vx), k, 0)                      # (n, t, 2)

    def key_lanes(vy, vz, lane):
        kc = jnp.where((vy & vz)[..., None], kx, 0)
        return _two_lane_vec(128, lane, lane, kc, jnp.zeros_like(kc))

    def column_keys(vy):
        return jnp.maximum(key_lanes(vy, cut(cr.vz0).astype(bool), l0),
                           key_lanes(vy, cut(cr.vz1).astype(bool), l1))

    kA = column_keys(cut(cr.vyA).astype(bool))
    kB = column_keys(cut(cr.vyB).astype(bool))
    kupd = jnp.concatenate([kA, kB], axis=-1)             # (n, t, 2, 256)
    new_key = key.at[rows].max(kupd.reshape(-1, 256))
    return new_geo, new_key
