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

HBM-exact sizing (v5e has 16 GB; a 448^3 scene must fit with headroom):
* per-copy block counts are EXACT, not uniform: cz=0 copies hold
  ``ZB0 = ceil(Z/128)`` blocks, cz=1 copies only the ``ZB1`` blocks a
  straddle can actually hit (b in [1, (Z-1)//128], stored at b-1) --
  30% smaller state than uniform padding at 448^3;
* voxel coordinates are clipped to the REAL extent (Z-1), never the
  padded one, so shadow block count is ``(Z-1)//112 + 1``;
* the per-frame update tensors ((n, t, 2, 512) would be GBs at 256^2
  rays) are built CHUNKED: extraction maps over ray chunks, integration
  scans ray chunks through the donated state, so transients stay at a
  few hundred MB regardless of frame size.

All shapes static; invalid corners/rays are zero-weight (or zero-key)
lanes, exactly like the flat path (ops/integrate.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["RowLayout", "RowVolume", "rows_from_volume", "volume_from_rows",
           "build_shadow", "corner_rows", "extract_rows", "integrate_rows"]

_SHADOW_STRIDE = 112  # 128-wide blocks every 112 z: runs <= 16 never straddle

# transient-memory targets for the chunked per-frame passes (rays/chunk)
_EXTRACT_CHUNK = 8192   # gather temp ~ chunk*p*2*256*4B  (~150 MB at p=9)
_INTEGRATE_CHUNK = 4096  # update temp ~ chunk*t*2*768*4B (~175 MB at t=7)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _nchunks(n: int, target: int) -> int:
    """Smallest chunk count that divides n with chunks <= target."""
    k = _cdiv(n, target)
    while n % k:
        k += 1
    return k


class RowLayout(NamedTuple):
    """Static layout constants derived from the canonical volume shape."""
    X: int
    Y: int
    Z: int
    Zp: int      # ZB0 * 128
    ZB0: int     # z-blocks per cz=0 copy: ceil(Z/128)
    ZB1: int     # z-blocks per cz=1 copy: blocks 1..(Z-1)//128, stored -1
    Q: int       # y-pairs per copy: ceil(Y/2)
    NBS: int     # shadow z-blocks (stride 112): (Z-1)//112 + 1
    Zsh: int     # shadow source z extent: 112*(NBS-1) + 128

    @staticmethod
    def for_shape(shape: Tuple[int, int, int]) -> "RowLayout":
        X, Y, Z = int(shape[0]), int(shape[1]), int(shape[2])
        ZB0 = _cdiv(Z, 128)
        # a z-pair straddles cz=0 only from z_lo = 128k + 127 <= Z - 2,
        # landing in cz=1 block b = k + 1 -- so blocks 1..(Z-1)//128
        ZB1 = max((Z - 1) // 128 if Z >= 129 else 0, 1)
        NBS = (Z - 1) // _SHADOW_STRIDE + 1
        return RowLayout(X=X, Y=Y, Z=Z, Zp=ZB0 * 128, ZB0=ZB0, ZB1=ZB1,
                         Q=_cdiv(Y, 2), NBS=NBS,
                         Zsh=_SHADOW_STRIDE * (NBS - 1) + 128)

    # scatter-state rows: copies (cy, cz) outermost, then (x, q, b)
    @property
    def rows(self) -> int:
        return 2 * self.X * self.Q * (self.ZB0 + self.ZB1)

    @property
    def shadow_rows(self) -> int:
        return 2 * self.X * self.Q * self.NBS

    def copy_blocks(self, cz: int) -> int:
        return self.ZB1 if cz else self.ZB0


class RowVolume(NamedTuple):
    """Scene state in scatter-row form (carried through row-path scans;
    converted from/to SceneVolume at scan boundaries)."""
    geo: jnp.ndarray      # (rows, 512) f32 lanes [numA|numB|wA|wB]
    key: jnp.ndarray      # (rows, 256) i32 lanes [keyA|keyB]
    origin: jnp.ndarray
    resolution: jnp.ndarray
    init_value: float


# -- canonical <-> rows -------------------------------------------------------

def rows_from_volume(num, w, key, layout: RowLayout):
    """Split-copy row state from canonical (X, Y, Z) arrays. All mass
    goes to copy (cy=0, cz=0); the other three copies start at the
    combiner's neutral element (0 for add; 0 for the non-negative packed
    key's max)."""
    L = layout
    s00 = L.X * L.Q * L.ZB0

    def pairs00(a):
        """canonical -> A/B (X, Q, Zp) for copy (0, 0): A = y 2q,
        B = 2q+1, z-block b starts at 128b."""
        ap = jnp.pad(a, ((0, 0), (0, 2 * L.Q - L.Y), (0, L.Zp - L.Z)))
        return ap[:, 0::2], ap[:, 1::2]

    nA, nB = pairs00(num.astype(jnp.float32))
    wA, wB = pairs00(w.astype(jnp.float32))
    geo00 = jnp.concatenate(
        [x.reshape(L.X, L.Q, L.ZB0, 128) for x in (nA, nB, wA, wB)],
        axis=-1).reshape(s00, 512)
    geo = jnp.concatenate(
        [geo00, jnp.zeros((L.rows - s00, 512), jnp.float32)], axis=0)

    kA, kB = pairs00(key.astype(jnp.int32))
    key00 = jnp.concatenate(
        [x.reshape(L.X, L.Q, L.ZB0, 128) for x in (kA, kB)],
        axis=-1).reshape(s00, 256)
    krows = jnp.concatenate(
        [key00, jnp.zeros((L.rows - s00, 256), jnp.int32)], axis=0)
    return geo, krows


def _place(A, B, cy: int, L: RowLayout):
    """One copy's one component: A/B (X, Q, span) -> (X, Y, span)
    canonical-y contribution. A-lanes sit at y = 2q + cy, B at
    2q + 1 + cy."""
    inter = jnp.stack([A, B], axis=2).reshape(L.X, 2 * L.Q, A.shape[-1])
    if cy == 1:
        inter = jnp.pad(inter, ((0, 0), (1, 0), (0, 0)))
    return inter[:, :L.Y]


def _reconcile(geo, key, layout: RowLayout, want_key: bool):
    """Sum/max the four copies back to canonical (X, Y, Z). Copy cz's
    z-block b covers z = 128*(b + cz) - 64*cz + lane (cz=1 blocks are
    stored shifted by one, starting at z = 64)."""
    L = layout
    zext = max(L.Zp, 64 + L.ZB1 * 128)
    num = jnp.zeros((L.X, L.Y, zext), jnp.float32)
    w = jnp.zeros((L.X, L.Y, zext), jnp.float32)
    k = jnp.zeros((L.X, L.Y, zext), jnp.int32) if want_key else None

    off = 0
    for cy in (0, 1):
        for cz in (0, 1):
            nblk = L.copy_blocks(cz)
            size = L.X * L.Q * nblk
            zoff, span = 64 * cz, nblk * 128
            gg = geo[off:off + size].reshape(L.X, L.Q, nblk, 512)
            nA, nB = gg[..., 0:128], gg[..., 128:256]
            wA, wB = gg[..., 256:384], gg[..., 384:512]
            flat = lambda t: t.reshape(L.X, L.Q, span)
            num = num.at[:, :, zoff:zoff + span].add(
                _place(flat(nA), flat(nB), cy, L))
            w = w.at[:, :, zoff:zoff + span].add(
                _place(flat(wA), flat(wB), cy, L))
            if want_key:
                kk = key[off:off + size].reshape(L.X, L.Q, nblk, 256)
                k = k.at[:, :, zoff:zoff + span].max(
                    _place(flat(kk[..., 0:128]), flat(kk[..., 128:256]),
                           cy, L))
            off += size
    cutz = lambda a: a[:, :, :L.Z]
    return cutz(num), cutz(w), cutz(k) if want_key else None


def volume_from_rows(geo, key, layout: RowLayout):
    """Reconcile the four copies back to canonical (X, Y, Z)."""
    num, w, k = _reconcile(geo, key, layout, want_key=True)
    return num, w, k


# -- gather shadow ------------------------------------------------------------

def build_shadow(geo, layout: RowLayout) -> jnp.ndarray:
    """Split state -> (shadow_rows, 256) u32 y-paired overlapped-z
    shadow of packed (num f16 | w f16). One fused dense pass per frame."""
    L = layout
    num, w, _ = _reconcile(geo, None, L, want_key=False)

    num16 = jax.lax.bitcast_convert_type(
        num.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    w16 = jax.lax.bitcast_convert_type(
        w.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    packed = (num16 << 16) | w16                  # (X, Y, Z)

    packed = jnp.pad(packed, ((0, 0), (0, 2 * L.Q + 1 - L.Y),
                              (0, L.Zsh - L.Z)))
    copies = []
    for cy in (0, 1):
        A = packed[:, cy:cy + 2 * L.Q:2]          # (X, Q, Zsh)
        B = packed[:, cy + 1:cy + 1 + 2 * L.Q:2]
        blocks = []
        for src in (A, B):
            bl = [src[:, :, b * _SHADOW_STRIDE:b * _SHADOW_STRIDE + 128]
                  for b in range(L.NBS)]
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

    # --- z pair lanes (clipped to the REAL extent so block counts stay
    # exact; invalid corners are weight-0/key-0 wherever they land)
    z0c = jnp.clip(z0, 0, L.Z - 1)
    z1c = jnp.clip(z1, 0, L.Z - 1)
    z_lo = jnp.minimum(z0c, z1c)
    # shadow (overlapped blocks; run of <= 2 fits block z_lo // 112)
    gb = z_lo // _SHADOW_STRIDE
    lane0 = z0c - gb * _SHADOW_STRIDE
    lane1 = z1c - gb * _SHADOW_STRIDE
    # scatter (z-parity copies; cz=1 block b stored at index b - 1)
    use_cz1 = (z_lo % 128 == 127) & (z1c != z0c)
    cz = use_cz1.astype(jnp.int32)
    b0 = z_lo // 128
    b1 = (z_lo + 64) // 128
    base = jnp.where(use_cz1, b1 * 128 - 64, b0 * 128)
    slane0 = z0c - base
    slane1 = z1c - base
    boff = jnp.where(use_cz1, b1 - 1, b0)
    zbc = jnp.where(use_cz1, L.ZB1, L.ZB0)

    # --- rows per x-corner
    xs = jnp.stack([jnp.clip(x0, 0, L.X - 1),
                    jnp.clip(x1, 0, L.X - 1)], axis=-1)   # (n, p, 2)
    g_rows = ((cy[..., None] * L.X + xs) * L.Q + q[..., None]) * L.NBS \
        + gb[..., None]
    cbase = cy * (L.X * L.Q * (L.ZB0 + L.ZB1)) + cz * (L.X * L.Q * L.ZB0)
    s_rows = cbase[..., None] \
        + (xs * L.Q + q[..., None]) * zbc[..., None] + boff[..., None]

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


def _extract_block(shadow, cr: CornerRows, init_value: float,
                   fill_value: float):
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


def extract_rows(shadow: jnp.ndarray, cr: CornerRows, init_value: float,
                 fill_value: float, chunk: int = _EXTRACT_CHUNK):
    """Trilinear (fusion_values, fusion_weights): TWO 256-lane row
    gathers per (ray, sample) -- numerically the packed-f16 flat path
    (geometry.trilinear_gather_packed16) with 4x fewer random accesses.
    Rays are processed in chunks so the gathered row tensor stays at a
    few hundred MB for full-resolution frames."""
    n = cr.g_rows.shape[0]
    k = _nchunks(n, chunk)
    if k == 1:
        return _extract_block(shadow, cr, init_value, fill_value)
    crk = jax.tree_util.tree_map(
        lambda a: a.reshape((k, n // k) + a.shape[1:]), cr)

    def body(_, crc):
        return None, _extract_block(shadow, crc, init_value, fill_value)

    _, (fv, fw) = jax.lax.scan(body, None, crk)
    return fv.reshape(n, -1), fw.reshape(n, -1)


# -- integration --------------------------------------------------------------

def _two_lane_vec(width, lane0, lane1, v0, v1):
    """(..., width) vector with v0 at lane0 + v1 at lane1 (summing when
    the lanes coincide, the degenerate sign-0 corner case)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, lane0.shape + (width,),
                                    lane0.ndim)
    return (jnp.where(iota == lane0[..., None], v0[..., None], 0)
            + jnp.where(iota == lane1[..., None], v1[..., None], 0))


class _UpdateBlock(NamedTuple):
    """Per-ray-chunk integration inputs (all leading dims (n, t, ...))."""
    rows: jnp.ndarray                 # (n, t, 2) scatter row per x-corner
    l0: jnp.ndarray                   # (n, t, 2) z-corner-0 lane
    l1: jnp.ndarray                   # (n, t, 2) z-corner-1 lane
    w0A: jnp.ndarray                  # (n, t, 2) weight, column A corner z0
    w1A: jnp.ndarray                  # (n, t, 2) column A corner z1
    w0B: jnp.ndarray                  # (n, t, 2) column B corner z0
    w1B: jnp.ndarray                  # (n, t, 2) column B corner z1
    vals: jnp.ndarray                 # (n, t) clamped tsdf updates
    k0A: Optional[jnp.ndarray]        # (n, t, 2) masked key, column A z0
    k1A: Optional[jnp.ndarray]
    k0B: Optional[jnp.ndarray]
    k1B: Optional[jnp.ndarray]


def _integrate_block(geo, key, b: _UpdateBlock):
    def geo_lanes(w0, w1):
        wvec = _two_lane_vec(128, b.l0, b.l1, w0, w1)
        nvec = _two_lane_vec(128, b.l0, b.l1, w0 * b.vals[..., None],
                             w1 * b.vals[..., None])
        return nvec, wvec

    nA, wvA = geo_lanes(b.w0A, b.w1A)
    nB, wvB = geo_lanes(b.w0B, b.w1B)
    upd = jnp.concatenate([nA, nB, wvA, wvB], axis=-1)    # (n, t, 2, 512)
    rows = b.rows.reshape(-1)
    geo = geo.at[rows].add(upd.reshape(-1, 512))

    if b.k0A is None:
        return geo, key

    def column_keys(k0, k1):
        zero = jnp.zeros_like(k0)
        return jnp.maximum(_two_lane_vec(128, b.l0, b.l0, k0, zero),
                           _two_lane_vec(128, b.l1, b.l1, k1, zero))

    kupd = jnp.concatenate([column_keys(b.k0A, b.k1A),
                            column_keys(b.k0B, b.k1B)],
                           axis=-1)                        # (n, t, 2, 256)
    key = key.at[rows].max(kupd.reshape(-1, 256))
    return geo, key


def integrate_rows(geo, key, cr: CornerRows, values, sem_key, ray_mask,
                   n_tail: int, chunk: int = _INTEGRATE_CHUNK):
    """Scatter the frame's updates into the split row state: ONE 512-lane
    scatter-add (num and w, both y columns, both z corners) and ONE
    256-lane scatter-max per (ray, tail-sample, x-corner). Reference
    update math: modules/integrator.py:55-124. Rays stream through in
    chunks (lax.scan carrying the donated state) so the built update
    tensors stay small."""
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

    if sem_key is not None:
        k = sem_key.astype(jnp.int32)[:, None, None]
        if ray_mask is not None:
            k = jnp.where(ray_mask[:, None, None], k, 0)
        kx = jnp.where(cut(cr.vx), k, 0)                  # (n, t, 2)

        def keyc(vy, vz):
            return jnp.where((vy & vz)[..., None], kx, 0)

        vz0b, vz1b = cut(cr.vz0), cut(cr.vz1)
        vyAb, vyBb = cut(cr.vyA), cut(cr.vyB)
        keys = (keyc(vyAb, vz0b), keyc(vyAb, vz1b),
                keyc(vyBb, vz0b), keyc(vyBb, vz1b))
    else:
        keys = (None, None, None, None)

    blk = _UpdateBlock(
        rows=cut(cr.s_rows), l0=l0, l1=l1,
        w0A=wx * (wyA * wz0)[..., None], w1A=wx * (wyA * wz1)[..., None],
        w0B=wx * (wyB * wz0)[..., None], w1B=wx * (wyB * wz1)[..., None],
        vals=vals, k0A=keys[0], k1A=keys[1], k0B=keys[2], k1B=keys[3])

    n = blk.rows.shape[0]
    kch = _nchunks(n, chunk)
    if kch == 1:
        return _integrate_block(geo, key, blk)
    blkk = jax.tree_util.tree_map(
        lambda a: a.reshape((kch, n // kch) + a.shape[1:]), blk)

    def body(carry, bc):
        return _integrate_block(carry[0], carry[1], bc), None

    (geo, key), _ = jax.lax.scan(body, (geo, key), blkk)
    return geo, key
