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
  (num bf16 | w bf16), 2 y-parity copies, z-blocks OVERLAPPED with stride
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

_SHADOW_STRIDE = 64  # 128-wide blocks every 64 z: any 2-run fits z_lo//64,
                     # and all shadow-build slices stay 64/128-aligned

# transient-memory targets for the chunked per-frame passes (rays/chunk).
# Chunking the integrate is EXPENSIVE: every extra scatter-op pair costs a
# full pass over the multi-GB row state (~10 ms/chunk at 448^3, measured in
# tools/probe_integrate_unroll.py: 16 chunks = 207 ms/frame vs unchunked =
# 79 ms). So the integrate chunk is sized to stay UNCHUNKED at 256^2 rays
# (update temp ~2.8 GB) and split 512^2 frames into only 4 chunks.
_EXTRACT_CHUNK = 8192    # gather temp ~ chunk*p*2*256*4B  (~150 MB at p=9)
_INTEGRATE_CHUNK = 65536  # update temp ~ chunk*t*2*768*4B (~2.8 GB at t=7)


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
    NBS: int     # shadow z-blocks (stride 64): 2 * ZB0
    GK: int      # key z-slot groups: ceil(Z/32) (32 slots per key row)

    @staticmethod
    def for_shape(shape: Tuple[int, int, int]) -> "RowLayout":
        X, Y, Z = int(shape[0]), int(shape[1]), int(shape[2])
        ZB0 = _cdiv(Z, 128)
        # a z-pair straddles cz=0 only from z_lo = 128k + 127 <= Z - 2,
        # landing in cz=1 block b = k + 1 -- so blocks 1..(Z-1)//128
        ZB1 = max((Z - 1) // 128 if Z >= 129 else 0, 1)
        return RowLayout(X=X, Y=Y, Z=Z, Zp=ZB0 * 128, ZB0=ZB0, ZB1=ZB1,
                         Q=_cdiv(Y, 2), NBS=2 * ZB0, GK=_cdiv(Z, 32))

    # scatter-state rows: copies (cy, cz) outermost, then (x, q, b)
    @property
    def rows(self) -> int:
        return 2 * self.X * self.Q * (self.ZB0 + self.ZB1)

    @property
    def shadow_rows(self) -> int:
        return 2 * self.X * self.Q * self.NBS

    @property
    def key_rows(self) -> int:
        """Key slot-state rows (x, y, z-group); see KEY SLOT LAYOUT."""
        return self.X * self.Y * self.GK

    def copy_blocks(self, cz: int) -> int:
        return self.ZB1 if cz else self.ZB0


# KEY SLOT LAYOUT. The semantic key state is never read inside the frame
# loop (extraction reads only the geo shadow; keys materialise once at
# scan exit), so its layout is chosen purely for scatter-max cost: rows
# keyed by (x, y_lo, z-group g), 128 lanes = 4 corner components x 32
# z-slots, lane = 32*c + (z_lo % 32) with components
#   c=0: (y_lo,   z_lo)    c=1: (y_lo,   z_lo+1)
#   c=2: (y_lo+1, z_lo)    c=3: (y_lo+1, z_lo+1).
# ALL FOUR (y, z) corners of a sample live in ONE row, so the scatter-max
# is a single (M, 128) op -- measured 21.6 ms/frame vs 27.1 for the
# previous y-paired (M, 256) parity-copy form at 448^3/256^2, with half
# the update-build bytes, and no parity copies at all (a voxel's key mass
# spreads over the 4 neighbour slots instead; the exit reconcile maxes
# them back, tools/probe_slot_scatter.py).


class RowVolume(NamedTuple):
    """Scene state in scatter-row form (carried through row-path scans;
    converted from/to SceneVolume at scan boundaries)."""
    geo: jnp.ndarray      # (rows, 512) f32 lanes [numA|numB|wA|wB]
    key: jnp.ndarray      # (key_rows, 128) i32 slot rows (KEY SLOT LAYOUT)
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

    # key slots: all mass in component 0 (corner (y_lo, z_lo) == the
    # voxel itself), lanes [0:32); other components start at max's
    # neutral 0 (keys are non-negative packed (score, id))
    kp = jnp.pad(key.astype(jnp.int32),
                 ((0, 0), (0, 0), (0, 32 * L.GK - L.Z)))
    k0 = kp.reshape(L.X * L.Y * L.GK, 32)
    krows = jnp.concatenate(
        [k0, jnp.zeros((L.key_rows, 96), jnp.int32)], axis=-1)
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
    """Sum the four geo copies back to canonical (X, Y, Z). Copy cz's
    z-block b covers z = 128*(b + cz) - 64*cz + lane (cz=1 blocks are
    stored shifted by one, starting at z = 64)."""
    L = layout
    zext = max(L.Zp, 64 + L.ZB1 * 128)
    num = jnp.zeros((L.X, L.Y, zext), jnp.float32)
    w = jnp.zeros((L.X, L.Y, zext), jnp.float32)

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
            off += size
    cutz = lambda a: a[:, :, :L.Z]
    k = _reconcile_key(key, layout) if want_key else None
    return cutz(num), cutz(w), k


def _reconcile_key(key, layout: RowLayout):
    """Max the 4 slot components back to canonical (X, Y, Z): voxel
    (y, z) collects comp 0 of slot (y, z), comp 1 of (y, z-1), comp 2 of
    (y-1, z), comp 3 of (y-1, z-1). Runs ONCE per sequence (scan exit),
    so the slot->plane relayout cost is amortised."""
    L = layout
    s = key.reshape(L.X, L.Y, L.GK, 4, 32)
    Zs = 32 * L.GK

    def plane(c):
        return s[:, :, :, c, :].reshape(L.X, L.Y, Zs)

    def zshift(a):        # value from slot z-1 (component covers z_lo+1)
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0)))[:, :, :Zs]

    def yshift(a):        # value from row y-1 (component covers y_lo+1)
        return jnp.pad(a, ((0, 0), (1, 0), (0, 0)))[:, :L.Y]

    k = jnp.maximum(plane(0), zshift(plane(1)))
    k = jnp.maximum(k, yshift(plane(2)))
    k = jnp.maximum(k, yshift(zshift(plane(3))))
    return k[:, :, :L.Z]


def volume_from_rows(geo, key, layout: RowLayout):
    """Reconcile the split copies / key slots back to canonical."""
    num, w, k = _reconcile(geo, key, layout, want_key=True)
    return num, w, k


# -- gather shadow ------------------------------------------------------------

def _pack16(num, w):
    from .geometry import pack16_numw
    return pack16_numw(num, w)


def build_shadow(geo, layout: RowLayout, impl: Optional[str] = None
                 ) -> jnp.ndarray:
    """Split state -> (shadow_rows, 256) u32 y-paired stride-64-z shadow
    of packed (num bf16 | w bf16). One dense pass per frame.

    ``impl``: "pallas" (one-pass VMEM kernel, 48 ms/frame at 448^3),
    "xla" (85 ms/frame), or None = pallas on TPU, xla elsewhere. Both
    are bit-exact to each other (tests/test_shadow_pallas.py).

    STRUCTURED reconcile: the four copies are summed without ever
    leaving the row form -- the cz=1 -> cz=0 z-realignment is two
    64-lane half-shifts, the cy=1 -> cy=0 y-realignment is a lane-group
    swap plus a q-shift (major axis), and the stride-64 odd blocks are
    the same half-shift pattern. The previous canonical roundtrip
    (y-interleave + stride-2 y slices + unaligned 112-slices) relayouted
    ~10x more than it moved: measured 104 ms/frame at 448^3 vs the raw
    ~15 ms of traffic (tools/probe_row_stages.py)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .pallas.shadow_build import build_shadow_pallas
        return build_shadow_pallas(geo, layout)
    L = layout
    X, Q, ZB0, ZB1 = L.X, L.Q, L.ZB0, L.ZB1

    def copy(cy, cz):
        off = cy * X * Q * (ZB0 + ZB1) + cz * X * Q * ZB0
        nblk = ZB1 if cz else ZB0
        return geo[off:off + X * Q * nblk].reshape(X, Q, nblk, 4, 128)

    def zmerge(s0, s1):
        """Add the cz=1 copy (blocks at z = 128j + 64) into the cz=0
        128-grid: block j's lower half lands in grid block j lanes
        [64:], its upper half in grid block j+1 lanes [:64]."""
        lo, hi = s1[..., :64], s1[..., 64:]
        addlow = jnp.pad(hi, ((0, 0), (0, 0),
                              (1, max(ZB0 - ZB1 - 1, 0)),
                              (0, 0), (0, 0)))[:, :, :ZB0]
        addhigh = jnp.pad(lo, ((0, 0), (0, 0), (0, ZB0 - ZB1),
                               (0, 0), (0, 0)))
        return s0 + jnp.concatenate([addlow, addhigh], axis=-1)

    d0 = zmerge(copy(0, 0), copy(0, 1))       # (X, Q, ZB0, 4, 128)
    d1 = zmerge(copy(1, 0), copy(1, 1))

    def comp(d, i):
        return d[:, :, :, i, :]               # (X, Q, ZB0, 128)

    def qshift(a, s):
        """s=+1: row q takes value from q-1; s=-1: from q+1."""
        if s == 1:
            return jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :Q]
        return jnp.pad(a, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]

    # cy=0 pair (2q, 2q+1): A = D0.A + D1.B(q-1); B = D0.B + D1.A
    # cy=1 pair (2q+1, 2q+2): A = D1.A + D0.B;  B = D1.B + D0.A(q+1)
    pairs = {
        (0, "A"): (comp(d0, 0) + qshift(comp(d1, 1), +1),
                   comp(d0, 2) + qshift(comp(d1, 3), +1)),
        (0, "B"): (comp(d0, 1) + comp(d1, 0),
                   comp(d0, 3) + comp(d1, 2)),
        (1, "A"): (comp(d1, 0) + comp(d0, 1),
                   comp(d1, 2) + comp(d0, 3)),
        (1, "B"): (comp(d1, 1) + qshift(comp(d0, 0), -1),
                   comp(d1, 3) + qshift(comp(d0, 2), -1)),
    }

    def blocks64(p):
        """(X, Q, ZB0, 128) 128-grid -> (X, Q, 2*ZB0, 128) stride-64
        blocks: even block 2k is grid block k verbatim; odd block 2k+1
        is [k's lanes 64: | k+1's lanes :64]."""
        nxt = jnp.pad(p, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        odd = jnp.concatenate([p[..., 64:], nxt[..., :64]], axis=-1)
        return jnp.stack([p, odd], axis=3).reshape(X, Q, 2 * ZB0, 128)

    shads = []
    for cy in (0, 1):
        pa = blocks64(_pack16(*pairs[(cy, "A")]))
        pb = blocks64(_pack16(*pairs[(cy, "B")]))
        shads.append(jnp.concatenate([pa, pb], axis=-1))
    return jnp.stack(shads, axis=0).reshape(L.shadow_rows, 256)


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
    k_rows: jnp.ndarray    # (n, p, 2) key slot row per x-corner
    ksl: jnp.ndarray       # (n, p) key z-slot (z_lo % 32)
    dz0: jnp.ndarray       # (n, p) z-corner-0 offset from z_lo (0/1)
    dz1: jnp.ndarray       # (n, p) z-corner-1 offset from z_lo (0/1)


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

    # --- key slot rows (KEY SLOT LAYOUT): one row holds all 4 (y, z)
    # corners of this sample
    k_rows = (xs * L.Y + y_lo_c[..., None]) * L.GK \
        + (z_lo // 32)[..., None]

    return CornerRows(
        g_rows=g_rows, s_rows=s_rows,
        lane0=lane0, lane1=lane1, slane0=slane0, slane1=slane1,
        wx=jnp.stack([wx0, wx1], -1).astype(jnp.float32),
        vx=jnp.stack([vx0, vx1], -1),
        wyA=wyA.astype(jnp.float32), wyB=wyB.astype(jnp.float32),
        vyA=vyA, vyB=vyB,
        wz0=wz0.astype(jnp.float32), wz1=wz1.astype(jnp.float32),
        vz0=vz0, vz1=vz1,
        k_rows=k_rows, ksl=z_lo % 32, dz0=z0c - z_lo, dz1=z1c - z_lo)


# -- extraction ---------------------------------------------------------------

def _unpack(g):
    from .geometry import unpack16_numw
    return unpack16_numw(g)


def _flatx(a, shape3):
    """Broadcast (n, p[, 2]) onto the x-corner axis and flatten to (R,).

    ALL hot elementwise math here runs on flat 1-D (or (R, lanes) 2-D)
    tensors: shapes like (n, p, 2) put extent 2 (or 9) in the TPU lane
    dimension and waste the (8, 128) tile -- measured 8x slower
    (tools/probe_lane_shapes.py)."""
    if a.ndim == 2:
        a = a[..., None]
    return jnp.broadcast_to(a, shape3).reshape(-1)


def _extract_block(shadow, cr: CornerRows, init_value: float,
                   fill_value: float):
    s3 = cr.g_rows.shape                              # (n, p, 2)
    rows = jnp.take(shadow, cr.g_rows.reshape(-1), axis=0)   # (R, 256)
    l0 = _flatx(cr.lane0, s3)[:, None]
    l1 = _flatx(cr.lane1, s3)[:, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], 128), 1)
    h0 = iota == l0
    h1 = iota == l1
    vx = _flatx(cr.vx, s3)
    vz0 = _flatx(cr.vz0, s3)
    vz1 = _flatx(cr.vz1, s3)
    wz0 = _flatx(cr.wz0, s3)
    wz1 = _flatx(cr.wz1, s3)

    def column(cols, vy, wy):
        z = jnp.zeros_like(cols)
        g0 = jnp.sum(jnp.where(h0, cols, z), axis=-1)        # (R,)
        g1 = jnp.sum(jnp.where(h1, cols, z), axis=-1)
        n0, w0 = _unpack(g0)
        n1, w1 = _unpack(g1)

        def corner(nc, wc, vz):
            v = jnp.where(wc > 0, nc / jnp.maximum(wc, 1e-12),
                          jnp.float32(init_value))
            valid = vx & vy & vz
            return (jnp.where(valid, v, jnp.float32(fill_value)),
                    jnp.where(valid, wc, 0.0))

        v0, fw0 = corner(n0, w0, vz0)
        v1, fw1 = corner(n1, w1, vz1)
        return (wy * (wz0 * v0 + wz1 * v1),
                wy * (wz0 * fw0 + wz1 * fw1))

    vA, wA = column(rows[:, 0:128], _flatx(cr.vyA, s3),
                    _flatx(cr.wyA, s3))
    vB, wB = column(rows[:, 128:256], _flatx(cr.vyB, s3),
                    _flatx(cr.wyB, s3))
    wx = _flatx(cr.wx, s3)
    fusion_values = jnp.sum((wx * (vA + vB)).reshape(s3), axis=-1)
    fusion_weights = jnp.sum((wx * (wA + wB)).reshape(s3), axis=-1)
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
    gathers per (ray, sample) -- numerically the packed-bf16 flat path
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

class _UpdateBlock(NamedTuple):
    """Per-ray-chunk integration inputs, all FLAT (M,) over
    (ray, tail-sample, x-corner) -- 1-D shapes tile fully on the VPU
    (see _flatx)."""
    rows: jnp.ndarray                 # (M,) scatter row
    l0: jnp.ndarray                   # (M,) z-corner-0 lane
    l1: jnp.ndarray                   # (M,) z-corner-1 lane
    w0A: jnp.ndarray                  # (M,) weight, column A corner z0
    w1A: jnp.ndarray                  # (M,) column A corner z1
    w0B: jnp.ndarray                  # (M,) column B corner z0
    w1B: jnp.ndarray                  # (M,) column B corner z1
    nvals: jnp.ndarray                # (M,) clamped tsdf updates
    k_rows: Optional[jnp.ndarray]     # (M,) key slot row
    ksl: Optional[jnp.ndarray]        # (M,) key z-slot (z_lo % 32)
    kvals: Optional[jnp.ndarray]      # (M, 4) masked keys per component


def _integrate_block(geo, key, b: _UpdateBlock):
    iota = jax.lax.broadcasted_iota(jnp.int32, (b.rows.shape[0], 128), 1)
    h0 = iota == b.l0[:, None]
    h1 = iota == b.l1[:, None]

    def lanevec(v0, v1):
        """v0 at lane l0 + v1 at lane l1 (summing when lanes coincide,
        the degenerate sign-0 corner case)."""
        return (jnp.where(h0, v0[:, None], 0.0)
                + jnp.where(h1, v1[:, None], 0.0))

    upd = jnp.concatenate(
        [lanevec(b.w0A * b.nvals, b.w1A * b.nvals),
         lanevec(b.w0B * b.nvals, b.w1B * b.nvals),
         lanevec(b.w0A, b.w1A),
         lanevec(b.w0B, b.w1B)], axis=-1)                 # (M, 512)
    geo = geo.at[b.rows].add(upd)

    if b.kvals is None:
        return geo, key

    # key slot row: lane = 32*c + ksl, ONE (M, 128) scatter-max for all
    # four (y, z) corners (KEY SLOT LAYOUT)
    hk = (jax.lax.broadcasted_iota(
        jnp.int32, (b.kvals.shape[0], 4, 32), 2) == b.ksl[:, None, None])
    kupd = jnp.where(hk, b.kvals[:, :, None], 0).reshape(-1, 128)
    key = key.at[b.k_rows].max(kupd)
    return geo, key


def integrate_rows(geo, key, cr: CornerRows, values, sem_key, ray_mask,
                   n_tail: int, chunk: int = _INTEGRATE_CHUNK):
    """Scatter the frame's updates into the row state: ONE 512-lane
    scatter-add (num and w, both y columns, both z corners) into the
    split parity copies and ONE 128-lane scatter-max into the key slot
    state (all four (y, z) corners in one row, KEY SLOT LAYOUT) per
    (ray, tail-sample, x-corner). Reference update math:
    modules/integrator.py:55-124. Large frames stream through in a few
    python-unrolled chunks so the built update tensors stay bounded."""
    t = n_tail
    s3 = cr.s_rows[:, :t].shape                            # (n, t, 2)

    def cut(a):
        return _flatx(a[:, :t], s3)

    wx = cut(cr.wx) * cut(cr.vx)
    if ray_mask is not None:
        wx = wx * _flatx(jnp.broadcast_to(ray_mask[:, None],
                                          s3[:2]), s3)
    wz0 = cut(cr.wz0) * cut(cr.vz0)
    wz1 = cut(cr.wz1) * cut(cr.vz1)
    wyA = cut(cr.wyA) * cut(cr.vyA)
    wyB = cut(cr.wyB) * cut(cr.vyB)
    nvals = _flatx(jnp.broadcast_to(values[:, :t, None], s3)
                   .astype(jnp.float32), s3)

    if sem_key is not None:
        k = jnp.broadcast_to(sem_key.astype(jnp.int32)[:, None, None], s3)
        kx = _flatx(k, s3)
        if ray_mask is not None:
            kx = jnp.where(_flatx(jnp.broadcast_to(
                ray_mask[:, None], s3[:2]), s3), kx, 0)
        kx = jnp.where(cut(cr.vx).astype(bool), kx, 0)

        # slot-component masks: which valid z-candidate sits at slot
        # offset 0 / 1 (degenerate pairs have dz0 == dz1 == 0)
        dz0, dz1 = cut(cr.dz0), cut(cr.dz1)
        vz0b, vz1b = cut(cr.vz0).astype(bool), cut(cr.vz1).astype(bool)
        m0 = ((dz0 == 0) & vz0b) | ((dz1 == 0) & vz1b)
        m1 = ((dz0 == 1) & vz0b) | ((dz1 == 1) & vz1b)
        vyAb, vyBb = cut(cr.vyA).astype(bool), cut(cr.vyB).astype(bool)
        kvals = jnp.stack(
            [jnp.where(vyAb & m0, kx, 0), jnp.where(vyAb & m1, kx, 0),
             jnp.where(vyBb & m0, kx, 0), jnp.where(vyBb & m1, kx, 0)],
            axis=-1)                                       # (M, 4)
        k_rows = cr.k_rows[:, :t].reshape(-1)
        ksl = cut(cr.ksl)
    else:
        kvals = k_rows = ksl = None

    blk = _UpdateBlock(
        rows=cr.s_rows[:, :t].reshape(-1),
        l0=cut(cr.slane0), l1=cut(cr.slane1),
        w0A=wx * wyA * wz0, w1A=wx * wyA * wz1,
        w0B=wx * wyB * wz0, w1B=wx * wyB * wz1,
        nvals=nvals, k_rows=k_rows, ksl=ksl, kvals=kvals)

    m = blk.rows.shape[0]
    kch = _nchunks(m, chunk * 2 * t)
    if kch == 1:
        return _integrate_block(geo, key, blk)
    blkk = jax.tree_util.tree_map(
        lambda a: a.reshape((kch, m // kch) + a.shape[1:]), blk)

    # UNROLLED python loop, not lax.scan: a while-loop carry of the
    # multi-GB (geo, key) state forces XLA to copy the carry every chunk
    # iteration (~10 ms/GB/iter, measured 209 ms/frame vs the raw
    # scatters' 63 ms at 448^3 / 16 chunks). Unrolled, each scatter
    # aliases its input buffer and the chain runs fully in place.
    for i in range(kch):
        bc = jax.tree_util.tree_map(lambda a: a[i], blkk)
        geo, key = _integrate_block(geo, key, bc)
    return geo, key
