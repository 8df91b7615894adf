"""Slot-layout scene state: 128-lane-row gather/scatter for the fusion
hot path.

Motivation (measured on TPU v5e through this environment's relay --
tools/probe_row_ops.py, probe_slot_scatter.py, probe_shadow_v3.py): XLA
random access costs ~8-15 ns per scattered/gathered ELEMENT, while
lane-aligned 128-lane ROWS move for ~13-28 ns per ROW. (Dense HBM
bandwidth itself is ~990 GiB/s -- near nameplate; the row ops are bound
by per-row issue cost and the scatters by a fixed full-state pass at
~170 GB/s, NOT by dense bandwidth. Round-2's "213 GB/s" figure was a
mismeasurement.) The reference integration hot path
(modules/integrator.py:55-124, modules/extractor.py:640-681) needs 8
gathers + 16 scatter-adds + 8 scatter-maxes per (ray, sample) in scalar
form. The slot layout collapses each side to ONE 128-lane row op per
(ray, sample, x-corner):

SLOT LAYOUT. For a sample's trilinear corner pair bases y_lo, z_lo, all
four (y, z) corners live in one SLOT addressed by (x, y_lo, z_lo):

* geo state (scatter-add target, f32 or bf16 -- see rows_from_volume's
  geo_dtype): rows (x, 1 + y_lo, z_lo // 16),
  x-stride SY >= Y+2 (one zero pad row at y=-1 and y=Y for the shadow
  kernel's halo, plus zero DMA-alignment rows -- RowLayout docstring),
  128 lanes = 8 components x 16 z-slots, lane = 16*c + z_lo % 16,
  components [nA0 nA1 nB0 nB1 wA0 wA1 wB0 wB1] (A = y_lo, B = y_lo + 1,
  0/1 = z_lo + 0/1, n = weighted tsdf mass, w = weight mass).
* key state (scatter-max target, i32): rows (x, y_lo, z_lo // 32),
  128 lanes = 4 corner components x 32 z-slots (see KEY SLOT LAYOUT
  below).
* gather shadow (read-only, rebuilt per frame, u32): same row addressing
  as the key state; 128 lanes = 4 corner components x 32 z-slots, each
  lane the bf16-packed (num | w) RECONCILED voxel value of that corner
  (geometry.pack16_numw format). Extraction gathers ONE 128-lane row per
  (ray, sample, x-corner) and one-hot-selects the 4 corner lanes.

A voxel's mass is therefore spread over its 4 neighbouring slots
(the (y-1..y) x (z-1..z) slot square); the true state is
reconcile(slots), computed per frame for the shadow (Pallas kernel,
ops/pallas/shadow_build.py) and once at scan exit for materialisation.
There are NO parity copies and NO straddles: a slot's 4 corners are in
one row by construction.

All shapes static; invalid corners/rays are zero-weight (or zero-key)
lanes, exactly like the flat path (ops/integrate.py).

WRITER INVARIANT: pad rows (geo y = -1 / y = Y) and out-of-bounds corner
components (e.g. comp B* of a slot at y = Y - 1, z-offset-1 comps of slot
z = Z - 1 in the last group) must stay ZERO (geo) / key 0. rows_from_volume
establishes this; integrate_rows preserves it (invalid corners are
weight-0/key-0 by masking); the Pallas/XLA shadow bit-equality relies on
it (tests/test_shadow_pallas.py masks exactly these dead lanes).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["RowLayout", "RowVolume", "rows_from_volume", "volume_from_rows",
           "build_shadow", "build_shadow_dirty", "shadow_from_canonical",
           "corner_rows", "extract_rows", "integrate_rows", "pick_ty",
           "shadow_tiling", "dirty_tile_mask"]

# transient-memory targets for the chunked per-frame passes (rays/chunk).
# Chunking the integrate is EXPENSIVE: every extra scatter-op pair costs a
# full pass over the multi-GB state (~10 ms/chunk at 448^3, measured in
# tools/probe_slot_scatter.py / probe_slot_stages.py), so the chunk target
# keeps frames up to 512^2 UNCHUNKED -- slot updates are (M, 128), only
# ~1.9 GB even there.
_EXTRACT_CHUNK = 16384    # gather temp ~ chunk*p*2*128*4B (~150 MB at
                          # p=9; XLA materialises a few masked copies of
                          # it -- 65536 OOMs HBM next to the 5.5 GB slot
                          # state + net activations at 448^3/256^2)
_INTEGRATE_CHUNK = 262144  # update temp ~ chunk*t*2*256*4B (~3.8 GB at t=7)

# All formulation flags below are env-overridable (SEGFUSION_*) so TPU
# A/B runs (`python bench.py --mode headline` under different env
# combos) need no code edits; the committed defaults are the measured
# picks.

# Extraction one-hot reduce formulation; "quarter" (4 masked 32-lane
# reduces) and "select128" (one 128-lane select + minor-axis sum) are
# bit-exact to each other. MEASURED round 4 (tools/probe_extract_variants
# .py on TPU, composed loop at 448^3/256^2): select128 21.65 ms/frame vs
# quarter 24.37 -- the single full-width mask + (2m, 4, 32) reshape-sum
# wins 2.7 ms; GATHER_DEDUP regressed to 39.8 and stays off.
EXTRACT_REDUCE = os.environ.get("SEGFUSION_EXTRACT_REDUCE", "select128")

# Scatter update-build formulation; "minor16" (one-hot over (M, C, S)
# minor-dim intermediates + relayout reshape) vs "lane128" (128-lane
# select tree, no relayout). Bit-exact to each other. MEASURED round 4
# (tools/probe_update_build.py on TPU, donated composed loop at
# 448^3/256^2): lane128 47.38 vs minor16 49.77 ms/frame for the full
# geo+key integrate stage -- the select tree saves the relayout.
UPDATE_BUILD = os.environ.get("SEGFUSION_UPDATE_BUILD", "lane128")

# 16-bit geo accumulators: build the (M, 128) scatter-add rows directly
# in the state dtype instead of f32 + astype at the scatter. The build
# is pure lane PLACEMENT (iota-mask selects, no arithmetic on the
# values), so rounding vals8 BEFORE the select tree is bit-identical to
# rounding the placed rows after it (zeros round to zeros) -- but the
# materialised (M, 128) intermediate and the scatter's update-operand
# read halve. No effect when the state is f32. A/B flag for probes.
EARLY_CAST = os.environ.get("SEGFUSION_EARLY_CAST", "1") != "0"

# In-ray duplicate-row merging before the scatters. MEASURED round 4
# and DEAD: the real in-tail duplicate-row fraction is 0.028 (not the
# hypothesised ~6/7 -- a ray stepping ~1 voxel/sample changes x or y_lo
# almost every sample unless it is z-dominant AND axis-aligned), and the
# merge machinery itself costs +37 ms/frame (tools/probe_merge_dup.py on
# TPU: 49.7 -> 86.9 ms integrate stage). Kept only as an A/B flag; the
# whole duplicate-row-structure lever family (this and GATHER_DEDUP)
# does not apply to real ray geometry.
MERGE_DUP = os.environ.get("SEGFUSION_MERGE_DUP", "0") == "1"

# In-tail gather dedup for extraction: same dead hypothesis as MERGE_DUP
# (measured duplicate fraction 0.028; the dedup variant regressed
# extraction 24.4 -> 39.8 ms/frame, tools/probe_extract_variants.py).
GATHER_DEDUP = os.environ.get("SEGFUSION_GATHER_DEDUP", "0") == "1"

# Shadow-build y-tile height cap, shared by the dirty-tile mask and BOTH
# Pallas kernels (they must tile identically or the mask indexes the
# wrong tiles). SWEPT round 4 (tools/probe_dirty_shadow.py on TPU,
# 448^3/256^2 composed with extraction): TY=56 and TY=28 are within
# noise (dirty-real 33.75 vs 33.23 ms incl. ~20 ms extraction); TY=112
# fails to compile (Mosaic scoped-VMEM 19.4 MB > 16 MB -- the compute
# temps are ~(TY, G, 128) f32 x ~8 live). Real bench-trajectory dirty
# fractions at 256^2 are 0.44-0.75 (frustum coverage of the volume, NOT
# ~25%), so the dirty rebuild saves ~6-7 ms/frame over a full blocked
# rebuild, not the 30 ms round 3 projected.
SHADOW_MAX_TY = int(os.environ.get("SEGFUSION_SHADOW_TY", "56"))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _impl_for(arr) -> str:
    """Pick the kernel impl for ``arr``: the array's actual platform when
    it is concrete (CPU-placed arrays under a TPU default backend must
    NOT take the Mosaic kernel), the default backend for tracers (inside
    jit there is no device info until lowering -- callers that jit for a
    non-default backend should pass ``impl`` explicitly, e.g. via the
    pipeline's SETTINGS.rows_impl)."""
    try:
        platforms = {d.platform for d in arr.devices()}
        if len(platforms) == 1:
            return "pallas" if platforms.pop() == "tpu" else "xla"
    except Exception:
        pass
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _nchunks(n: int, target: int) -> int:
    """Smallest chunk count that divides n with chunks <= target."""
    k = _cdiv(n, target)
    while n % k:
        k += 1
    return k


class RowLayout(NamedTuple):
    """Static layout constants derived from the canonical volume shape.

    ALIGNMENT: the shadow/reconcile kernels DMA geo slabs starting at
    row (x * SY + j * TY) * G with slice shape (TY + 2) * G, and Mosaic
    must prove starts divisible by the HBM row tiling -- 8 rows for f32,
    16 for 16-bit dtypes (bf16 packs (2, 1)) -- and 16-bit slice SHAPES
    divisible by 8. Hence G is ceil(Z/16) rounded up to a MULTIPLE OF 4
    (>= 2 * GK; with pick_ty's TY % 8 == 0 this makes TY * G % 16 == 0
    and (TY + 2) * G % 8 == 0) and SY is Y + 2 padded minimally so
    SY * G % 16 == 0. The pad rows and pad z-groups hold zeros, are
    never scatter targets (corner rows index physical y in [-1, Y] ->
    indices [0, Y + 1] < SY; z-slot groups index z // 16 < 2 * GK <= G),
    and the last tile's slab read stops at index Y + 2 <= SY."""
    X: int
    Y: int
    Z: int
    G: int       # geo z-slot groups: 2 * GK rounded up to a multiple of 4
    GK: int      # key/shadow z-slot groups: ceil(Z/32) (32 slots per row)
    SY: int      # geo y-stride: Y + 2 halo rows + DMA-alignment padding

    @staticmethod
    def for_shape(shape: Tuple[int, int, int]) -> "RowLayout":
        X, Y, Z = int(shape[0]), int(shape[1]), int(shape[2])
        GK = _cdiv(Z, 32)
        G = -(-2 * GK // 4) * 4
        SY = Y + 2
        while (SY * G) % 16:
            SY += 1
        return RowLayout(X=X, Y=Y, Z=Z, G=G, GK=GK, SY=SY)

    @property
    def geo_rows(self) -> int:
        """Geo slot rows, x-stride SY (pad rows at y=-1 and y=Y, plus
        zero alignment rows above -- see the class docstring)."""
        return self.X * self.SY * self.G

    @property
    def key_rows(self) -> int:
        return self.X * self.Y * self.GK

    @property
    def shadow_rows(self) -> int:
        """Shadow shares the key state's row addressing."""
        return self.X * self.Y * self.GK


# KEY SLOT LAYOUT. The semantic key state is never read inside the frame
# loop (extraction reads only the geo shadow; keys materialise once at
# scan exit), so its layout is chosen purely for scatter-max cost: rows
# keyed by (x, y_lo, z-group g), 128 lanes = 4 corner components x 32
# z-slots, lane = 32*c + (z_lo % 32) with components
#   c=0: (y_lo,   z_lo)    c=1: (y_lo,   z_lo+1)
#   c=2: (y_lo+1, z_lo)    c=3: (y_lo+1, z_lo+1).
# ALL FOUR (y, z) corners of a sample live in ONE row, so the scatter-max
# is a single (M, 128) op (21.6 ms/frame at 448^3/256^2,
# tools/probe_slot_scatter.py); the exit reconcile maxes the 4 neighbour
# slots back to canonical.


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("geo", "key", "origin", "resolution"),
                   meta_fields=("init_value",))
@dataclasses.dataclass
class RowVolume:
    """Scene state in scatter-slot form (carried through row-path scans
    and across fuse_many chunks; converted from/to SceneVolume at stream
    boundaries). ``init_value`` is STATIC metadata like SceneVolume's --
    a traced leaf here would leak a tracer into SceneVolume's treedef
    when a jitted exit conversion rebuilds the canonical state."""
    geo: jnp.ndarray      # (geo_rows, 128) f32/bf16 slot rows (SLOT LAYOUT)
    key: jnp.ndarray      # (key_rows, 128) i32 slot rows (KEY SLOT LAYOUT)
    origin: jnp.ndarray
    resolution: jnp.ndarray
    init_value: float

    def _replace(self, **kw) -> "RowVolume":
        return dataclasses.replace(self, **kw)


# -- canonical <-> slots ------------------------------------------------------

def rows_from_volume(num, w, key, layout: RowLayout,
                     geo_dtype=jnp.float32):
    """Slot state from canonical (X, Y, Z) arrays. All mass goes to each
    voxel's OWN slot's component 0 (corner (y_lo, z_lo) == the voxel);
    the other components start at the combiner's neutral element.

    ``geo_dtype``: accumulator dtype for the geo slot state. float32 is
    exact; bfloat16 HALVES the state bytes -- and with them the scatter's
    fixed full-state pass, the floor-setter of every fusion mode (the
    measured law is T ~= state_bytes / ~170 GB/s + rows x ~10 ns) -- at
    the price of RTNE rounding on every accumulation. The reference
    itself keeps its volumes in float16 (modules/integrator.py:79-88),
    and the values the nets SEE are bf16 either way (the gather shadow
    packs bf16); quality cost quantified in tools/probe_block_quality.py
    (PERFORMANCE.md)."""
    L = layout
    zp = 16 * L.G

    def slots0(a, dtype):
        ap = jnp.pad(a.astype(dtype), ((0, 0), (0, 0), (0, zp - L.Z)))
        return ap.reshape(L.X, L.Y, L.G, 16)

    geo_dtype = jnp.dtype(geo_dtype)
    geo = jnp.zeros((L.X, L.SY, L.G, 128), geo_dtype)
    geo = geo.at[:, 1:L.Y + 1, :, 0:16].set(slots0(num, geo_dtype))
    geo = geo.at[:, 1:L.Y + 1, :, 64:80].set(slots0(w, geo_dtype))
    geo = geo.reshape(L.geo_rows, 128)

    kp = jnp.pad(key.astype(jnp.int32),
                 ((0, 0), (0, 0), (0, 32 * L.GK - L.Z)))
    k0 = kp.reshape(L.key_rows, 32)
    krows = jnp.concatenate(
        [k0, jnp.zeros((L.key_rows, 96), jnp.int32)], axis=-1)
    return geo, krows


def _reconcile_slot(geo, layout: RowLayout):
    """Sum the 4 neighbour-slot components back to canonical (num, w):
    voxel (y, z) collects comp 0 of slot (y, z), comp 1 of (y, z-1),
    comp 2 of (y-1, z), comp 3 of (y-1, z-1) -- the y-1 indexing falls
    out of the pad rows for free. A 16-bit state is upcast first (exact),
    so the reconcile arithmetic is f32 for every geo_dtype."""
    L = layout
    geo = geo.astype(jnp.float32)
    s = geo.reshape(L.X, L.SY, L.G, 8, 16)
    Zs = 16 * L.G

    def plane(c):
        return s[:, :, :, c, :].reshape(L.X, L.SY, Zs)

    def zsh(a):          # comp covers z_lo+1 -> contribution from z-1
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0)))[:, :, :Zs]

    def collect(c0, c1, c2, c3):
        # padded-y rows: physical y lives at index 1+y, so comp 0/1 of
        # voxel y reads index 1+y and comp 2/3 (from slot row y-1) reads
        # index y. Pairwise (z-pair + z-pair) grouping -- the Pallas
        # kernels share the z-pair partial sum across the two y rows, so
        # bit-exactness requires this association order.
        return ((plane(c0)[:, 1:L.Y + 1] + zsh(plane(c1))[:, 1:L.Y + 1])
                + (plane(c2)[:, 0:L.Y] + zsh(plane(c3))[:, 0:L.Y]))

    num = collect(0, 1, 2, 3)[:, :, :L.Z]
    w = collect(4, 5, 6, 7)[:, :, :L.Z]
    return num, w


def _reconcile_key(key, layout: RowLayout):
    """Max the 4 slot components back to canonical (X, Y, Z). Runs ONCE
    per sequence (scan exit), so the slot->plane relayout is amortised."""
    L = layout
    s = key.reshape(L.X, L.Y, L.GK, 4, 32)
    Zs = 32 * L.GK

    def plane(c):
        return s[:, :, :, c, :].reshape(L.X, L.Y, Zs)

    def zsh(a):
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0)))[:, :, :Zs]

    def ysh(a):
        return jnp.pad(a, ((0, 0), (1, 0), (0, 0)))[:, :L.Y]

    k = jnp.maximum(plane(0), zsh(plane(1)))
    k = jnp.maximum(k, ysh(plane(2)))
    k = jnp.maximum(k, ysh(zsh(plane(3))))
    return k[:, :, :L.Z]


def volume_from_rows(geo, key, layout: RowLayout,
                     impl: Optional[str] = None):
    """Reconcile the slot states back to canonical (num, w, key).

    On TPU the geo reconcile runs as a Pallas kernel: the XLA
    formulation's narrow comp slices pay a 4.6x tile-padding expansion
    (12.5 GB of temps at 448^3)."""
    if impl is None:
        impl = _impl_for(geo)
    if impl == "pallas":
        from .pallas.shadow_build import (reconcile_key_pallas_v,
                                          reconcile_slot_pallas_v)
        num, w = reconcile_slot_pallas_v(geo, layout)
        return num, w, reconcile_key_pallas_v(key, layout)
    num, w = _reconcile_slot(geo, layout)
    return num, w, _reconcile_key(key, layout)


# -- gather shadow ------------------------------------------------------------

def _pack16(num, w):
    from .geometry import pack16_numw
    return pack16_numw(num, w)


def build_shadow(geo, layout: RowLayout, impl: Optional[str] = None
                 ) -> jnp.ndarray:
    """Slot state -> (shadow_rows, 128) u32 slot shadow: lane 32*c + s
    of row (x, y, g) holds the bf16-packed RECONCILED (num | w) of corner
    c of slot (y, z = 32*g + s). One dense pass per frame.

    ``impl``: "pallas" (one-pass halo-DMA VMEM kernel) or "xla"
    (reconcile + pack + 4 shifted stacks; reference implementation and
    CPU-test path), or None = the geo array's platform / default backend
    (see _impl_for). Both are bit-exact to each other
    (tests/test_shadow_pallas.py)."""
    if impl is None:
        impl = _impl_for(geo)
    if impl == "pallas":
        from .pallas.shadow_build import build_shadow_pallas_v
        return build_shadow_pallas_v(geo, layout)
    num, w = _reconcile_slot(geo, layout)
    return shadow_from_canonical(num, w, layout)


def pick_ty(Y: int, max_ty: Optional[int] = None) -> int:
    """Shadow-kernel y-tile height: the largest divisor of Y <= max_ty
    (default SHADOW_MAX_TY; shared by the Pallas kernel grid and the
    dirty-tile mask).

    Mosaic's blocked output specs require the second-minor block dim to
    be divisible by 8 OR equal to the array dim (the full-build /
    reconcile kernels' out blocks are (1, TY * GK, 128) / (1, TY, Zp)),
    so TY must be a multiple of 8 unless it covers the whole Y extent --
    e.g. Y = 84 has no 8-divisible divisor and takes TY = 84 (one
    y-tile; fine at small Y, and large Y always has an 8-divisible
    divisor after the Database's pad-to-multiple)."""
    if max_ty is None:
        max_ty = SHADOW_MAX_TY
    for ty in range(min(max_ty, Y), 0, -1):
        if Y % ty == 0 and ty % 8 == 0:
            return ty
    # no 8-divisible divisor: the only legal tile is the whole extent.
    # Fine at small Y; at large Y a whole-Y tile's compute temps blow the
    # Mosaic scoped-VMEM cap, so fail loudly instead of at lowering time
    # (the Database pads volumes to a multiple of 8, so real volumes
    # never land here).
    if Y > 4 * max_ty:
        raise ValueError(
            f"volume Y extent {Y} has no divisor that is a multiple of 8 "
            f"and <= {max_ty}; pad Y to a multiple of 8 (Database volumes "
            "are padded automatically)")
    return Y


def shadow_tiling(layout: RowLayout) -> Tuple[int, int]:
    """(TY, NJ): shadow-build y-tile height and tile count."""
    ty = pick_ty(layout.Y)
    return ty, layout.Y // ty


def dirty_tile_mask(points_v: jnp.ndarray, layout: RowLayout,
                    tile_px: Optional[int] = None) -> jnp.ndarray:
    """(X * NJ + 1,) i32 conservative dirty mask over shadow-build tiles
    (x-slab, y-tile) for ONE frame's integration footprint.

    A shadow tile is stale next frame iff this frame's scatter touched a
    geo row its slab reads. The scatter rows derive from ``corner_rows``
    of exactly these ``points_v`` -- corner x in [floor(px)-1,
    floor(px)+1], y_lo in [floor(py)-1, floor(py)], and tile (x, j)'s
    slab reads physical y_lo in [j*TY-1, j*TY+TY] -- so per-image-tile
    min/max of the raw sample coordinates, padded by 1 voxel (+1 slack),
    bound every touched row: the mask is conservative AT THE BIT LEVEL
    (masked/degenerate rays are included -- their zero-weight scatters
    still target rows derived from the same coordinates). Trailing
    element is a 0 sentinel so the kernel can read dirty[i + 1]
    unconditionally.

    ``points_v`` is (n, p, 3) with n = h*w rays in image scan order;
    the reduction granularity is ``tile_px`` x ``tile_px`` image tiles
    (the (x, j) rasterisation is an (X, T) x (T, NJ) bool-matmul, tiny
    next to the volume passes it gates). Default granularity is PER RAY
    (tile_px 1) up to 65536 rays: the dirty rebuild is COMPUTE-bound
    (~23 ms full volume, flat in TY -- round-4 sweep), so the dirty
    fraction multiplies its cost directly, and per-ray bboxes mark 0.35
    of the volume on the real bench trajectory vs 0.58 for the old 8x8
    image tiles (tools/probe_dirty_fraction.py; a multi-ray tile's bbox
    smears each ray's thin tail shell into a thick slab). Larger frames
    coarsen so the (T, X) rasterisation stays <= ~120 MB."""
    L = layout
    TY, NJ = shadow_tiling(L)
    n, p, _ = points_v.shape
    if tile_px is None:
        tile_px = 1
        while n // (tile_px * tile_px) > 65536:
            tile_px *= 2
    # n = h*w with h == w not guaranteed; infer the image height from the
    # caller-invariant that rays are h*w in scan order. The reduction only
    # needs SOME tiling of the ray axis; use flat 1-D tiles of
    # tile_px*tile_px consecutive rays (same conservativeness, no need
    # for the true 2-D image layout).
    tt = tile_px * tile_px
    t_cnt = _cdiv(n, tt)
    pad_n = t_cnt * tt - n
    px = points_v[..., 0].reshape(-1)
    py = points_v[..., 1].reshape(-1)
    if pad_n:
        px = jnp.concatenate([px, jnp.full((pad_n * p,), px[-1])])
        py = jnp.concatenate([py, jnp.full((pad_n * p,), py[-1])])
    px = px.reshape(t_cnt, tt * p)
    py = py.reshape(t_cnt, tt * p)
    xmin = jnp.floor(jnp.min(px, axis=1)) - 2.0
    xmax = jnp.floor(jnp.max(px, axis=1)) + 2.0
    ymin = jnp.floor(jnp.min(py, axis=1)) - 2.0
    ymax = jnp.floor(jnp.max(py, axis=1)) + 1.0
    # clip into the clamped corner range (corners are clipped into the
    # volume, so out-of-volume samples land on the border slabs)
    xmin = jnp.clip(xmin, 0, L.X - 1)
    xmax = jnp.clip(xmax, 0, L.X - 1)
    ymin = jnp.clip(ymin, -1, L.Y - 1)
    ymax = jnp.clip(ymax, -1, L.Y - 1)

    xs = jnp.arange(L.X, dtype=jnp.float32)
    xok = ((xs[None, :] >= xmin[:, None]) &
           (xs[None, :] <= xmax[:, None]))               # (T, X)
    j0 = jnp.arange(NJ, dtype=jnp.float32) * TY
    jok = ((j0[None, :] + TY >= ymin[:, None]) &
           (j0[None, :] - 1 <= ymax[:, None]))           # (T, NJ)
    mask = jnp.einsum("tx,tj->xj", xok.astype(jnp.float32),
                      jok.astype(jnp.float32),
                      preferred_element_type=jnp.float32) > 0
    flat = mask.reshape(-1).astype(jnp.int32)
    return jnp.concatenate([flat, jnp.zeros((1,), jnp.int32)])


def build_shadow_dirty(geo, prev_shadow, dirty, layout: RowLayout,
                       impl: Optional[str] = None) -> jnp.ndarray:
    """Incremental ``build_shadow``: rebuild only the tiles whose inputs
    changed since ``prev_shadow`` was built (``dirty`` from
    ``dirty_tile_mask`` of the LAST integrated frame; conservative), keep
    the rest of ``prev_shadow``. ``prev_shadow`` is consumed (the Pallas
    kernel aliases it into the output; donate it). A full rebuild is
    ``dirty`` all ones with any ``prev_shadow``."""
    if impl is None:
        impl = _impl_for(geo)
    if impl == "pallas":
        from .pallas.shadow_build import build_shadow_dirty_pallas_v
        return build_shadow_dirty_pallas_v(geo, prev_shadow, dirty, layout)
    L = layout
    TY, NJ = shadow_tiling(L)
    new = build_shadow(geo, L, impl=impl)
    sel = dirty[:L.X * NJ].reshape(L.X, NJ, 1, 1) != 0
    out = jnp.where(sel, new.reshape(L.X, NJ, TY * L.GK, 128),
                    prev_shadow.reshape(L.X, NJ, TY * L.GK, 128))
    return out.reshape(L.shadow_rows, 128)


def shadow_from_canonical(num, w, layout: RowLayout) -> jnp.ndarray:
    """Pack canonical (X, Y, Z) (num, w) planes into the 4-component slot
    shadow (the tail of the XLA ``build_shadow``; also used to pre-pack
    CONSTANT volumes -- e.g. the gt tsdf with w = 1 for the training
    target extraction, where it runs once per chunk)."""
    L = layout
    zs = 32 * L.GK
    P = jnp.pad(_pack16(num, w), ((0, 0), (0, 0), (0, zs - L.Z)))

    def zp(a):           # P(y, z+1)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]

    def yp(a):           # P(y+1, z)
        return jnp.pad(a, ((0, 0), (0, 1), (0, 0)))[:, 1:]

    comps = [P, zp(P), yp(P), zp(yp(P))]
    sh = jnp.stack([c.reshape(L.X, L.Y, L.GK, 32) for c in comps], axis=3)
    return sh.reshape(L.shadow_rows, 128)


# -- corner geometry ----------------------------------------------------------

class CornerRows(NamedTuple):
    """Slot-addressed trilinear corner data.

    Per-x-corner arrays are CORNER-MAJOR (2, n, p) -- the corner axis
    LEADS. A minor corner axis ((n, p, 2)) makes every broadcast of the
    shared (n, p) quantities materialise a lane-2 tensor that TPU tiling
    pads 64x (measured 9.6 ms/frame of pure broadcast relayout at 256^2,
    tools/profile_trace.py); corner-major lets all hot math run per
    corner on compact flat (m,) arrays and the shared->both-corners
    expansion become a cheap 1-D concatenate."""
    sg_rows: jnp.ndarray   # (2, n, p) geo slot row per x-corner
    sgs: jnp.ndarray       # (n, p) geo z-slot (z_lo % 16)
    k_rows: jnp.ndarray    # (2, n, p) key/shadow slot row per x-corner
    ksl: jnp.ndarray       # (n, p) key/shadow z-slot (z_lo % 32)
    dz0: jnp.ndarray       # (n, p) z-corner-0 offset from z_lo (0/1)
    dz1: jnp.ndarray       # (n, p) z-corner-1 offset from z_lo (0/1)
    wx: jnp.ndarray        # (2, n, p) x-corner weights
    vx: jnp.ndarray        # (2, n, p) x-corner validity
    wyA: jnp.ndarray       # (n, p) weight mass on column A (pair low y)
    wyB: jnp.ndarray       # (n, p) weight mass on column B
    vyA: jnp.ndarray       # (n, p) column A in-bounds
    vyB: jnp.ndarray       # (n, p) column B in-bounds
    wz0: jnp.ndarray       # (n, p) z-corner-0 weight
    wz1: jnp.ndarray       # (n, p) z-corner-1 weight
    vz0: jnp.ndarray       # (n, p) z-corner-0 in-bounds
    vz1: jnp.ndarray       # (n, p) z-corner-1 in-bounds


def corner_rows(points_v: jnp.ndarray, layout: RowLayout) -> CornerRows:
    """Slot/weight decomposition of the 8 trilinear corners -- same
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

    # --- z pair (clipped to the real extent; invalid corners are
    # weight-0/key-0 wherever they land)
    z0c = jnp.clip(z0, 0, L.Z - 1)
    z1c = jnp.clip(z1, 0, L.Z - 1)
    z_lo = jnp.minimum(z0c, z1c)

    xs = jnp.stack([jnp.clip(x0, 0, L.X - 1),
                    jnp.clip(x1, 0, L.X - 1)], axis=0)    # (2, n, p)
    sg_rows = (xs * L.SY + 1 + y_lo_c[None]) * L.G \
        + (z_lo // 16)[None]
    k_rows = (xs * L.Y + y_lo_c[None]) * L.GK + (z_lo // 32)[None]

    return CornerRows(
        sg_rows=sg_rows, sgs=z_lo % 16, k_rows=k_rows, ksl=z_lo % 32,
        dz0=z0c - z_lo, dz1=z1c - z_lo,
        wx=jnp.stack([wx0, wx1], 0).astype(jnp.float32),
        vx=jnp.stack([vx0, vx1], 0),
        wyA=wyA.astype(jnp.float32), wyB=wyB.astype(jnp.float32),
        vyA=vyA, vyB=vyB,
        wz0=wz0.astype(jnp.float32), wz1=wz1.astype(jnp.float32),
        vz0=vz0, vz1=vz1)


# -- extraction ---------------------------------------------------------------

def _unpack(g):
    from .geometry import unpack16_numw
    return unpack16_numw(g)


def _extract_block(shadow, cr: CornerRows, init_value: float,
                   fill_value: float):
    # Corner-major: the gathered row tensor is (2m, 128) with corner 0's
    # m samples first; per-sample shared quantities stay compact (m,)
    # and the corner-dependent math runs per corner on (m,) slices -- no
    # lane-2 broadcasts anywhere (see CornerRows docstring).
    n, p = cr.ksl.shape
    m = n * p
    idx = cr.k_rows.reshape(-1)
    if GATHER_DEDUP and p > 1:
        i3 = idx.reshape(2 * n, p)
        same = i3[:, 1:] == i3[:, :-1]                       # (2n, p-1)
        idd = jnp.concatenate(
            [i3[:, :1], jnp.where(same, 0, i3[:, 1:])], axis=1)
        g = jnp.take(shadow, idd.reshape(-1),
                     axis=0).reshape(2 * n, p, 128)
        cols = [g[:, 0]]
        for k in range(1, p):
            cols.append(jnp.where(same[:, k - 1][:, None],
                                  cols[-1], g[:, k]))
        rows = jnp.stack(cols, axis=1).reshape(2 * m, 128)
    else:
        rows = jnp.take(shadow, idx, axis=0)                 # (2m, 128)
    slf = cr.ksl.reshape(-1)
    sl2 = jnp.concatenate([slf, slf])[:, None]               # (2m, 1)

    if EXTRACT_REDUCE == "select128":
        # one 128-lane select (lane % 32 == slot) then a minor-axis sum
        # of the (2m, 4, 32) view -- single full-width mask instead of 4
        # masked quarter reduces (tools/probe_extract_variants.py; both
        # are bit-exact, tests/test_rowvol.py)
        iota = jax.lax.broadcasted_iota(jnp.int32, (2 * m, 128), 1)
        sel = jnp.where((iota & 31) == sl2, rows, jnp.uint32(0))
        q = jnp.sum(sel.reshape(2 * m, 4, 32), axis=-1)      # (2m, 4)
        qA0, qA1, qB0, qB1 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (2 * m, 32), 1)
        hot = iota == sl2             # one slot mask, shared by all comps

        def quarter(lo):
            # masked one-hot reduce per 32-lane corner component;
            # keeping the mask inside each reduce lets XLA fuse it
            # instead of materialising a (2m, 128) masked copy of the
            # gathered rows
            return jnp.sum(
                jnp.where(hot, rows[:, lo:lo + 32], jnp.uint32(0)),
                axis=-1)

        qA0, qA1, qB0, qB1 = (quarter(0), quarter(32), quarter(64),
                              quarter(96))           # (2m,) u32 packed

    dz0 = cr.dz0.reshape(-1)
    dz1 = cr.dz1.reshape(-1)
    vz0 = cr.vz0.reshape(-1)
    vz1 = cr.vz1.reshape(-1)
    wz0 = cr.wz0.reshape(-1)
    wz1 = cr.wz1.reshape(-1)
    vyA = cr.vyA.reshape(-1)
    vyB = cr.vyB.reshape(-1)
    wyA = cr.wyA.reshape(-1)
    wyB = cr.wyB.reshape(-1)

    def column(q0, q1, vx, vy, wy):
        # z-candidate k reads slot component dz_k
        g0 = jnp.where(dz0 == 0, q0, q1)
        g1 = jnp.where(dz1 == 0, q0, q1)
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

    fv = fw = 0.0
    for c in range(2):
        vx_c = cr.vx[c].reshape(-1)
        wx_c = cr.wx[c].reshape(-1)
        vA, wA = column(qA0[c * m:(c + 1) * m], qA1[c * m:(c + 1) * m],
                        vx_c, vyA, wyA)
        vB, wB = column(qB0[c * m:(c + 1) * m], qB1[c * m:(c + 1) * m],
                        vx_c, vyB, wyB)
        fv = fv + wx_c * (vA + vB)
        fw = fw + wx_c * (wA + wB)
    # y-corners whose column fell outside the clipped pair are always out
    # of bounds: they read fill_value with their full trilinear weight
    # (reference container scheme) but carry no fusion weight. Per-axis
    # weights each sum to 1, so their collective mass is 1 - wyA - wyB.
    fv = fv + (1.0 - wyA - wyB) * jnp.float32(fill_value)
    return fv.reshape(n, p), fw.reshape(n, p)


def extract_rows(shadow: jnp.ndarray, cr: CornerRows, init_value: float,
                 fill_value: float, chunk: int = _EXTRACT_CHUNK):
    """Trilinear (fusion_values, fusion_weights): ONE 128-lane slot-row
    gather per (ray, sample, x-corner) -- numerically the packed-bf16
    flat path (geometry.trilinear_gather_packed16) with 8x fewer random
    accesses. Rays are processed in chunks so the gathered row tensor
    stays small for full-resolution frames."""
    n = cr.ksl.shape[0]
    k = _nchunks(n, chunk)
    if k == 1:
        return _extract_block(shadow, cr, init_value, fill_value)

    def split(a):
        if a.ndim == 3:      # corner-major (2, n, p) -> (k, 2, n//k, p)
            return jnp.moveaxis(
                a.reshape((2, k, n // k) + a.shape[2:]), 0, 1)
        return a.reshape((k, n // k) + a.shape[1:])

    crk = jax.tree_util.tree_map(split, cr)

    def body(_, crc):
        return None, _extract_block(shadow, crc, init_value, fill_value)

    _, (fv, fw) = jax.lax.scan(body, None, crk)
    return fv.reshape(n, -1), fw.reshape(n, -1)


# -- integration --------------------------------------------------------------

class _UpdateBlock(NamedTuple):
    """Per-ray-chunk integration inputs over (ray, tail, x-corner)."""
    rows: jnp.ndarray                 # (M,) geo slot row
    sgs: jnp.ndarray                  # (M,) geo z-slot (z_lo % 16)
    vals8: jnp.ndarray                # (M, 8) slot component values
    k_rows: Optional[jnp.ndarray]     # (M,) key slot row
    ksl: Optional[jnp.ndarray]        # (M,) key z-slot (z_lo % 32)
    kvals: Optional[jnp.ndarray]      # (M, 4) masked keys per component


def _build_geo_update(sgs, vals8):
    """(M,) slot + (M, 8) component values -> (M, 128) scatter-add rows
    (lane = 16*c + slot). Two bit-exact formulations (UPDATE_BUILD)."""
    n = vals8.shape[0]
    if UPDATE_BUILD == "lane128":
        # Pure 128-lane select tree: the per-lane component value is
        # picked by a log2(C)-deep where chain on constant lane-index
        # masks -- everything fuses into ONE 128-lane pass. The
        # "minor16"/"minor32" form below goes through (M, C, S)
        # intermediates whose minor dim is 16/32 lanes (7/8 or 3/4 of
        # every vreg AND store wasted) plus a sublane->lane relayout
        # reshape. Bit-exact to each other (tests/test_rowvol.py); pick
        # by measurement.
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        return jnp.where((lane & 15) == sgs[:, None],
                         _pick_lane(vals8, 16, lane), 0.0)
    hg = (jax.lax.broadcasted_iota(
        jnp.int32, (n, 8, 16), 2) == sgs[:, None, None])
    return jnp.where(hg, vals8[:, :, None], 0.0).reshape(-1, 128)


def _build_key_update(ksl, kvals):
    """(M,) slot + (M, 4) masked keys -> (M, 128) scatter-max rows
    (lane = 32*c + slot)."""
    n = kvals.shape[0]
    if UPDATE_BUILD == "lane128":
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        return jnp.where((lane & 31) == ksl[:, None],
                         _pick_lane(kvals, 32, lane), 0)
    hk = (jax.lax.broadcasted_iota(
        jnp.int32, (n, 4, 32), 2) == ksl[:, None, None])
    return jnp.where(hk, kvals[:, :, None], 0).reshape(-1, 128)


def _pick_lane(vals, width, lane):
    # vals (n, C) -> (n, 128) with out[:, l] = vals[:, l // width]
    cols = [vals[:, i:i + 1] for i in range(vals.shape[1])]
    step = width
    while len(cols) > 1:
        nxt = []
        for i in range(0, len(cols), 2):
            m = (lane & step) == 0
            nxt.append(jnp.where(m, cols[i], cols[i + 1]))
        cols = nxt
        step *= 2
    return cols[0]


def _merge_runs(rows, upd, t, combine, neutral):
    """Merge runs of equal consecutive rows within each length-t tail:
    the run head's update becomes combine() of the whole run, the rest
    re-target row 0 with ``neutral`` values. A suffix segmented combine
    -- t-1 fused (b, 128) where+combine steps, no (t, t) matmul."""
    b = rows.shape[0] // t
    r = rows.reshape(b, t)
    u = upd.reshape(b, t, 128)
    s = [u[:, i] for i in range(t)]
    same = [r[:, i + 1] == r[:, i] for i in range(t - 1)]
    for i in range(t - 2, -1, -1):
        s[i] = combine(s[i], jnp.where(same[i][:, None], s[i + 1], neutral))
    out, rout = [s[0]], [r[:, 0]]
    for i in range(1, t):
        head = ~same[i - 1]
        out.append(jnp.where(head[:, None], s[i], neutral))
        rout.append(jnp.where(head, r[:, i], 0))
    return (jnp.stack(rout, 1).reshape(-1),
            jnp.stack(out, 1).reshape(b * t, 128))


def _geo_scatter(geo, b: _UpdateBlock, t_merge: int = 0):
    vals8 = b.vals8
    # 16-bit state: the update weight math stays f32; the values round
    # to the accumulator dtype (RTNE) BEFORE the placement-only select
    # tree (EARLY_CAST, bit-identical to rounding after it) so the
    # (M, 128) intermediate materialises at half the bytes. Run-merging
    # does arithmetic on the built rows, so it forces the f32 build.
    if EARLY_CAST and t_merge <= 1 and vals8.dtype != geo.dtype:
        vals8 = vals8.astype(geo.dtype)
    upd = _build_geo_update(b.sgs, vals8)
    rows = b.rows
    if t_merge > 1:
        rows, upd = _merge_runs(rows, upd, t_merge, jnp.add,
                                jnp.float32(0))
    return geo.at[rows].add(upd.astype(geo.dtype))


def _key_scatter(key, b: _UpdateBlock, t_merge: int = 0):
    kupd = _build_key_update(b.ksl, b.kvals)
    krows = b.k_rows
    if t_merge > 1:
        # keys are >= 0, so 0 is the max-neutral element
        krows, kupd = _merge_runs(krows, kupd, t_merge, jnp.maximum,
                                  jnp.int32(0))
    return key.at[krows].max(kupd)


def _integrate_block(geo, key, b: _UpdateBlock, t_merge: int = 0):
    geo = _geo_scatter(geo, b, t_merge)
    if b.kvals is None:
        return geo, key
    return geo, _key_scatter(key, b, t_merge)


def integrate_rows(geo, key, cr: CornerRows, values, sem_key, ray_mask,
                   n_tail: int, chunk: int = _INTEGRATE_CHUNK,
                   do_sem=None):
    """Scatter the frame's updates into the slot state: ONE 128-lane
    scatter-add (all 4 (y, z) corners x {num, w}) and ONE 128-lane
    scatter-max (all 4 corner keys) per (ray, tail-sample, x-corner).
    Reference update math: modules/integrator.py:55-124. Very large
    frames stream through in a few python-unrolled chunks so the built
    update tensors stay bounded.

    ``do_sem``: optional traced bool -- when given (and ``sem_key`` is
    not None), the key scatter-max runs under ``lax.cond`` so semantic
    integration can be decimated to every k-th frame
    (SETTINGS.sem_integrate_every; the key scatter is row-bound at
    ~22 ms/frame at 448^3/256^2 and the semantic volume is a
    winner-takes-max accumulator, so skipping frames only drops
    observations, it cannot corrupt state). The geo scatter always
    runs."""
    t = n_tail
    n = cr.ksl.shape[0]
    m = n * t

    def flat(a):          # shared (n, p) -> tail-cut compact (m,)
        return a[:, :t].reshape(-1)

    def both(a):          # (m,) -> (2m,) corner-major duplication
        return jnp.concatenate([a, a])

    dz0, dz1 = flat(cr.dz0), flat(cr.dz1)
    wz0 = flat(cr.wz0) * flat(cr.vz0)
    wz1 = flat(cr.wz1) * flat(cr.vz1)
    # weight mass landing on slot z-offset 0 / 1 (degenerate pairs have
    # dz0 == dz1 == 0 and fold onto offset 0)
    wz_at0 = jnp.where(dz0 == 0, wz0, 0.0) + jnp.where(dz1 == 0, wz1, 0.0)
    wz_at1 = jnp.where(dz0 == 1, wz0, 0.0) + jnp.where(dz1 == 1, wz1, 0.0)
    wyA = flat(cr.wyA) * flat(cr.vyA)
    wyB = flat(cr.wyB) * flat(cr.vyB)
    # shared (y, z)-corner weight products
    pA0, pA1 = wyA * wz_at0, wyA * wz_at1
    pB0, pB1 = wyB * wz_at0, wyB * wz_at1
    nvals = jnp.broadcast_to(values[:, :t],
                             (n, t)).astype(jnp.float32).reshape(-1)
    rm = (jnp.broadcast_to(ray_mask[:, None], (n, t)).reshape(-1)
          if ray_mask is not None else None)

    def corner_vals8(c):
        wx_c = cr.wx[c][:, :t].reshape(-1) * cr.vx[c][:, :t].reshape(-1)
        if rm is not None:
            wx_c = wx_c * rm
        nv_c = wx_c * nvals
        return jnp.stack(
            [pA0 * nv_c, pA1 * nv_c, pB0 * nv_c, pB1 * nv_c,
             pA0 * wx_c, pA1 * wx_c, pB0 * wx_c, pB1 * wx_c],
            axis=-1)                                       # (m, 8)

    vals8 = jnp.concatenate([corner_vals8(0), corner_vals8(1)], axis=0)

    if sem_key is not None:
        kf = jnp.broadcast_to(sem_key.astype(jnp.int32)[:, None],
                              (n, t)).reshape(-1)
        if rm is not None:
            kf = jnp.where(rm, kf, 0)
        vz0b, vz1b = flat(cr.vz0).astype(bool), flat(cr.vz1).astype(bool)
        m0 = ((dz0 == 0) & vz0b) | ((dz1 == 0) & vz1b)
        m1 = ((dz0 == 1) & vz0b) | ((dz1 == 1) & vz1b)
        vyAb, vyBb = flat(cr.vyA).astype(bool), flat(cr.vyB).astype(bool)

        def corner_kvals(c):
            kx = jnp.where(cr.vx[c][:, :t].reshape(-1).astype(bool),
                           kf, 0)
            return jnp.stack(
                [jnp.where(vyAb & m0, kx, 0), jnp.where(vyAb & m1, kx, 0),
                 jnp.where(vyBb & m0, kx, 0), jnp.where(vyBb & m1, kx, 0)],
                axis=-1)                                   # (m, 4)

        kvals = jnp.concatenate([corner_kvals(0), corner_kvals(1)], axis=0)
        k_rows = cr.k_rows[:, :, :t].reshape(-1)
        ksl = both(flat(cr.ksl))
    else:
        kvals = k_rows = ksl = None

    blk = _UpdateBlock(rows=cr.sg_rows[:, :, :t].reshape(-1),
                       sgs=both(flat(cr.sgs)),
                       vals8=vals8, k_rows=k_rows, ksl=ksl, kvals=kvals)

    m = blk.rows.shape[0]
    kch = _nchunks(m, chunk * 2 * t)
    # run-merge only when every chunk holds whole (ray, x-corner) tails
    t_merge = t if (MERGE_DUP and (m // kch) % t == 0) else 0
    if kch == 1:
        chunks = [blk]
    else:
        blkk = jax.tree_util.tree_map(
            lambda a: a.reshape((kch, m // kch) + a.shape[1:]), blk)
        chunks = [jax.tree_util.tree_map(lambda a, i=i: a[i], blkk)
                  for i in range(kch)]

    # UNROLLED python loop, not lax.scan: a while-loop carry of the
    # multi-GB (geo, key) state forces XLA to copy the carry every chunk
    # iteration (~10 ms/GB/iter, tools/probe_slot_scatter.py).
    # Unrolled, each scatter aliases its input buffer in place.
    for bc in chunks:
        geo = _geo_scatter(geo, bc, t_merge)
    if kvals is None:
        return geo, key

    def all_keys(k):
        for bc in chunks:
            k = _key_scatter(k, bc, t_merge)
        return k

    if do_sem is None:
        return geo, all_keys(key)
    return geo, jax.lax.cond(do_sem, all_keys, lambda k: k, key)
