"""Pallas TPU kernel for the per-frame gather-shadow build (slot layout).

``rowvol.build_shadow`` reconciles the slot scatter state into the
packed-bf16 gather shadow once per frame. The XLA implementation pays
multiple materialised relayout passes over the multi-GB state; this
kernel does reconcile -> pack -> 4-component shadow assembly in ONE
double-buffered pass through VMEM.

Structure (see rowvol.py SLOT LAYOUT):
- geo state rows (x, 1 + y, g): 128 lanes = 8 components x 16 z-slots,
  with zero pad rows at y = -1 and y = Y per x -- the pad rows make the
  y-halo DMA unconditionally in-bounds.
- reconciled voxel value: num(y, z) = nA0(y, z) + nA1(y, z-1)
  + nB0(y-1, z) + nB1(y-1, z-1) (same for w); z-shifts are group-local
  lane rotates with a group-boundary carry, y-shifts are row slices of
  the haloed slab.
- shadow rows (x, y, gk): 128 lanes = 4 corner components x 32 z-slots;
  the components are [P, P(z+1), P(y+1), P(y+1, z+1)] -- plain shifted
  copies of ONE packed P, so P is computed once per tile for TY+1 rows
  and the components are narrow shifts/slices of it.

Grid (x, y-tile) with an explicitly double-buffered halo DMA: tile
(x, j) loads geo rows [(x*SY + j*TY) * G, +(TY+2)*G) -- its y-halo on
both sides -- into slab[i%2] while tile i-1 computes (Pallas BlockSpecs
cannot express overlapping windows; the manual copy reads each state row
once instead of the 2-3x of shifted-view inputs).

Environment constraints honoured (probed in tools/probe_pallas_caps*.py):
no f16 / 16-bit bitcasts (bf16 pack via full-width f32<->i32 bitcasts,
geometry.pack16_numw format), no offset-mismatched lane concats (rolls +
iota selects instead), 16-lane-offset ref stores and dynamic-offset DMA
are supported.

Reference semantics being reproduced: modules/extractor.py:640-681 reads
(tsdf, weight) pairs per trilinear corner; this shadow serves those
reads as packed (bf16 num | bf16 w) lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_ty(Y: int, max_ty=None) -> int:
    """Kept in sync with rowvol.pick_ty (the dirty-tile mask must use the
    same tiling as the kernels; rowvol imports this module lazily, so the
    single definition -- and the shared SHADOW_MAX_TY default -- lives
    there)."""
    from ..rowvol import pick_ty
    return pick_ty(Y, max_ty)


def _compiler_params():
    """Raise Mosaic's scoped-VMEM cap (default 16 MB) toward the
    physical VMEM so tall shadow tiles compile. The kernels are DMA
    ISSUE-bound (~2-3 us/copy x 2 copies/tile; measured floor ~20 ms at
    448^3 with TY=56 = 7168 copies), so fewer/taller tiles are the only
    remaining lever -- TY=112 needs 19.4 MB of compute temps and died on
    the default cap in the round-4 TY sweep. Strided multi-row DMA
    (x-grouping) is NOT an alternative: probing it crashed the TPU
    worker (tools/probe_pallas_caps3.py, round 4)."""
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except (AttributeError, TypeError):
        return None


def _check_slab_alignment(dtype, TY, G):
    """16-bit geo slab DMA legality: Mosaic requires copy starts
    divisible by 16 raw rows (TY * G with the even-SY*G layout term) and
    slice shapes (TY + 2) * G divisible by 8. RowLayout (G multiple of
    4) + Database Y-padding (TY % 8 == 0 via pick_ty) guarantee both for
    every Database volume; direct callers on unpadded shapes get this
    loud error instead of a Mosaic lowering failure."""
    if jnp.dtype(dtype).itemsize == 2 and (TY % 8 or G % 4):
        raise ValueError(
            f"16-bit geo slab kernels need TY % 8 == 0 and G % 4 == 0 "
            f"(got TY={TY}, G={G}); pad the volume Y extent to a "
            "multiple of 8 (Database._padded_shape does this "
            "automatically) or use a float32 geo state")


def _slab_rows(TY, G, dtype):
    """Per-buffer geo-slab rows, padded up so each double-buffer slot
    starts on a Mosaic dim-0 tile boundary: the slot offset s * rows must
    be provably divisible by the HBM/VMEM row tiling (8 rows for 4-byte
    dtypes, 16 for 16-bit dtypes packed (2, 1)); (TY + 2) * G itself is
    only guaranteed 8-divisible. The DMA and the compute touch only the
    live (TY + 2) * G rows; the pad rows are never written or read."""
    mult = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    rows = (TY + 2) * G
    return -(-rows // mult) * mult


def _pack16(num, w):
    """(bf16(num) << 16) | bf16(w) -- geometry.pack16_numw in i32 ops.

    The rounding is done MANUALLY with the classic add-half-to-even bit
    trick on the f32 words: Mosaic's compiled f32->bf16 convert does not
    round like XLA's RTNE (measured: systematic +1-ulp differences on
    ~43% of values, tools/probe_shadow_debug.py), and 16-bit bitcasts
    don't lower at all. The bit trick is RTNE by construction -- carries
    propagate into the exponent correctly, f32 subnormals are
    bf16-aligned, +-0 and inf fall out exactly -- so it is bit-identical
    to the XLA-side pack16_numw."""
    nb = jax.lax.bitcast_convert_type(num, jnp.int32)
    wb = jax.lax.bitcast_convert_type(w, jnp.int32)
    nr = (nb + (jnp.int32(0x7FFF) + ((nb >> 16) & 1))) & jnp.int32(-65536)
    wr = ((wb + (jnp.int32(0x7FFF) + ((wb >> 16) & 1))) >> 16) \
        & jnp.int32(0xFFFF)
    return jax.lax.bitcast_convert_type(nr | wr, jnp.uint32)


def _shadow_tile_compute(v_all, *, TY, G, GK):
    """One tile's reconcile -> pack -> 4-component assembly: slab values
    (TY + 2, G, 128) -> packed shadow tile (TY * GK, 128). Full-128-lane
    formulation. The first version of this kernel sliced
    P down to its 16 valid lanes and assembled the output with 8 narrow
    16-lane stores -- Mosaic pads sub-128-lane values to full vregs, so
    every P op ran at 1/8 lane efficiency and the kernel was
    COMPUTE-bound at 2-4x its DMA floor (tools/probe_shadow_variants.py:
    DMA-only 19.7 ms = the 20.3 ms BW floor; full kernel 48-102 ms).
    Here every tensor keeps 128 lanes end-to-end: the z-group axis is
    split into even/odd halves (A = group 2gk, B = 2gk+1) so z-group
    shifts become sublane-axis concats, the bf16 pack runs on all 128
    lanes (only lane group 0 is ever read), and the output tile is
    composed with lane-range selects + rolls and written with ONE
    full-width store.

    A 16-bit (bf16) geo state is upcast here (exact), so the reconcile
    arithmetic -- and its bit-equality with rowvol._reconcile_slot -- is
    f32 for every geo dtype; only the DMA'd slab bytes shrink."""
    v_all = v_all.astype(jnp.float32)

    def roll(t, s):
        """Value from lane (l - s) % 128 -- jnp.roll semantics, verified
        identical between Mosaic's compiled rotate and interpret mode
        (tools/probe_shadow_debug.py)."""
        return pltpu.roll(t, s, t.ndim - 1)
    Gp = 2 * GK
    if G < Gp:   # odd group count: the last gk's odd half is zero
        v_all = jnp.concatenate(
            [v_all, jnp.zeros((TY + 2, Gp - G, 128), v_all.dtype)], axis=1)
    elif G > Gp:  # DMA-alignment pad groups (RowLayout rounds G up to a
        v_all = v_all[:, :Gp]       # multiple of 4): zeros, never shadowed
    vh = v_all.reshape(TY + 2, GK, 2, 128)
    vA_all, vB_all = vh[:, :, 0], vh[:, :, 1]     # (TY+2, GK, 128)

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (TY + 2, GK, 128), 2)
    lm0 = (lane2 % 16) == 0

    def prevgk(t):       # X[gk-1] along the z-group-pair axis
        if t.shape[1] == 1:  # GK == 1: the empty tail slice is a Mosaic
            return jnp.zeros_like(t)   # error ("positive constant sizes")
        return jnp.concatenate(
            [jnp.zeros((t.shape[0], 1, 128), t.dtype), t[:, :-1]], axis=1)

    def nextgk(t):       # X[gk+1], zero beyond the last group pair
        if t.shape[1] == 1:
            return jnp.zeros_like(t)
        return jnp.concatenate(
            [t[:, 1:], jnp.zeros((t.shape[0], 1, 128), t.dtype)], axis=1)

    # Reconcile, z-part first (shared across the two y-rows each voxel
    # reads -- the y-1 operand is the SAME u at the previous slab row):
    # u[l] = v[l] (comp c) + v[l+15] (comp c+1 at slot s-1); at slot
    # s == 0 the s-1 term carries from the previous z-GROUP's slot 15 --
    # group 2gk's previous group is B[gk-1], group 2gk+1's is A[gk].
    # Then t(y) = u(y) + u(y-1) rolled by 96: lanes 0..15 pick up the
    # comp-2/3 pair sums of row y-1 (and lanes 64..79 the w comps 6/7).
    # Only the num (0..15) and w (64..79) lane groups of t are ever read;
    # comp wrap-around garbage elsewhere is harmless.
    # pltpu.roll convention (jnp.roll, shift >= 0): roll(t, s)[l] =
    # t[(l - s) % 128], so a backward shift by k is roll by 128 - k.
    uA = vA_all + jnp.where(lm0, roll(prevgk(vB_all), 97),
                            roll(vA_all, 113))
    uB = vB_all + jnp.where(lm0, roll(vA_all, 97), roll(vB_all, 113))
    tA = uA[1:] + roll(uA[:-1], 96)               # (TY+1, GK, 128)
    tB = uB[1:] + roll(uB[:-1], 96)

    # Half-shadow assembly BEFORE packing: E holds the [c0 | c1] 32+32
    # lane blocks (comp 0 = P, comp 1 = P(z+1)) of num in lanes 0..31 via
    # E_num and of w via E_w; one pack then produces the packed [c0|c1]
    # half-row, and the [c2|c3] half is the SAME packed tensor at row
    # y+1 (c2/c3 are c0/c1 of the next y) -- the y-expansion is one
    # roll+select instead of re-assembling two more components.
    l = jax.lax.broadcasted_iota(jnp.int32, (TY + 1, GK, 128), 2)

    def assemble(a, b, o):
        # lanes 0..15:  a[l+o]         (comp 0, group 2gk)
        # lanes 16..31: b[l-16+o]      (comp 0, group 2gk+1)
        # lanes 32..46: a[l-31+o]      (comp 1 = z+1 within group 2gk)
        # lane  47:     b[0+o], 48..62: b[l-47+o]  (z+1 crossing into B)
        # lane  63:     nextgk(a)[0+o] (z+1 crossing the group pair)
        # o = 0 selects the num lanes, o = 64 the w lanes of t.
        first = a if o == 0 else roll(a, (128 - o) % 128)
        return jnp.where(
            l < 16, first,
            jnp.where(l < 32, roll(b, (16 - o) % 128),
                      jnp.where(l < 47, roll(a, (31 - o) % 128),
                                jnp.where(l < 63, roll(b, (47 - o) % 128),
                                          roll(nextgk(a),
                                               (63 - o) % 128)))))

    E_num = assemble(tA, tB, 0)
    E_w = assemble(tA, tB, 64)
    P = _pack16(E_num, E_w)                       # (TY+1, GK, 128) u32

    lo = jax.lax.broadcasted_iota(jnp.int32, (TY, GK, 128), 2)
    out = jnp.where(lo < 64, P[:TY], roll(P[1:], 64))
    return out.reshape(TY * GK, 128)


def _kernel(geo_hbm, out_ref, slab, sem, *, TY, SY, G, GK, NJ, N, interp):
    """Full-rebuild kernel: grid (x, y-tile), double-buffered halo DMA,
    blocked output spec (see _shadow_tile_compute for the math)."""
    x = pl.program_id(0)
    j = pl.program_id(1)
    i = x * NJ + j
    SLAB = (TY + 2) * G

    def dma(idx, s):
        xx = idx // NJ
        jj = idx - xx * NJ
        # literal per-term coefficients: Mosaic's divisibility prover
        # must show start % the row tiling (16 for 16-bit dtypes); it
        # factors xx * (SY * G) + jj * (TY * G) -- both coefficients are
        # 16-divisible by RowLayout construction -- but not the
        # distributed (xx * SY + jj * TY) * G form.
        start = xx * (SY * G) + jj * (TY * G)
        return pltpu.make_async_copy(
            geo_hbm.at[pl.ds(start, SLAB), :],
            slab.at[s, pl.ds(0, SLAB)], sem.at[s])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < N)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    out_ref[0] = _shadow_tile_compute(
        slab[i % 2, pl.ds(0, SLAB)].reshape(TY + 2, G, 128),
        TY=TY, G=G, GK=GK)


def build_shadow_pallas(geo: jnp.ndarray, layout, interpret: bool = False,
                        max_ty=None) -> jnp.ndarray:
    """Drop-in Pallas replacement for ``rowvol.build_shadow`` (bit-exact:
    same reconcile arithmetic, same f32->bf16 RTNE packing)."""
    L = layout
    X, Y, G, GK = L.X, L.Y, L.G, L.GK
    TY = _pick_ty(Y, max_ty)
    _check_slab_alignment(geo.dtype, TY, G)
    NJ = Y // TY
    out = pl.pallas_call(
        functools.partial(_kernel, TY=TY, SY=L.SY, G=G, GK=GK,
                          NJ=NJ, N=X * NJ, interp=interpret),
        grid=(X, NJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TY * GK, 128), lambda x, j: (x, j, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y * GK, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2, _slab_rows(TY, G, geo.dtype), 128),
                                   geo.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(geo)
    return out.reshape(L.shadow_rows, 128)


def _dirty_kernel(dirty_ref, geo_hbm, prev_hbm, out_hbm, slab, outbuf,
                  insem, outsem, cnt, *, TY, SY, G, GK, NJ, N):
    """Dirty-tile shadow rebuild: like _kernel, but a tile whose
    ``dirty`` flag is 0 is SKIPPED entirely (no DMA, no compute, no
    store) -- ``prev_hbm`` is aliased into ``out_hbm``, so skipped tiles
    keep their previous content. Output is written through a
    double-buffered VMEM scratch with manual DMA (a blocked out_spec
    would clobber clean tiles). ``dirty`` has N + 1 entries (trailing 0
    sentinel) and is scalar-prefetched into SMEM. ``cnt`` (SMEM) counts
    issued output copies; out slots alternate by count so consecutive
    dirty tiles double-buffer even when their grid parities collide."""
    del prev_hbm  # aliased into out_hbm; only its unchanged tiles matter
    x = pl.program_id(0)
    j = pl.program_id(1)
    i = x * NJ + j
    SLAB = (TY + 2) * G

    def in_dma(idx, s):
        xx = idx // NJ
        jj = idx - xx * NJ
        # literal per-term coefficients: Mosaic's divisibility prover
        # must show start % the row tiling (16 for 16-bit dtypes); it
        # factors xx * (SY * G) + jj * (TY * G) -- both coefficients are
        # 16-divisible by RowLayout construction -- but not the
        # distributed (xx * SY + jj * TY) * G form.
        start = xx * (SY * G) + jj * (TY * G)
        return pltpu.make_async_copy(
            geo_hbm.at[pl.ds(start, SLAB), :],
            slab.at[s, pl.ds(0, SLAB)], insem.at[s])

    def out_dma(idx, s):
        xx = idx // NJ
        jj = idx - xx * NJ
        return pltpu.make_async_copy(
            outbuf.at[s],
            out_hbm.at[xx, pl.ds(jj * TY * GK, TY * GK), :],
            outsem.at[s])

    @pl.when(i == 0)
    def _():
        cnt[0] = 0

        @pl.when(dirty_ref[0] != 0)
        def _():
            in_dma(0, 0).start()

    @pl.when((i + 1 < N) & (dirty_ref[i + 1] != 0))
    def _():
        in_dma(i + 1, (i + 1) % 2).start()

    @pl.when(dirty_ref[i] != 0)
    def _():
        in_dma(i, i % 2).wait()
        out = _shadow_tile_compute(
            slab[i % 2, pl.ds(0, SLAB)].reshape(TY + 2, G, 128),
            TY=TY, G=G, GK=GK)
        c = cnt[0]
        so = c % 2

        @pl.when(c >= 2)   # copy c-2 used this slot; drain before reuse
        def _():
            out_dma(i, so).wait()

        outbuf[so] = out
        out_dma(i, so).start()
        cnt[0] = c + 1

    @pl.when(i == N - 1)   # drain the (up to two) outstanding copies
    def _():
        c = cnt[0]

        @pl.when(c >= 2)
        def _():
            out_dma(i, c % 2).wait()

        @pl.when(c >= 1)
        def _():
            out_dma(i, (c - 1) % 2).wait()


def build_shadow_dirty_pallas(geo: jnp.ndarray, prev_shadow: jnp.ndarray,
                              dirty: jnp.ndarray, layout,
                              interpret: bool = False,
                              max_ty=None) -> jnp.ndarray:
    """Pallas implementation of ``rowvol.build_shadow_dirty``:
    ``prev_shadow`` is donated/aliased into the output; only tiles with a
    nonzero ``dirty`` flag are recomputed from ``geo``. ``dirty`` is
    (X * NJ + 1,) i32 (rowvol.dirty_tile_mask)."""
    L = layout
    X, Y, G, GK = L.X, L.Y, L.G, L.GK
    TY = _pick_ty(Y, max_ty)
    _check_slab_alignment(geo.dtype, TY, G)
    NJ = Y // TY
    out = pl.pallas_call(
        functools.partial(_dirty_kernel, TY=TY, SY=L.SY, G=G, GK=GK,
                          NJ=NJ, N=X * NJ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(X, NJ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, _slab_rows(TY, G, geo.dtype), 128),
                           geo.dtype),
                pltpu.VMEM((2, TY * GK, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
            ]),
        out_shape=jax.ShapeDtypeStruct((X, Y * GK, 128), jnp.uint32),
        input_output_aliases={2: 0},   # prev_shadow (after scalars) -> out
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(dirty, geo, prev_shadow.reshape(X, Y * GK, 128))
    return out.reshape(L.shadow_rows, 128)


def _reconcile_kernel(geo_hbm, num_ref, w_ref, slab, sem,
                      *, TY, SY, G, NJ, N):
    """Slot state -> canonical (num, w) planes. Same reconcile math as
    the shadow kernel, minus the pack/shadow assembly; outputs are
    written as per-group 16-lane stores so no narrow-minor-dim tensor is
    ever materialised in HBM (the XLA formulation's 5-D comp slices pay
    a 4.6x tile-padding expansion -- 12.5 GB of temps at 448^3, the OOM
    this kernel exists to avoid)."""
    def roll(t, s):
        return pltpu.roll(t, s, t.ndim - 1)

    x = pl.program_id(0)
    j = pl.program_id(1)
    i = x * NJ + j
    SLAB = (TY + 2) * G

    def dma(idx, s):
        xx = idx // NJ
        jj = idx - xx * NJ
        # literal per-term coefficients: Mosaic's divisibility prover
        # must show start % the row tiling (16 for 16-bit dtypes); it
        # factors xx * (SY * G) + jj * (TY * G) -- both coefficients are
        # 16-divisible by RowLayout construction -- but not the
        # distributed (xx * SY + jj * TY) * G form.
        start = xx * (SY * G) + jj * (TY * G)
        return pltpu.make_async_copy(
            geo_hbm.at[pl.ds(start, SLAB), :],
            slab.at[s, pl.ds(0, SLAB)], sem.at[s])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < N)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    v_all = slab[i % 2, pl.ds(0, SLAB)].reshape(
        TY + 2, G, 128).astype(jnp.float32)
    v = v_all[1:TY + 1]
    vy = v_all[0:TY]

    lane = jax.lax.broadcasted_iota(jnp.int32, (TY, G, 128), 2)
    lm0 = (lane % 16) == 0

    def prevg(t):
        if t.shape[1] == 1:  # single z-group: Mosaic rejects empty slices
            return jnp.zeros_like(t)
        return jnp.concatenate(
            [jnp.zeros((TY, 1, 128), t.dtype), t[:, :-1]], axis=1)

    pv, pvy = prevg(v), prevg(vy)
    # (z-pair) + (z-pair) grouping, matching rowvol._reconcile_slot and
    # the shadow kernel's shared-u formulation bit-exactly
    t = ((v + jnp.where(lm0, roll(pv, 97), roll(v, 113)))
         + (roll(vy, 96)
            + jnp.where(lm0, roll(pvy, 65), roll(vy, 81))))
    num = t[:, :, 0:16]
    w = roll(t, 64)[:, :, 0:16]
    for g in range(G):
        num_ref[0, :, 16 * g:16 * g + 16] = num[:, g]
        w_ref[0, :, 16 * g:16 * g + 16] = w[:, g]


def reconcile_slot_pallas(geo: jnp.ndarray, layout,
                          interpret: bool = False, max_ty=None):
    """Slot geo state -> canonical (num, w) of shape (X, Y, Z); the
    on-device counterpart of rowvol._reconcile_slot."""
    L = layout
    X, Y, G = L.X, L.Y, L.G
    TY = _pick_ty(Y, max_ty)
    _check_slab_alignment(geo.dtype, TY, G)
    NJ = Y // TY
    Zp = 16 * G
    spec = pl.BlockSpec((1, TY, Zp), lambda x, j: (x, j, 0))
    num, w = pl.pallas_call(
        functools.partial(_reconcile_kernel, TY=TY, SY=L.SY, G=G,
                          NJ=NJ, N=X * NJ),
        grid=(X, NJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32),
                   jax.ShapeDtypeStruct((X, Y, Zp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, _slab_rows(TY, G, geo.dtype), 128),
                                   geo.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(geo)
    return num[:, :, :L.Z], w[:, :, :L.Z]


def _key_reconcile_kernel(key_hbm, k_ref, slab, bsem, hsem,
                          *, TY, Y, GK, NJ, N):
    """Key slot state -> canonical packed-key planes. Max-combine version
    of _reconcile_kernel over the 4 x 32-slot key layout: voxel (y, z)
    maxes comp 0 of slot (y, z), comp 1 of (y, z-1), comp 2 of (y-1, z),
    comp 3 of (y-1, z-1). Key rows have NO y-pad rows (key_rows =
    X*Y*GK), so slab row 0 is a y-1 halo: DMA'd separately (GK rows)
    when the tile starts mid-column, zero-filled in compute when the
    tile starts at y == 0 (with the default full-column tile the halo
    copy never fires and each tile is ONE aligned body DMA -- per-copy
    issue overhead, not BW, bounds these kernels)."""
    def roll(t, s):
        return pltpu.roll(t, s, t.ndim - 1)

    x = pl.program_id(0)
    j = pl.program_id(1)
    i = x * NJ + j

    def start_of(idx):
        xx = idx // NJ
        jj = idx - xx * NJ
        return (xx * Y + jj * TY) * GK, jj

    def dma_body(idx, s):
        start, _ = start_of(idx)
        return pltpu.make_async_copy(
            key_hbm.at[pl.ds(start, TY * GK), :],
            slab.at[s, pl.ds(GK, TY * GK)], bsem.at[s])

    def dma_halo(idx, s):
        start, _ = start_of(idx)
        return pltpu.make_async_copy(
            key_hbm.at[pl.ds(start - GK, GK), :],
            slab.at[s, pl.ds(0, GK)], hsem.at[s])

    def issue(idx, s):
        dma_body(idx, s).start()
        _, jj = start_of(idx)

        @pl.when(jj > 0)
        def _():
            dma_halo(idx, s).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < N)
    def _():
        issue(i + 1, (i + 1) % 2)

    dma_body(i, i % 2).wait()

    @pl.when(j > 0)
    def _():
        dma_halo(i, i % 2).wait()

    v_all = slab[i % 2].reshape(TY + 1, GK, 128)
    # tiles starting at y == 0 have no y-1 rows: halo reads as zero
    # (iota mask, not .at[].set -- value-scatter doesn't lower in Mosaic)
    yidx = jax.lax.broadcasted_iota(jnp.int32, (TY + 1, GK, 128), 0)
    v_all = jnp.where((j == 0) & (yidx == 0),
                      jnp.zeros_like(v_all), v_all)
    v = v_all[1:]                                  # (TY, GK, 128)
    vy = v_all[:-1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (TY, GK, 128), 2)
    lm0 = (lane % 32) == 0

    def prevg(t):
        if t.shape[1] == 1:  # single z-group: Mosaic rejects empty slices
            return jnp.zeros_like(t)
        return jnp.concatenate(
            [jnp.zeros((TY, 1, 128), t.dtype), t[:, :-1]], axis=1)

    # aligned to output lanes l in [0, 32): comp c's slot s lives at lane
    # 32c + s, so c1[z-1] = lane l+31 (l > 0) / prev group's lane 63
    # (l == 0), c2[y-1, z] = vy lane l+64, c3[y-1, z-1] = vy lane l+95
    # (l > 0) / prev group's lane 127 (l == 0)
    t = jnp.maximum(v, jnp.where(lm0, roll(prevg(v), 65), roll(v, 97)))
    t = jnp.maximum(t, roll(vy, 64))
    t = jnp.maximum(t, jnp.where(lm0, roll(prevg(vy), 1), roll(vy, 33)))
    for g in range(GK):
        k_ref[0, :, 32 * g:32 * g + 32] = t[:, g, 0:32]


def reconcile_key_pallas(key: jnp.ndarray, layout, interpret: bool = False,
                         max_ty: int = 112) -> jnp.ndarray:
    """Key slot state -> canonical (X, Y, Z) packed keys; the on-device
    counterpart of rowvol._reconcile_key. max_ty bounds Mosaic's scoped
    VMEM for the compute temps (TY = 448 needs 38 MB > the 16 MB limit;
    112 fits with margin). Runs once per scan exit, so per-tile DMA issue
    overhead is immaterial here."""
    L = layout
    X, Y, GK = L.X, L.Y, L.GK
    TY = _pick_ty(Y, max_ty)
    NJ = Y // TY
    Zp = 32 * GK
    k = pl.pallas_call(
        functools.partial(_key_reconcile_kernel, TY=TY, Y=Y, GK=GK, NJ=NJ,
                          N=X * NJ),
        grid=(X, NJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TY, Zp), lambda x, j: (x, j, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Zp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, (TY + 1) * GK, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(key)
    return k[:, :, :L.Z]


# -- vmap support -------------------------------------------------------------
#
# pallas_call with manual DMA + scratch does not batch, but both kernels
# are UNIFORM over the x grid axis: a batch of S scenes is identical to a
# single volume with X' = S*X (geo rows for scene s, slice x sit exactly
# where rows for global slice s*X + x would). The custom_vmap rules below
# therefore just fold the batch axis into x and re-split the outputs --
# this is what makes the scene-parallel vmapped fuse path (multi-scene
# streaming, parallel/scene_parallel.py) compose with the kernels.
#
# Rules MUST honor ``in_batched``: under vmap(fuse_sequence) the initial
# shadow/dirty carry is created INSIDE the vmapped function from
# constants, so it reaches the rule UNBATCHED while geo is batched
# (round-3 regression: indexing dirty[:, :nt] on a 1-D dirty killed the
# multi-scene bench; tests/test_shadow_pallas.py::TestVmapRules).

import functools as _ft


def _batched_layout(layout, S):
    return layout._replace(X=S * layout.X)


def _bcast(a, batched, S):
    """Broadcast an unbatched operand to the vmap batch."""
    return a if batched else jnp.broadcast_to(a[None], (S,) + a.shape)


@_ft.lru_cache(maxsize=None)
def _shadow_fn(layout, interpret=False):
    @jax.custom_batching.custom_vmap
    def f(geo):
        return build_shadow_pallas(geo, layout, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, geo):
        S = axis_size
        Lb = _batched_layout(layout, S)
        geo = _bcast(geo, in_batched[0], S)
        out = build_shadow_pallas(
            geo.reshape(S * layout.geo_rows, 128), Lb,
            interpret=interpret)
        return out.reshape(S, layout.shadow_rows, 128), True

    return f


@_ft.lru_cache(maxsize=None)
def _shadow_dirty_fn(layout, interpret=False):
    @jax.custom_batching.custom_vmap
    def f(geo, prev_shadow, dirty):
        return build_shadow_dirty_pallas(geo, prev_shadow, dirty, layout,
                                         interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, geo, prev_shadow, dirty):
        from .. import rowvol as _rv
        S = axis_size
        Lb = _batched_layout(layout, S)
        _, NJ = _rv.shadow_tiling(layout)
        nt = layout.X * NJ
        geo = _bcast(geo, in_batched[0], S)
        prev_shadow = _bcast(prev_shadow, in_batched[1], S)
        dirty = _bcast(dirty, in_batched[2], S)
        dirty_b = jnp.concatenate(
            [dirty[:, :nt].reshape(-1), jnp.zeros((1,), jnp.int32)])
        out = build_shadow_dirty_pallas(
            geo.reshape(S * layout.geo_rows, 128),
            prev_shadow.reshape(S * layout.shadow_rows, 128),
            dirty_b, Lb, interpret=interpret)
        return out.reshape(S, layout.shadow_rows, 128), True

    return f


def build_shadow_dirty_pallas_v(geo, prev_shadow, dirty, layout,
                                interpret=False):
    """vmappable entry point (see the custom_vmap note above)."""
    return _shadow_dirty_fn(layout, interpret)(geo, prev_shadow, dirty)


@_ft.lru_cache(maxsize=None)
def _reconcile_fn(layout, interpret=False):
    @jax.custom_batching.custom_vmap
    def f(geo):
        return reconcile_slot_pallas(geo, layout, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, geo):
        S = axis_size
        Lb = _batched_layout(layout, S)
        geo = _bcast(geo, in_batched[0], S)
        n, w = reconcile_slot_pallas(
            geo.reshape(S * layout.geo_rows, 128), Lb,
            interpret=interpret)
        shp = (S, layout.X, layout.Y, layout.Z)
        return (n.reshape(shp), w.reshape(shp)), (True, True)

    return f


@_ft.lru_cache(maxsize=None)
def _key_reconcile_fn(layout, interpret=False):
    @jax.custom_batching.custom_vmap
    def f(key):
        return reconcile_key_pallas(key, layout, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, key):
        S = axis_size
        Lb = _batched_layout(layout, S)
        key = _bcast(key, in_batched[0], S)
        k = reconcile_key_pallas(
            key.reshape(S * layout.key_rows, 128), Lb,
            interpret=interpret)
        return k.reshape(S, layout.X, layout.Y, layout.Z), True

    return f


def build_shadow_pallas_v(geo, layout, interpret=False):
    """vmappable entry point (see the custom_vmap note above)."""
    return _shadow_fn(layout, interpret)(geo)


def reconcile_key_pallas_v(key, layout, interpret=False):
    """vmappable entry point (see the custom_vmap note above)."""
    return _key_reconcile_fn(layout, interpret)(key)


def reconcile_slot_pallas_v(geo, layout, interpret=False):
    """vmappable entry point (see the custom_vmap note above)."""
    return _reconcile_fn(layout, interpret)(geo)
