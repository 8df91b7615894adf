"""Pallas shadow-build kernel: bit-exactness vs the XLA build_shadow.

Runs in interpret mode on the CPU mesh (the TPU compile path is exercised
by tools/probe_shadow_pallas.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import rowvol
from segfusion_tpu.ops.geometry import pack16_numw, unpack16_numw
from segfusion_tpu.ops.pallas.shadow_build import (_pack16,
                                                   build_shadow_pallas)


def _edge_floats(rng):
    return np.concatenate([
        rng.randn(4096).astype(np.float32) * 0.1,          # typical tsdf
        rng.randn(4096).astype(np.float32) * 1000.0,       # large weights
        rng.uniform(1e-9, 1e-4, 2048).astype(np.float32),  # tiny weights
        np.array([0.0, -0.0, 65504.0, 1e9, -1e9, 3.4e38,
                  1e-38, -1e-38, 1.0 + 2 ** -9, 1.0 + 2 ** -8],
                 np.float32),
    ])


def test_kernel_pack_matches_pack16_numw():
    """The kernel's i32-bitcast bf16 pack == geometry.pack16_numw."""
    rng = np.random.RandomState(0)
    vals = _edge_floats(rng)
    n = -(-vals.size // 128) * 128
    num = np.pad(vals, (0, n - vals.size)).reshape(-1, 128)
    w = np.abs(num[::-1].copy())
    got = np.asarray(jax.jit(_pack16)(jnp.asarray(num), jnp.asarray(w)))
    want = np.asarray(jax.jit(pack16_numw)(jnp.asarray(num),
                                           jnp.asarray(w)))
    assert np.array_equal(got, want)


def test_unpack_roundtrip_is_bf16():
    rng = np.random.RandomState(1)
    x = rng.randn(256, 128).astype(np.float32) * 5.0
    w = np.abs(rng.randn(256, 128).astype(np.float32)) * 100.0
    n2, w2 = jax.jit(unpack16_numw)(jax.jit(pack16_numw)(
        jnp.asarray(x), jnp.asarray(w)))
    assert np.array_equal(np.asarray(n2),
                          x.astype(jnp.bfloat16).astype(np.float32))
    assert np.array_equal(np.asarray(w2),
                          w.astype(jnp.bfloat16).astype(np.float32))


@pytest.mark.parametrize("shape", [(24, 20, 160), (16, 17, 300),
                                   (8, 12, 96), (6, 8, 40),
                                   (6, 8, 32), (5, 6, 12)])
def test_build_shadow_pallas_matches_xla(shape):
    """Slot-geo state with random mass in ALL components (as after many
    scatters) -> both shadow builders bit-equal. The (…, 40) shape has
    odd G (2*GK > G) to cover the pad-group path."""
    L = rowvol.RowLayout.for_shape(shape)
    rng = np.random.RandomState(1)
    geo = rng.randn(L.geo_rows, 128).astype(np.float32) * 0.3
    # restrict to REACHABLE states: the scatter masks zero every corner
    # component that points at an out-of-bounds voxel, and never touches
    # the pad rows -- random mass there would differ only in dead lanes
    # the two builders are free to disagree on
    g5 = geo.reshape(L.X, L.SY, L.G, 8, 16)
    g5[:, 0] = 0.0                       # pad row y = -1
    g5[:, L.Y + 1:] = 0.0            # pad row y = Y + align rows
    for c in (2, 3, 6, 7):               # B comps of y_lo = Y-1
        g5[:, L.Y, :, c] = 0.0
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g5[:, :, gz, c, sz] = 0.0        # z+1 comps of z_lo = Z-1
    g5[:, :, gz, :, sz + 1:] = 0.0              # slots beyond Z-1
    g5[:, :, gz + 1:] = 0.0
    geo = jnp.asarray(g5.reshape(L.geo_rows, 128))
    want = jax.jit(rowvol.build_shadow, static_argnums=(1, 2))(
        geo, L, "xla")
    got = build_shadow_pallas(geo, L, interpret=True)
    assert got.shape == want.shape
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape", [(24, 20, 160), (6, 8, 40),
                                   (5, 6, 12)])
def test_reconcile_slot_pallas_matches_xla(shape):
    from segfusion_tpu.ops.pallas.shadow_build import reconcile_slot_pallas
    from segfusion_tpu.ops.rowvol import _reconcile_slot
    L = rowvol.RowLayout.for_shape(shape)
    rng = np.random.RandomState(2)
    geo = jnp.asarray(rng.randn(L.geo_rows, 128).astype(np.float32))
    want_n, want_w = jax.jit(_reconcile_slot, static_argnums=1)(geo, L)
    got_n, got_w = reconcile_slot_pallas(geo, L, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(want_w))


@pytest.mark.parametrize("shape,max_ty", [((24, 20, 160), 448),
                                          ((16, 17, 300), 448),
                                          ((6, 8, 40), 4),
                                          ((6, 8, 32), 448)])
def test_reconcile_key_pallas_matches_xla(shape, max_ty):
    """Bit-equal to the XLA key reconcile on fully random i32 slot
    states; max_ty=4 forces NJ > 1 to cover the halo-DMA branch."""
    from segfusion_tpu.ops.pallas.shadow_build import reconcile_key_pallas
    from segfusion_tpu.ops.rowvol import _reconcile_key
    L = rowvol.RowLayout.for_shape(shape)
    rng = np.random.RandomState(3)
    key = jnp.asarray(rng.randint(0, 2**31 - 1, (L.key_rows, 128),
                                  dtype=np.int32))
    want = jax.jit(_reconcile_key, static_argnums=1)(key, L)
    got = reconcile_key_pallas(key, L, interpret=True, max_ty=max_ty)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_reconcile_key_pallas_vmap_batches():
    from segfusion_tpu.ops.pallas import shadow_build as sb
    from segfusion_tpu.ops.rowvol import _reconcile_key
    L = rowvol.RowLayout.for_shape((6, 8, 40))
    rng = np.random.RandomState(4)
    keys = jnp.asarray(rng.randint(0, 2**31 - 1, (3, L.key_rows, 128),
                                   dtype=np.int32))
    # interpret-mode batched call via the custom_vmap rule's fold
    got = sb.reconcile_key_pallas(
        keys.reshape(3 * L.key_rows, 128),
        L._replace(X=3 * L.X), interpret=True).reshape(3, L.X, L.Y, L.Z)
    want = jax.vmap(lambda k: _reconcile_key(k, L))(keys)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# -- custom_vmap rules (round-3 regression: rules ignored in_batched) ---------
#
# Under vmap(fuse_sequence) the initial shadow/dirty carry is created
# INSIDE the vmapped function from constants, so the dirty rule sees
# geo batched but prev_shadow/dirty UNBATCHED -- exactly the multi512
# IndexError of BENCH_r03. These tests drive every rule through jax.vmap
# with each batched/unbatched operand combination, in interpret mode so
# they run (numerically, not just trace) on CPU.

def _reachable_geo(L, rng, batch=None):
    shape = (L.geo_rows, 128) if batch is None else (batch, L.geo_rows, 128)
    geo = rng.randn(*shape).astype(np.float32) * 0.3
    g5 = geo.reshape(shape[:-2] + (L.X, L.SY, L.G, 8, 16))
    g5[..., 0, :, :, :] = 0.0
    g5[..., L.Y + 1, :, :, :] = 0.0
    for c in (2, 3, 6, 7):
        g5[..., L.Y, :, c, :] = 0.0
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g5[..., gz, c, sz] = 0.0
    g5[..., gz, :, sz + 1:] = 0.0
    g5[..., gz + 1:, :, :] = 0.0
    return jnp.asarray(g5.reshape(shape))


class TestVmapRules:
    L = rowvol.RowLayout.for_shape((6, 8, 40))
    S = 3

    def test_shadow_dirty_unbatched_carry(self):
        """geo batched, prev_shadow/dirty unbatched (the multi512 case)."""
        from segfusion_tpu.ops.pallas import shadow_build as sb
        L, S = self.L, self.S
        rng = np.random.RandomState(11)
        geo = _reachable_geo(L, rng, batch=S)
        _, NJ = rowvol.shadow_tiling(L)
        nt = L.X * NJ
        prev = jnp.zeros((L.shadow_rows, 128), jnp.uint32)
        dirty = jnp.concatenate([jnp.ones((nt,), jnp.int32),
                                 jnp.zeros((1,), jnp.int32)])
        got = jax.vmap(
            lambda g: sb.build_shadow_dirty_pallas_v(
                g, prev, dirty, L, interpret=True))(geo)
        want = jax.vmap(
            lambda g: rowvol.build_shadow_dirty(g, prev, dirty, L,
                                                impl="xla"))(geo)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_shadow_dirty_all_batched(self):
        from segfusion_tpu.ops.pallas import shadow_build as sb
        L, S = self.L, self.S
        rng = np.random.RandomState(12)
        geo = _reachable_geo(L, rng, batch=S)
        _, NJ = rowvol.shadow_tiling(L)
        nt = L.X * NJ
        prev = jnp.asarray(
            rng.randint(0, 2**32, (S, L.shadow_rows, 128),
                        dtype=np.uint32))
        dirty = np.zeros((S, nt + 1), np.int32)
        dirty[:, ::2] = 1                     # mixed dirty/clean tiles
        dirty = jnp.asarray(dirty)
        got = jax.vmap(
            lambda g, p, d: sb.build_shadow_dirty_pallas_v(
                g, p, d, L, interpret=True))(geo, prev, dirty)
        want = jax.vmap(
            lambda g, p, d: rowvol.build_shadow_dirty(
                g, p, d, L, impl="xla"))(geo, prev, dirty)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_shadow_dirty_inside_scan_carry_fixpoint(self):
        """The real call shape: a lax.scan whose carry starts as
        unbatched constants under vmap (first fixpoint pass hits the
        rule with 1-D dirty -- the round-3 trace-time crash)."""
        from segfusion_tpu.ops.pallas import shadow_build as sb
        L, S = self.L, self.S
        rng = np.random.RandomState(13)
        geo = _reachable_geo(L, rng, batch=S)
        _, NJ = rowvol.shadow_tiling(L)
        nt = L.X * NJ

        def seq(g):
            shadow0 = jnp.zeros((L.shadow_rows, 128), jnp.uint32)
            dirty0 = jnp.concatenate([jnp.ones((nt,), jnp.int32),
                                      jnp.zeros((1,), jnp.int32)])

            def body(carry, _):
                sh, d = carry
                sh = sb.build_shadow_dirty_pallas_v(g, sh, d, L,
                                                    interpret=True)
                return (sh, jnp.zeros_like(d)), jnp.sum(sh >> 16)

            (sh, _), sums = jax.lax.scan(body, (shadow0, dirty0),
                                         None, length=2)
            return sh, sums

        got_sh, got_sums = jax.vmap(seq)(geo)
        want = jax.vmap(
            lambda g: rowvol.build_shadow(g, L, impl="xla"))(geo)
        np.testing.assert_array_equal(np.asarray(got_sh), np.asarray(want))

    def test_shadow_full_rule(self):
        from segfusion_tpu.ops.pallas import shadow_build as sb
        L, S = self.L, self.S
        rng = np.random.RandomState(14)
        geo = _reachable_geo(L, rng, batch=S)
        got = jax.vmap(
            lambda g: sb.build_shadow_pallas_v(g, L, interpret=True))(geo)
        want = jax.vmap(
            lambda g: rowvol.build_shadow(g, L, impl="xla"))(geo)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_reconcile_rules_batched(self):
        from segfusion_tpu.ops.pallas import shadow_build as sb
        from segfusion_tpu.ops.rowvol import (_reconcile_key,
                                              _reconcile_slot)
        L, S = self.L, self.S
        rng = np.random.RandomState(15)
        geo = jnp.asarray(
            rng.randn(S, L.geo_rows, 128).astype(np.float32))
        key = jnp.asarray(rng.randint(0, 2**31 - 1,
                                      (S, L.key_rows, 128),
                                      dtype=np.int32))
        gn, gw = jax.vmap(
            lambda g: sb.reconcile_slot_pallas_v(g, L,
                                                 interpret=True))(geo)
        wn, ww = jax.vmap(lambda g: _reconcile_slot(g, L))(geo)
        np.testing.assert_array_equal(np.asarray(gn), np.asarray(wn))
        np.testing.assert_array_equal(np.asarray(gw), np.asarray(ww))
        gk = jax.vmap(
            lambda k: sb.reconcile_key_pallas_v(k, L,
                                                interpret=True))(key)
        wk = jax.vmap(lambda k: _reconcile_key(k, L))(key)
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
