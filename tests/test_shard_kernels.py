"""shard_map'd Pallas kernels over an x-sharded volume: bit-exact vs the
unsharded XLA reference implementations on the 8-device CPU mesh
(interpret mode; the kernels are x-local so each shard computes its own
slab with no collectives -- parallel/shard_kernels.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segfusion_tpu.ops import rowvol
from segfusion_tpu.parallel import shard_kernels as sk


def _mesh(n=4):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), ("x",))


def _reachable_geo(L, rng):
    geo = rng.randn(L.geo_rows, 128).astype(np.float32) * 0.3
    g5 = geo.reshape(L.X, L.SY, L.G, 8, 16)
    g5[:, 0] = 0.0
    g5[:, L.Y + 1:] = 0.0        # pad row y = Y + align rows
    for c in (2, 3, 6, 7):
        g5[:, L.Y, :, c] = 0.0
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g5[:, :, gz, c, sz] = 0.0
    g5[:, :, gz, :, sz + 1:] = 0.0
    g5[:, :, gz + 1:] = 0.0
    return jnp.asarray(g5.reshape(L.geo_rows, 128))


def test_sharded_build_shadow_matches_unsharded():
    mesh = _mesh(4)
    L = rowvol.RowLayout.for_shape((8, 8, 40))
    geo = _reachable_geo(L, np.random.RandomState(0))
    geo_sh = jax.device_put(geo, NamedSharding(mesh, P("x", None)))
    got = jax.jit(lambda g: sk.sharded_build_shadow(
        g, L, mesh, interpret=True))(geo_sh)
    want = rowvol.build_shadow(geo, L, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_build_shadow_dirty_matches_unsharded():
    mesh = _mesh(4)
    L = rowvol.RowLayout.for_shape((8, 8, 40))
    rng = np.random.RandomState(1)
    geo = _reachable_geo(L, rng)
    _, NJ = rowvol.shadow_tiling(L)
    nt = L.X * NJ
    prev = jnp.asarray(rng.randint(0, 2**32, (L.shadow_rows, 128),
                                   dtype=np.uint32))
    dirty = np.zeros((nt + 1,), np.int32)
    dirty[:nt:2] = 1                       # mixed dirty/clean tiles
    dirty = jnp.asarray(dirty)
    sh = NamedSharding(mesh, P("x", None))
    got = jax.jit(lambda g, p, d: sk.sharded_build_shadow_dirty(
        g, p, d, L, mesh, interpret=True))(
            jax.device_put(geo, sh), jax.device_put(prev, sh), dirty)
    want = rowvol.build_shadow_dirty(geo, prev, dirty, L, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_reconciles_match_unsharded():
    mesh = _mesh(4)
    L = rowvol.RowLayout.for_shape((8, 8, 40))
    rng = np.random.RandomState(2)
    geo = jnp.asarray(rng.randn(L.geo_rows, 128).astype(np.float32))
    key = jnp.asarray(rng.randint(0, 2**31 - 1, (L.key_rows, 128),
                                  dtype=np.int32))
    sh = NamedSharding(mesh, P("x", None))
    gn, gw = jax.jit(lambda g: sk.sharded_reconcile_slot(
        g, L, mesh, interpret=True))(jax.device_put(geo, sh))
    wn, ww = rowvol._reconcile_slot(geo, L)
    np.testing.assert_array_equal(np.asarray(gn), np.asarray(wn))
    np.testing.assert_array_equal(np.asarray(gw), np.asarray(ww))
    gk = jax.jit(lambda k: sk.sharded_reconcile_key(
        k, L, mesh, interpret=True))(jax.device_put(key, sh))
    wk = rowvol._reconcile_key(key, L)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))


def test_x_divisibility_guard():
    mesh = _mesh(4)
    L = rowvol.RowLayout.for_shape((6, 8, 40))   # 6 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sk.check_x_divisible(L, mesh, "x")
