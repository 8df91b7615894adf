"""TPU-only tier: the COMPILED (non-interpret) Pallas kernels and the
TPU row path, bit-exact against their XLA reference implementations on
the real chip. Run with

    SEGFUSION_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_compiled.py

(on the CPU mesh every test here auto-skips). This tier exists because
TPU-only code paths once shipped untested: the round-3 dirty-shadow
custom_vmap regression was invisible to the CPU suite (VERDICT r3 weak
#1b/#5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import rowvol

pytestmark = pytest.mark.tpu

SHAPE = (16, 16, 72)


def _tpu_or_skip():
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (SEGFUSION_TPU_TESTS=1)")


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


def test_compiled_shadow_build_bitexact():
    _tpu_or_skip()
    L = rowvol.RowLayout.for_shape(SHAPE)
    geo = _reachable_geo(L, np.random.RandomState(0))
    got = rowvol.build_shadow(geo, L, impl="pallas")
    want = rowvol.build_shadow(geo, L, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compiled_dirty_shadow_bitexact_and_vmapped():
    _tpu_or_skip()
    L = rowvol.RowLayout.for_shape(SHAPE)
    rng = np.random.RandomState(1)
    geo = _reachable_geo(L, rng)
    _, NJ = rowvol.shadow_tiling(L)
    nt = L.X * NJ
    prev = jnp.asarray(rng.randint(0, 2**32, (L.shadow_rows, 128),
                                   dtype=np.uint32))
    dirty = np.zeros((nt + 1,), np.int32)
    dirty[:nt:2] = 1
    dirty = jnp.asarray(dirty)
    got = rowvol.build_shadow_dirty(geo, prev, dirty, L, impl="pallas")
    want = rowvol.build_shadow_dirty(geo, prev, dirty, L, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # the multi512 shape: vmapped over geo with UNBATCHED carry
    geos = jnp.stack([_reachable_geo(L, rng) for _ in range(2)])
    prev0 = jnp.zeros((L.shadow_rows, 128), jnp.uint32)
    all_dirty = jnp.concatenate([jnp.ones((nt,), jnp.int32),
                                 jnp.zeros((1,), jnp.int32)])
    gotv = jax.vmap(lambda g: rowvol.build_shadow_dirty(
        g, prev0, all_dirty, L, impl="pallas"))(geos)
    wantv = jax.vmap(lambda g: rowvol.build_shadow(g, L,
                                                   impl="xla"))(geos)
    np.testing.assert_array_equal(np.asarray(gotv), np.asarray(wantv))


def test_compiled_reconciles_bitexact():
    _tpu_or_skip()
    L = rowvol.RowLayout.for_shape(SHAPE)
    rng = np.random.RandomState(2)
    geo = jnp.asarray(rng.randn(L.geo_rows, 128).astype(np.float32))
    key = jnp.asarray(rng.randint(0, 2**31 - 1, (L.key_rows, 128),
                                  dtype=np.int32))
    gn, gw, gk = rowvol.volume_from_rows(geo, key, L, impl="pallas")
    wn, ww = rowvol._reconcile_slot(geo, L)
    wk = rowvol._reconcile_key(key, L)
    np.testing.assert_array_equal(np.asarray(gn), np.asarray(wn))
    np.testing.assert_array_equal(np.asarray(gw), np.asarray(ww))
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))


def test_tpu_fuse_sequence_smoke():
    """Tiny end-to-end row-path sequence (dirty carry on, Pallas impl)
    runs compiled on the chip and integrates mass."""
    _tpu_or_skip()
    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.core.volume import init_scene_volume

    H = W = 24
    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = W
    cfg.DATA.resy = H
    cfg.DATA.init_value = 0.1
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = False
    pipe = Pipeline(cfg)
    assert pipe.rows_impl == "pallas"
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)
    vol = init_scene_volume((32, 32, 32),
                            np.array([-0.8, -0.8, -0.8], np.float32),
                            0.05, 0.1)
    frame = {
        "depth": jnp.full((H, W), 0.8, jnp.float32),
        "extrinsics": jnp.eye(4, dtype=jnp.float32),
        "intrinsics": jnp.asarray([[12.0, 0, W / 2], [0, 12.0, H / 2],
                                   [0, 0, 1]], jnp.float32),
        "mask": jnp.ones((H, W), bool),
    }
    frames = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (3,) + x.shape), frame)
    out = pipe.fuse_sequence((params, stats), vol, frames, None)
    assert float(jnp.sum(out.weights)) > 0.0
    assert np.isfinite(np.asarray(out.num)).all()
