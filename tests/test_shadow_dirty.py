"""Dirty-tile shadow rebuild: mask conservativeness + kernel equivalence.

The dirty path must satisfy: (a) dirty_tile_mask covers every geo row a
frame's integrate_rows touches (bit-level conservativeness -- zero-weight
scatters still target rows), (b) build_shadow_dirty with a conservative
mask equals a full rebuild, for both the XLA path and the Pallas kernel
(interpret mode), (c) clean tiles keep prev_shadow bytes untouched."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segfusion_tpu.ops import geometry, rowvol
from segfusion_tpu.ops.pallas.shadow_build import (
    build_shadow_dirty_pallas, build_shadow_pallas)


def _layout(shape):
    return rowvol.RowLayout.for_shape(shape)


def _random_geo(rng, L):
    """Random slot-geo restricted to REACHABLE states (writer invariant:
    pad rows and out-of-bounds corner components zero -- see
    tests/test_shadow_pallas.py; the two builders may disagree in dead
    lanes otherwise)."""
    geo = rng.randn(L.geo_rows, 128).astype(np.float32) * 0.3
    g5 = geo.reshape(L.X, L.SY, L.G, 8, 16)
    g5[:, 0] = 0.0                       # pad row y = -1
    g5[:, L.Y + 1:] = 0.0            # pad row y = Y + align rows
    for c in (2, 3, 6, 7):               # B comps of y_lo = Y-1
        g5[:, L.Y, :, c] = 0.0
    gz, sz = (L.Z - 1) // 16, (L.Z - 1) % 16
    for c in (1, 3, 5, 7):
        g5[:, :, gz, c, sz] = 0.0        # z+1 comps of z_lo = Z-1
    g5[:, :, gz, :, sz + 1:] = 0.0       # slots beyond Z-1
    g5[:, :, gz + 1:] = 0.0
    return jnp.asarray(g5.reshape(L.geo_rows, 128))


def _frame_points(rng, L, n=64, p=9):
    """Sample points like a frame: clustered rays around a random eye."""
    eye = rng.uniform(0, [L.X, L.Y, L.Z]).astype(np.float32)
    pts = eye[None, None] + rng.randn(n, p, 3).astype(np.float32) * 6.0
    return jnp.asarray(pts)


@pytest.mark.parametrize("shape", [(24, 20, 160), (16, 17, 96)])
def test_mask_covers_integrated_rows(shape):
    L = _layout(shape)
    TY, NJ = rowvol.shadow_tiling(L)
    rng = np.random.RandomState(0)
    for trial in range(4):
        pv = _frame_points(rng, L)
        cr = rowvol.corner_rows(pv, L)
        mask = np.asarray(rowvol.dirty_tile_mask(pv, L))
        assert mask.shape == (L.X * NJ + 1,)
        assert mask[-1] == 0
        grid = mask[:-1].reshape(L.X, NJ)
        rows = np.asarray(cr.sg_rows).reshape(-1)
        xs = rows // (L.SY * L.G)
        ypad = (rows % (L.SY * L.G)) // L.G
        yphys = ypad - 1
        for j in range(NJ):
            sel = (yphys >= j * TY - 1) & (yphys <= j * TY + TY)
            touched_x = np.unique(xs[sel])
            assert grid[touched_x, j].all(), \
                f"trial {trial}: tile column {j} misses touched slabs"


@pytest.mark.parametrize("shape", [(24, 20, 160), (16, 17, 300),
                                   (6, 8, 40)])
def test_dirty_build_equals_full_xla(shape):
    L = _layout(shape)
    TY, NJ = rowvol.shadow_tiling(L)
    rng = np.random.RandomState(1)
    geo0 = _random_geo(rng, L)
    full0 = rowvol.build_shadow(geo0, L, impl="xla")

    # perturb rows inside a random tile subset; mark exactly those dirty
    dirty = (rng.rand(L.X, NJ) < 0.4).astype(np.int32)
    g = np.asarray(geo0).reshape(L.X, L.SY, L.G, 128).copy()
    for x in range(L.X):
        for j in range(NJ):
            if dirty[x, j]:
                # touch a row strictly interior to the tile (not the halo)
                g[x, 1 + j * TY, :, :] += 1.0
    geo1 = jnp.asarray(g.reshape(L.geo_rows, 128))
    dirty_flat = jnp.concatenate([jnp.asarray(dirty.reshape(-1)),
                                  jnp.zeros((1,), jnp.int32)])

    got = rowvol.build_shadow_dirty(geo1, full0, dirty_flat, L, impl="xla")
    # dirty tiles must equal the full rebuild of geo1 there
    full1 = rowvol.build_shadow(geo1, L, impl="xla")
    gott = np.asarray(got).reshape(L.X, NJ, TY * L.GK, 128)
    f1 = np.asarray(full1).reshape(L.X, NJ, TY * L.GK, 128)
    f0 = np.asarray(full0).reshape(L.X, NJ, TY * L.GK, 128)
    for x in range(L.X):
        for j in range(NJ):
            want = f1[x, j] if dirty[x, j] else f0[x, j]
            assert np.array_equal(gott[x, j], want)


@pytest.mark.parametrize("shape", [(8, 12, 96), (6, 8, 40)])
def test_dirty_pallas_matches_xla_interpret(shape):
    L = _layout(shape)
    TY, NJ = rowvol.shadow_tiling(L)
    rng = np.random.RandomState(2)
    geo = _random_geo(rng, L)
    prev = jnp.asarray(
        rng.randint(0, 2 ** 31, (L.shadow_rows, 128)).astype(np.uint32))
    for frac in (0.0, 0.35, 1.0):
        dirty = (rng.rand(L.X * NJ) < frac).astype(np.int32)
        dirty_flat = jnp.concatenate([jnp.asarray(dirty),
                                      jnp.zeros((1,), jnp.int32)])
        got = build_shadow_dirty_pallas(geo, prev, dirty_flat, L,
                                        interpret=True)
        want = rowvol.build_shadow_dirty(geo, prev, dirty_flat, L,
                                         impl="xla")
        assert np.array_equal(np.asarray(got), np.asarray(want)), \
            f"frac={frac}"


def test_dirty_all_ones_equals_plain_kernel_interpret():
    shape = (8, 12, 96)
    L = _layout(shape)
    TY, NJ = rowvol.shadow_tiling(L)
    rng = np.random.RandomState(3)
    geo = _random_geo(rng, L)
    ones = jnp.concatenate([jnp.ones((L.X * NJ,), jnp.int32),
                            jnp.zeros((1,), jnp.int32)])
    prev = jnp.zeros((L.shadow_rows, 128), jnp.uint32)
    got = build_shadow_dirty_pallas(geo, prev, ones, L, interpret=True)
    want = build_shadow_pallas(geo, L, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fuse_sequence_dirty_carry_matches_off():
    """Pipeline-level equivalence: fuse_sequence with the dirty-shadow
    carry (default) must be BIT-identical to SETTINGS.dirty_shadow: off
    (full rebuild per frame) -- the conservative mask guarantees it."""
    import copy

    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
    from segfusion_tpu.core.database import Database
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.data.synthetic import Synthetic

    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx = cfg.DATA.resy = 48
    cfg.DATA.input = "tof_depth"
    cfg.DATA.init_value = 0.24
    cfg.DATA.semantic_strategy = "gt"
    cfg.DATA.semantics = "class8"
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_frames = 6
    cfg.DATA.voxel_resolution = 0.1
    cfg.DATA.noise_sigma = 0.004
    cfg.DATA.n_classes = 8
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = True
    cfg.SEMANTIC_2D_MODEL.n_classes = 8

    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe_on = Pipeline(cfg)
    assert pipe_on.dirty_shadow
    cfg_off = copy.deepcopy(cfg)
    cfg_off.SETTINGS.dirty_shadow = "off"
    pipe_off = Pipeline(cfg_off)
    assert not pipe_off.dirty_shadow

    params, stats = pipe_on.init_fusion_params(jax.random.PRNGKey(0),
                                               48, 48)
    frames = [pipe_on._frame_from_batch(
        {k: (np.asarray(v)[None] if isinstance(v, np.ndarray) else v)
         for k, v in data[i].items()} | {"frame_id": [data[i]["frame_id"]]},
        cfg.DATA.input) for i in range(4)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)
    sid = data.scenes[0]

    db.reset()
    va = pipe_on.fuse_sequence((params, stats), db.volumes[sid], stacked,
                               None)
    db.reset()
    vb = pipe_off.fuse_sequence((params, stats), db.volumes[sid], stacked,
                                None)
    assert np.array_equal(np.asarray(va.num), np.asarray(vb.num))
    assert np.array_equal(np.asarray(va.weights), np.asarray(vb.weights))
    assert np.array_equal(np.asarray(va.semkey), np.asarray(vb.semkey))
