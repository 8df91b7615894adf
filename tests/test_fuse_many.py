"""fuse_many (chunked scan streaming) must equal per-frame fuse exactly,
including tail padding with no-op frames and scene switching."""

import numpy as np
import jax

from segfusion_tpu.core.database import Database
from segfusion_tpu.core.pipeline import Pipeline
from segfusion_tpu.data.synthetic import Synthetic
from tests.test_pipeline import small_config, _batch


def test_fuse_many_matches_per_frame():
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_scenes = 2
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)

    # stream crossing a scene boundary with a non-multiple-of-chunk tail
    idxs = list(range(5)) + list(range(cfg.DATA.n_frames,
                                      cfg.DATA.n_frames + 3))
    batches = [_batch(data, i) for i in idxs]

    db.reset()
    for b in batches:
        pipe.fuse(b, db, params, stats)
    ref = {s: db.volumes[s] for s in data.scenes}

    db.reset()
    pipe.fuse_many(batches, db, params, stats, chunk=4)
    for s in data.scenes:
        np.testing.assert_allclose(np.asarray(db.volumes[s].weights),
                                   np.asarray(ref[s].weights), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.volumes[s].num),
                                   np.asarray(ref[s].num), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(db.volumes[s].semkey),
                                      np.asarray(ref[s].semkey))
        assert db.state[s]


def test_fuse_many_interleaved_scenes_keeps_chunking():
    """Per-frame interleaving of two scenes (ScanNet max_depth_diversity /
    Replica hybrid orderings) must neither change results nor collapse
    chunks to length 1: dispatches = ceil(frames_per_scene / chunk) per
    scene, not one per frame."""
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_scenes = 2
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)

    nf = cfg.DATA.n_frames
    # interleave: s0f0, s1f0, s0f1, s1f1, ... (6 frames per scene)
    idxs = []
    for i in range(6):
        idxs += [i, nf + i]
    batches = [_batch(data, i) for i in idxs]

    db.reset()
    for b in batches:
        pipe.fuse(b, db, params, stats)
    ref = {s: db.volumes[s] for s in data.scenes}

    db.reset()
    calls = []
    orig = pipe.fuse_sequence_rows   # row path carries slot state across
                                     # chunks; chunk dispatches land here

    def counting_fuse_sequence_rows(layout, ps, rv, stacked, seg):
        calls.append(int(stacked["depth"].shape[0]))
        return orig(layout, ps, rv, stacked, seg)

    pipe.fuse_sequence_rows = counting_fuse_sequence_rows
    try:
        pipe.fuse_many(batches, db, params, stats, chunk=4)
    finally:
        pipe.fuse_sequence_rows = orig

    # 6 frames/scene at chunk 4 -> 2 dispatches per scene, all of size 4
    assert len(calls) == 4, f"expected 4 chunk dispatches, got {calls}"
    assert all(c == 4 for c in calls)

    for s in data.scenes:
        np.testing.assert_allclose(np.asarray(db.volumes[s].weights),
                                   np.asarray(ref[s].weights), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.volumes[s].num),
                                   np.asarray(ref[s].num), atol=1e-3)


def test_fuse_many_through_prefetch_loader_preserves_order():
    """The threaded PrefetchLoader (decode workers + bounded queue) must
    deliver frames in index order so fuse_many's streamed result equals
    the per-frame reference -- the host-IO-overlap path end to end
    (SURVEY.md §2.6 DataLoader equivalent)."""
    from segfusion_tpu.data.prefetch import PrefetchLoader, collate

    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    data = Synthetic(cfg.DATA)
    db = Database(data, cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)

    class SlowData:
        """Simulates per-frame decode latency in the worker thread."""
        def __len__(self):
            return 6

        def __getitem__(self, i):
            import time
            time.sleep(0.02)
            return data[i]

    db.reset()
    for i in range(6):
        pipe.fuse(_batch(data, i), db, params, stats)
    s = data.scenes[0]
    ref = db.volumes[s]

    db.reset()
    loader = PrefetchLoader(SlowData(), batch_size=1, shuffle=False,
                            num_workers=2, prefetch=3)
    pipe.fuse_many(loader, db, params, stats, chunk=4)
    np.testing.assert_allclose(np.asarray(db.volumes[s].weights),
                               np.asarray(ref.weights), atol=1e-4)
    np.testing.assert_allclose(np.asarray(db.volumes[s].num),
                               np.asarray(ref.num), atol=1e-3)


def test_fuse_many_dirty_carry_bit_identical():
    """The dirty-shadow carry is an optimization, not an approximation:
    fuse_many with SETTINGS.dirty_shadow on vs off must produce
    BIT-IDENTICAL volumes (the tile mask is conservative, so rebuilt
    shadows equal full rebuilds -- tests/test_shadow_dirty.py proves the
    kernel level; this pins the pipeline level)."""
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    data = Synthetic(cfg.DATA)
    params = stats = None

    def run(dirty):
        c = small_config(use_semantics=False, semantics="class8")
        c.DATA.semantic_grid = True
        c.SETTINGS.dirty_shadow = "on" if dirty else "off"
        db = Database(data, c.DATA)
        pipe = Pipeline(c)
        nonlocal params, stats
        if params is None:
            params, stats = pipe.init_fusion_params(
                jax.random.PRNGKey(0), 48, 48)
        assert pipe.dirty_shadow == dirty
        db.reset()
        batches = [_batch(data, i) for i in range(6)]
        pipe.fuse_many(batches, db, params, stats, chunk=4)
        s = data.scenes[0]
        return db.volumes[s]

    a, b = run(True), run(False)
    np.testing.assert_array_equal(np.asarray(a.num), np.asarray(b.num))
    np.testing.assert_array_equal(np.asarray(a.weights),
                                  np.asarray(b.weights))
    np.testing.assert_array_equal(np.asarray(a.semkey),
                                  np.asarray(b.semkey))


def test_fuse_many_scene_eviction_matches_unbounded():
    """The HBM-bounding LRU eviction (max_live_scenes=1) must round-trip
    slot state through canonical form without changing results: an
    interleaved 2-scene stream under cap 1 (evict/re-enter every switch)
    equals the same stream with both carries held live."""
    cfg = small_config(use_semantics=False, semantics="class8")
    cfg.DATA.semantic_grid = True
    cfg.DATA.n_scenes = 2
    data = Synthetic(cfg.DATA)
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), 48, 48)

    nf = cfg.DATA.n_frames
    idxs = []
    for i in range(6):
        idxs += [i, nf + i]
    batches = [_batch(data, i) for i in idxs]

    def run(cap):
        db = Database(data, cfg.DATA)
        db.reset()
        pipe.fuse_many(batches, db, params, stats, chunk=4,
                       max_live_scenes=cap)
        return {s: db.volumes[s] for s in data.scenes}

    bounded, unbounded = run(1), run(8)
    for s in data.scenes:
        # the mid-stream exit/enter reconcile re-associates the f32 slot
        # sums (same float-tolerance class as per-frame fuse, see
        # test_fuse_many_matches_per_frame); keys reconcile by max, which
        # is association-free -> exact
        np.testing.assert_allclose(np.asarray(bounded[s].num),
                                    np.asarray(unbounded[s].num),
                                    atol=1e-3)
        np.testing.assert_allclose(np.asarray(bounded[s].weights),
                                    np.asarray(unbounded[s].weights),
                                    atol=1e-4)
        np.testing.assert_array_equal(np.asarray(bounded[s].semkey),
                                      np.asarray(unbounded[s].semkey))
