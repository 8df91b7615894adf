"""Multi-host (DCN) plumbing: flag-gated init + scene sharding helpers.

The design (parallel/multihost.py) is scene-level data sharding over DCN;
these tests pin the single-process behaviour (flag off -> no distributed
init, identity scene shard) that every existing path relies on."""

import jax

from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
from segfusion_tpu.parallel import multihost


def _cfg():
    return _merge_defaults(Config({}), _DEFAULTS)


def test_initialize_noop_without_flag():
    cfg = _cfg()
    assert multihost.initialize(cfg) is False
    assert multihost._initialized is False


def test_is_multihost_single_process():
    assert multihost.is_multihost() is False
    assert jax.process_count() == 1


def test_local_scene_shard_identity_single_process():
    scenes = [f"scene{i}" for i in range(7)]
    assert multihost.local_scene_shard(scenes) == scenes


def test_local_scene_shard_partition():
    # simulated 3-process split: disjoint, covering, deterministic
    scenes = [f"s{i}" for i in range(10)]
    shards = [[s for k, s in enumerate(scenes) if k % 3 == i]
              for i in range(3)]
    flat = [s for sh in shards for s in sh]
    assert sorted(flat) == sorted(scenes)
    assert len(set(flat)) == len(scenes)
