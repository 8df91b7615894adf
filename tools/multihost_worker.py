"""Multi-host (DCN) demo worker: one PROCESS of a 2-process run.

Executes the design in parallel/multihost.py end-to-end on real separate
processes (CPU backend, gloo collectives -- the same jax.distributed /
GSPMD machinery a TPU pod uses over DCN):

  1. jax.distributed init through multihost.initialize (the flag-gated
     production entry point);
  2. scene-level DATA sharding: this process takes its
     local_scene_shard of the global scene list and runs the ordinary
     single-host fusion pipeline on its own scenes -- no voxel data
     crosses DCN;
  3. cross-process AGGREGATE reduction: the per-scene eval sums are
     combined with one global-mesh reduction (the same collective a
     multi-host gradient all-reduce uses).

Launched (twice) by tests/test_multihost_2proc.py; also runnable by
hand:

  XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
  python tools/multihost_worker.py <pid> <nprocs> <port>

Reference parity note: the reference is strictly single-process
(SURVEY.md §2.6); this demonstrates the rebuild's growth path BEYOND the
reference, so the recipe -- not reference behaviour -- is what is pinned.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    pid, nprocs, port = (int(sys.argv[1]), int(sys.argv[2]),
                         int(sys.argv[3]))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segfusion_tpu.parallel import multihost

    ok = multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=pid)
    assert ok, "distributed init refused"
    assert jax.process_count() == nprocs
    assert multihost.is_multihost()

    # -- scene-level DCN sharding: disjoint scene subsets per process
    scenes = [f"scene_{i}" for i in range(5)]
    mine = multihost.local_scene_shard(scenes)

    # -- per-scene local fusion (ordinary single-host pipeline on the
    #    process's own devices; nothing here communicates)
    from segfusion_tpu.config import Config, _DEFAULTS, _merge_defaults
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.core.volume import init_scene_volume

    H = W = 16
    cfg = _merge_defaults(Config({}), _DEFAULTS)
    cfg.DATA.resx, cfg.DATA.resy = W, H
    cfg.DATA.init_value = 0.1
    cfg.FUSION_MODEL.name = "v3"
    cfg.FUSION_MODEL.n_points = 5
    cfg.FUSION_MODEL.n_tail_points = 4
    cfg.FUSION_MODEL.growth_factor = 2
    cfg.FUSION_MODEL.use_semantics = False
    pipe = Pipeline(cfg)
    params, stats = pipe.init_fusion_params(jax.random.PRNGKey(0), H, W)

    f = 2.0 * W
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    local_sum = 0.0
    for si, scene in enumerate(mine):
        rng = np.random.RandomState(100 + si)
        depth = 1.2 + 0.1 * rng.rand(2, H, W).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[:, 2, 3] = -1.5
        frames = {
            "depth": jnp.asarray(depth),
            "extrinsics": jnp.asarray(poses),
            "intrinsics": jnp.broadcast_to(jnp.asarray(intr), (2, 3, 3)),
            "mask": jnp.asarray(depth > 0),
        }
        vol = init_scene_volume(
            (16, 16, 16), np.array([-0.8, -0.8, -0.8], np.float32),
            0.1, 0.1)
        out = pipe.fuse_sequence((params, stats), vol, frames, None)
        local_sum += float(jnp.sum(out.weights))

    # -- cross-process aggregate over the GLOBAL mesh: every process
    #    contributes its local scene-eval sum; one reduction yields the
    #    identical global total everywhere (same path a multi-host
    #    gradient all-reduce takes)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    nl = jax.local_device_count()
    local = np.full((nl,), local_sum / nl, np.float32)
    g = jax.make_array_from_process_local_data(
        sh, local, (jax.device_count(),))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
    print(json.dumps({
        "tag": "MULTIHOST_OK",
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "scenes": mine,
        "local_sum": round(local_sum, 3),
        "global_sum": round(float(total), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
