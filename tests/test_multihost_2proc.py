"""REAL multi-process DCN execution (parallel/multihost.py design).

Launches tools/multihost_worker.py twice -- two OS processes, each with
4 virtual CPU devices, joined by jax.distributed over gloo (the CPU
stand-in for a TPU pod's DCN). Verifies:

  * jax.distributed comes up through multihost.initialize (the
    production flag-gated entry point);
  * the scene list shards DISJOINTLY and COVERINGLY across processes;
  * each process fuses its own scenes with the ordinary single-host
    pipeline;
  * a global-mesh reduction returns the identical cross-process total
    on both processes (the multi-host gradient/eval aggregate path).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_scene_sharded_fusion():
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": "",
        "PALLAS_AXON_POOL_IPS": "",
    })
    procs = [subprocess.Popen(
        [sys.executable, "tools/multihost_worker.py", str(i), "2",
         str(port)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    recs = []
    for out in outs:
        lines = [l for l in out.splitlines() if "MULTIHOST_OK" in l]
        assert lines, out
        recs.append(json.loads(lines[-1]))

    assert {r["process"] for r in recs} == {0, 1}
    for r in recs:
        assert r["processes"] == 2
        assert r["global_devices"] == 8
    # disjoint + covering scene shard
    s0, s1 = set(recs[0]["scenes"]), set(recs[1]["scenes"])
    assert not (s0 & s1)
    assert s0 | s1 == {f"scene_{i}" for i in range(5)}
    # the DCN aggregate: identical global total on both processes,
    # equal to the sum of the two local sums
    want = round(recs[0]["local_sum"] + recs[1]["local_sum"], 2)
    for r in recs:
        assert round(r["global_sum"], 2) == want
        assert r["global_sum"] > 0
