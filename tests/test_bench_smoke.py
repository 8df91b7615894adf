"""The driver runs `python bench.py` at round end and records the output
as the round's BENCH artifact -- a crash there loses the round's perf
record. This smoke runs ALL modes at SEGFUSION_BENCH_TINY shapes on CPU
so every mode's wiring (RowStream carry, exits, scene-parallel vmap,
train scan, JSON emission) is exercised by the suite."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


@pytest.mark.slow
def test_bench_all_modes_tiny():
    env = dict(os.environ)
    env.update({"SEGFUSION_BENCH_TINY": "1", "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": "", "PALLAS_AXON_POOL_IPS": ""})
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    recs = [json.loads(l) for l in lines]
    for r in recs:
        # required driver-parse keys; modes may add disclosure extras
        # (approximations, exact_recurrence_fps, ...)
        assert {"metric", "value", "unit", "vs_baseline"} <= set(r)
        assert r["value"] > 0
    # all four modes must have been measured (the headline line is
    # re-emitted after each secondary so a mid-run kill still leaves the
    # headline as the final line -- hence > 4 lines total)
    metrics = {r["metric"] for r in recs}
    assert len(metrics) == 4, out.stdout
    # the driver's single-line parse reads the LAST stdout line -- it
    # must be the headline mode
    assert "joint fusion+semantics" in recs[-1]["metric"]
