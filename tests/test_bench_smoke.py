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


def _run_watchdog_child(headline):
    code = (
        "import sys, time, bench\n"
        f"bench._HEADLINE_LINE = {headline!r}\n"
        "bench._arm_watchdog(0.2)\n"
        "time.sleep(30)\n"          # stand-in for an overrunning compile
        "sys.exit(9)\n"             # must never be reached
    )
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                "PALLAS_AXON_POOL_IPS": ""})
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=120)


def test_bench_watchdog_reemits_headline_and_exits_zero():
    """The budget watchdog is the rc=124 backstop (BENCH_r04.json lost
    the round-4 headline to the driver's external timeout): at the
    deadline it must print the cached headline as the final stdout line
    and exit 0, even while the main thread is stuck."""
    line = json.dumps({"metric": "joint fusion+semantics (test)",
                       "value": 1.0, "unit": "fps", "vs_baseline": 0.1})
    out = _run_watchdog_child(line)
    assert out.returncode == 0, (out.returncode, out.stderr[-2000:])
    assert out.stdout.strip().splitlines()[-1] == line


def test_bench_watchdog_without_headline_exits_nonzero():
    out = _run_watchdog_child(None)
    assert out.returncode == 3, (out.returncode, out.stderr[-2000:])
    assert out.stdout.strip() == ""
