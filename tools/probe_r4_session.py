"""Round-4 TPU measurement session: run the staged round-3 decision
probes in ONE python process (one axon grant claim, CLAUDE.md), each
isolated so a failing probe doesn't sink the rest.

Usage: PYTHONPATH=/root/repo python tools/probe_r4_session.py [groupA|groupB|all]

groupA (the staged flag-default decisions, VERDICT r3 next-step #2):
  dirty_shadow TY in {28, 56, 112}, extract_variants, update_build,
  merge_dup
groupB (structural-lever + net data, VERDICT #3/#4):
  scatter_dup, fastnet, pallas_caps3
"""

import gc
import sys
import time
import traceback


def _free_device_memory():
    """Drop every live device buffer + compile cache between probes: a
    probe's locals (and any exception traceback frames) otherwise keep
    multi-GB 448^3 states alive into the next probe's allocations
    (group-A run 1: update_build/merge_dup died on RESOURCE_EXHAUSTED
    before doing anything)."""
    import jax
    sys.last_traceback = None
    sys.last_value = None
    gc.collect()
    for a in jax.live_arrays():
        a.delete()
    jax.clear_caches()
    gc.collect()


def run(name, fn):
    print(f"\n===== PROBE {name} =====", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"===== {name} done in {time.time() - t0:.0f}s =====",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"===== {name} FAILED after {time.time() - t0:.0f}s =====",
              flush=True)
    _free_device_memory()


def group_a():
    from tools import probe_dirty_shadow
    for ty in (112, 56, 28):
        run(f"dirty_shadow TY={ty}",
            lambda ty=ty: probe_dirty_shadow.main(max_ty=ty))
    from tools import probe_extract_variants
    run("extract_variants", probe_extract_variants.main)
    from tools import probe_update_build
    run("update_build", probe_update_build.main)
    from tools import probe_merge_dup
    run("merge_dup", probe_merge_dup.main)


def group_b():
    from tools import probe_update_build
    run("update_build", probe_update_build.main)
    from tools import probe_merge_dup
    run("merge_dup", probe_merge_dup.main)
    from tools import probe_scatter_dup
    run("scatter_dup", probe_scatter_dup.main)
    from tools import probe_pallas_caps3
    run("pallas_caps3", probe_pallas_caps3.main)
    from tools import probe_fastnet
    run("fastnet", probe_fastnet.main)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("groupA", "all"):
        group_a()
    if which in ("groupB", "all"):
        group_b()
