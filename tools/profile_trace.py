"""Capture a device trace of the composed headline step and aggregate
per-op time. Ablation probes (probe_full_step.py) attribute stage costs
by removal, which misses overlap/serialization effects; this reads the
real XLA op timeline of the bench program.

Run ON TPU:  python tools/profile_trace.py [--mode headline|speed]
Writes /tmp/segfusion_trace/ and prints an aggregated op-category table.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build(mode):
    import jax
    import jax.numpy as jnp
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene

    if mode == "headline":
        h = w = 256
        cfg = B.build_config(h, w)
        pipe, params_stats, seg_params = B.build_pipeline(cfg, h, w)
    else:
        h = w = 128
        cfg = B.build_config(h, w)
        cfg.DATA.semantics = None
        cfg.DATA.semantic_strategy = "gt"
        cfg.FUSION_MODEL.use_semantics = False
        from segfusion_tpu.core.pipeline import Pipeline
        pipe = Pipeline(cfg)
        params_stats = pipe.init_fusion_params(jax.random.PRNGKey(0), h, w)
        seg_params = None

    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, cfg.DATA.init_value)
    scene = SyntheticScene(seed=0, half=2.2)
    frames = B.render_frames(scene, h, w, 8)
    if mode == "speed":
        frames = {k: frames[k] for k in
                  ("depth", "extrinsics", "intrinsics", "mask")}
    return pipe, params_stats, seg_params, volume, frames


def run(mode, outdir):
    import jax
    import jax.numpy as jnp

    pipe, params_stats, seg_params, volume, frames = build(mode)
    sum_w = jax.jit(lambda v: jnp.sum(v.weights))
    print("compiling...", flush=True)
    volume = pipe.fuse_sequence(params_stats, volume, frames, seg_params)
    float(sum_w(volume))
    print("warm, tracing...", flush=True)

    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        volume = pipe.fuse_sequence(params_stats, volume, frames,
                                    seg_params)
        float(sum_w(volume))
        dt = time.perf_counter() - t0
    print(f"traced run: {dt*1e3:.1f} ms for 8 frames "
          f"({dt/8*1e3:.1f} ms/frame)", flush=True)


CATEGORIES = [
    ("conv", r"conv|%cudnn"),
    ("scatter", r"scatter"),
    ("gather", r"gather|dynamic-slice.*take|take"),
    ("pallas-shadow", r"shadow|custom-call.*mosaic|tpu_custom_call"),
    ("sort", r"sort"),
    ("while/scan", r"while"),
    ("copy", r"copy"),
    ("fusion(elementwise)", r"fusion"),
    ("dot", r"dot|matmul"),
]


def parse(outdir):
    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no perfetto trace found under", outdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU op tracks: pick pid/tid whose thread name mentions XLA Ops
    tracks = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tracks[(e["pid"], e["tid"])] = e["args"].get("name", "")
    optrack = {k for k, v in tracks.items()
               if "XLA Ops" in v or "Steps" not in v and "TensorFlow" in v}
    # bucket complete events per track; nested spans (while bodies wrap
    # their inner ops on the same track) must only count SELF time, so
    # compute exclusive duration with an interval stack per track.
    per_track = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if optrack and key not in optrack:
            continue
        per_track[key].append((e.get("ts", 0), e.get("dur", 0),
                               e.get("name", "")))
    agg = defaultdict(float)
    total = 0.0
    by_name = defaultdict(float)
    for key, evs in per_track.items():
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # [end_ts, child_sum, name, dur]
        selfs = []
        for ts, dur, name in evs:
            while stack and ts >= stack[-1][0]:
                end, child, nm, d = stack.pop()
                selfs.append((nm, d - child))
            if stack:
                stack[-1][1] += dur
            stack.append([ts + dur, 0.0, name, dur])
        while stack:
            end, child, nm, d = stack.pop()
            selfs.append((nm, d - child))
        for name, sdur in selfs:
            dur = sdur / 1e3  # us -> ms
            total += dur
            by_name[name] += dur
            for cat, pat in CATEGORIES:
                if re.search(pat, name, re.I):
                    agg[cat] += dur
                    break
            else:
                agg["other"] += dur
    print(f"\ntotal op time on track: {total:.1f} ms")
    for cat, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ms:9.2f} ms  ({ms/max(total,1e-9)*100:5.1f}%)")
    print("\ntop 40 ops:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:9.2f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["headline", "speed"],
                    default="headline")
    ap.add_argument("--outdir", default="/tmp/segfusion_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run(args.mode, args.outdir)
    parse(args.outdir)


if __name__ == "__main__":
    main()
