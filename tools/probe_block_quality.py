"""Quality cost of the approximate integration levers (round 4).

Evaluates the joint quality-demo checkpoint
(configs/fusion/synthetic_tpu_demo_joint.yaml) under the two
approximation knobs that buy throughput on the bench:

* SETTINGS.frame_block = k   -- k frames per scan step; frames i>0 of a
  block fuse against state missing the block's earlier updates.
* SETTINGS.sem_integrate_every = k -- key scatter-max every k-th frame.

Baseline (k=1 both) is the exact per-frame recurrence. Reports TSDF
iou/mad, mesh F-score and 3D semantic mIoU per setting so PERFORMANCE.md
can state the measured quality price next to the measured speed win.

Runs on CPU or TPU: python tools/probe_block_quality.py [--ckpt PATH]
"""

import argparse
import copy
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


SETTINGS = [
    ("exact (frame_block=1, sem_every=1)", {}),
    ("frame_block=4", {"SEGFUSION_FRAME_BLOCK": "4"}),
    ("frame_block=8", {"SEGFUSION_FRAME_BLOCK": "8"}),
    ("sem_every=4", {"SEGFUSION_SEM_EVERY": "4"}),
    ("sem_every=8", {"SEGFUSION_SEM_EVERY": "8"}),
    ("frame_block=4 + sem_every=4", {"SEGFUSION_FRAME_BLOCK": "4",
                                     "SEGFUSION_SEM_EVERY": "4"}),
    ("geo bf16", {"SEGFUSION_GEO_DTYPE": "bfloat16"}),
    ("geo bf16 + frame_block=4 + sem_every=4",
     {"SEGFUSION_GEO_DTYPE": "bfloat16", "SEGFUSION_FRAME_BLOCK": "4",
      "SEGFUSION_SEM_EVERY": "4"}),
    ("geo bf16 + frame_block=8 + sem_every=4",
     {"SEGFUSION_GEO_DTYPE": "bfloat16", "SEGFUSION_FRAME_BLOCK": "8",
      "SEGFUSION_SEM_EVERY": "4"}),
]

_KNOBS = ("SEGFUSION_FRAME_BLOCK", "SEGFUSION_SEM_EVERY",
          "SEGFUSION_GEO_DTYPE")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/fusion/synthetic_tpu_demo_joint.yaml")
    ap.add_argument("--ckpt", default=None,
                    help="fusion checkpoint (default: newest best.ckpt "
                         "under the config's experiment path)")
    ap.add_argument("--n_frames", type=int, default=None,
                    help="override the TEST trajectory length (e.g. 300: "
                         "a long orbit whose consecutive frames heavily "
                         "overlap -- the frame-block staleness stress "
                         "case; the checkpoint stays the 60-frame one)")
    ap.add_argument("--only", default=None,
                    help="run only cases whose label contains this "
                         "substring (e.g. 'bf16' to re-run the 16-bit "
                         "rows without repeating the measured f32 ones)")
    args = ap.parse_args()

    from segfusion_tpu.config import load_config_from_yaml
    import test_fusion as TS

    cfg = load_config_from_yaml(args.config)
    ckpt = args.ckpt
    if ckpt is None:
        pats = sorted(glob.glob(os.path.join(
            cfg.SETTINGS.experiment_path, "*", "model", "best.ckpt")))
        assert pats, f"no checkpoint under {cfg.SETTINGS.experiment_path}"
        ckpt = pats[-1]
    print(f"checkpoint: {ckpt}", flush=True)

    rows = []
    cases = [(label, env) for label, env in SETTINGS
             if args.only is None or args.only in label]
    for label, env in cases:
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        # sem_integrate_every only decimates on the sequence path; the
        # env knob is read by Pipeline.__init__ via bench-style configs,
        # so thread it through SETTINGS here for the CLI harness.
        cfg_t = copy.deepcopy(cfg)
        cfg_t.TESTING.fusion_model_path = ckpt
        if args.n_frames:
            cfg_t.DATA.n_frames = args.n_frames
        if "SEGFUSION_SEM_EVERY" in env:
            cfg_t.SETTINGS.sem_integrate_every = int(
                env["SEGFUSION_SEM_EVERY"])
        m = TS.test_fusion(cfg_t)
        rows.append((label, m))
        print(f"{label}: {m}", flush=True)
    for k in _KNOBS:
        os.environ.pop(k, None)

    print("\n| setting | iou | mad | fscore | sem mIoU |")
    print("|---|---|---|---|---|")
    for label, m in rows:
        print(f"| {label} | {m.get('iou', float('nan')):.4f} "
              f"| {m.get('mad', float('nan')):.4f} "
              f"| {m.get('mesh_fscore', float('nan')):.4f} "
              f"| {m.get('sem_Mean IoU', float('nan')):.4f} |")


if __name__ == "__main__":
    main()
