"""Joint-accuracy quality demo driver (VERDICT r3 #7).

Trains configs/fusion/synthetic_tpu_demo_joint.yaml (FusionNet v3 gf6
bf16 WITH semantics in the loop, 256x256, synthetic scene) online, then
evaluates trained vs random weights with the full test harness
(outlier + median filters, TSDF metrics, mesh F-score, 3D semantic
mIoU). The stand-in for the reference's published-number acceptance run
(reference README.md:124-134; the downloadable example scene and
pretrained checkpoints are unavailable in this environment).

Run ON TPU: python tools/run_quality_demo.py [--config <yaml>]
"""

import argparse
import copy
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/fusion/synthetic_tpu_demo_joint.yaml")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the newest checkpoint under the "
                         "experiment path")
    args = ap.parse_args()

    from segfusion_tpu.config import load_config_from_yaml
    import train_fusion as TF
    import test_fusion as TS

    cfg = load_config_from_yaml(args.config)

    if not args.skip_train:
        TF.train_fusion({"comment": "quality demo"},
                        copy.deepcopy(cfg))

    pats = sorted(glob.glob(os.path.join(
        cfg.SETTINGS.experiment_path, "*", "model", "best.ckpt")))
    if not pats:
        pats = sorted(glob.glob(os.path.join(
            cfg.SETTINGS.experiment_path, "*", "model", "*.ckpt")))
    assert pats, f"no checkpoint under {cfg.SETTINGS.experiment_path}"
    ckpt = pats[-1]
    print(f"using checkpoint {ckpt}", flush=True)

    cfg_t = copy.deepcopy(cfg)
    cfg_t.TESTING.fusion_model_path = ckpt
    trained = TS.test_fusion(cfg_t)

    cfg_r = copy.deepcopy(cfg)
    cfg_r.TESTING.fusion_model_path = None
    rand = TS.test_fusion(cfg_r)

    keys = sorted(set(trained) | set(rand))
    print("\n=== QUALITY DEMO: trained vs random (joint 256^2) ===")
    for k in keys:
        tv = trained.get(k)
        rv = rand.get(k)
        fmt = lambda v: ("%.4f" % v) if isinstance(v, float) else str(v)
        print(f"{k:24s} trained {fmt(tv):>10s}   random {fmt(rv):>10s}")
    print(json.dumps({"trained": {k: float(v) for k, v in trained.items()
                                  if isinstance(v, (int, float))},
                      "random": {k: float(v) for k, v in rand.items()
                                 if isinstance(v, (int, float))}}))


if __name__ == "__main__":
    main()
