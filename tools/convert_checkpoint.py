#!/usr/bin/env python
"""Convert reference PyTorch checkpoints (.pth.tar) to this framework's
checkpoint format.

Usage:
  python tools/convert_checkpoint.py --type fusion \
      --config configs/fusion/replica_accuracy.yaml \
      --in best.pth.tar --out fusion_best.ckpt
  python tools/convert_checkpoint.py --type adapnet --stage 2 \
      --n-classes 30 --resx 256 --resy 256 \
      --in adapnet_best.pth.tar --out adapnet_best.ckpt

Conversion is validated by numerical parity tests
(tests/test_torch_parity.py, tests/test_adapnet_parity.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", choices=("fusion", "adapnet"), required=True)
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", help="yaml config (for fusion conversion)")
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--n-classes", type=int, default=30)
    ap.add_argument("--resx", type=int, default=256)
    ap.add_argument("--resy", type=int, default=256)
    ap.add_argument("--strip-prefix", default=None,
                    help="strip a state-dict key prefix (e.g. 'module')")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from segfusion_tpu.utils import checkpoints as ckpt_lib
    from segfusion_tpu.utils.torch_convert import (
        convert_adapnet_state_dict, convert_fusionnet_state_dict,
        load_torch_checkpoint)

    state = load_torch_checkpoint(args.inp)
    if args.strip_prefix:
        pref = args.strip_prefix + "."
        state = {k[len(pref):] if k.startswith(pref) else k: v
                 for k, v in state.items()}

    if args.type == "fusion":
        from segfusion_tpu.config import load_config
        from segfusion_tpu.models.fusionnet import build_fusion_net
        config = load_config(args.config)
        net = build_fusion_net(config.FUSION_MODEL)
        h, w = int(config.DATA.resy), int(config.DATA.resx)
        dummy = {
            "tsdf_values": jnp.zeros((1, h, w, config.FUSION_MODEL.n_points)),
            "tsdf_weights": jnp.zeros((1, h, w,
                                       config.FUSION_MODEL.n_points)),
            "tsdf_frame": jnp.zeros((1, h, w, 1)),
        }
        if config.FUSION_MODEL.use_semantics:
            dummy["semantic_frame"] = jnp.zeros((1, h, w, 1))
        variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
        params, stats = convert_fusionnet_state_dict(
            state, variables["params"], variables.get("batch_stats", {}),
            dict(config.FUSION_MODEL))
    else:
        from segfusion_tpu.models.adapnet import AdapNet
        net = AdapNet(n_classes=args.n_classes, stage=args.stage)
        x = jnp.zeros((1, args.resy, args.resx, 3))
        if args.stage == 1:
            variables = net.init(jax.random.PRNGKey(0), x, train=False)
        else:
            variables = net.init(jax.random.PRNGKey(0), x, x, train=False)
        params, stats = convert_adapnet_state_dict(
            state, variables["params"], variables.get("batch_stats", {}),
            args.stage)

    ckpt_lib.save_checkpoint(
        {"params": params, "batch_stats": stats, "epoch": 0}, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
