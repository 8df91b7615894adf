#!/bin/bash
# Round-5 TPU evidence chain: serialized single-process TPU jobs (the
# axon grant claim is per-process; concurrent holders contend).
#   1. full bench validation                      (VERDICT r4 #1/#3/#4/#7)
#      -- first: the round's most important artifact, and it exercises the
#      bf16 Mosaic alignment fix on the bench shapes before anything else.
#   2. bf16 rows of the 300-frame block-quality probe (VERDICT r4 #2/#5;
#      the five f32 rows were measured 22:18-22:52 before the bf16 crash,
#      /tmp/block_quality_300.log, and are already in PERFORMANCE.md)
#   3. segmentation-training quality demo on-chip (VERDICT r4 #6; CPU run
#      already recorded: trained mIoU 0.5295 vs random 0.0484)
# Progress: /tmp/r5_chain.log; per-phase logs /tmp/r5_{bench,blockq,segdemo}.log
set -u
cd /root/repo
echo "chain start $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 3000 python bench.py > /tmp/r5_bench.log 2>&1
echo "BENCH rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 3600 python tools/probe_block_quality.py --n_frames 300 --only bf16 \
    > /tmp/r5_blockq.log 2>&1
echo "BLOCKQ rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 2400 python tools/probe_frame_block.py --mode headline \
    --ks 4,8 --sems 4,8 > /tmp/r5_hsweep.log 2>&1
echo "HSWEEP rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 5400 python tools/run_seg_quality_demo.py \
    > /tmp/r5_segdemo.log 2>&1
echo "SEGDEMO rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
echo "chain done $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
