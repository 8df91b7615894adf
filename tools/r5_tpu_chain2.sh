#!/bin/bash
# Round-5 TPU evidence chain, part 2 (run after the bench phase of
# r5_tpu_chain.sh; kill that chain first -- round-4's trained joint-demo
# checkpoint under workspace/ did not survive the round boundary, so its
# block-quality phase asserts).
#   1. retrain the joint quality demo on-chip (also re-lands the trained
#      vs random table on a fresh checkpoint)            (VERDICT r4 #3)
#   2. block-quality 300-frame orbit, ALL cases on the new checkpoint so
#      the table is internally consistent (f32 + bf16 + sem8 rows)
#                                                        (VERDICT r4 #5)
#   3. headline (frame_block x sem_every) sweep, bf16    (VERDICT r4 #7)
#   4. segmentation quality demo on-chip                 (VERDICT r4 #6)
# Progress: /tmp/r5_chain2.log; per-phase logs /tmp/r5_{qdemo,blockq2,hsweep,segdemo}.log
set -u
cd /root/repo
echo "chain2 start $(date -u +%H:%M:%S)" >> /tmp/r5_chain2.log

timeout 3600 python tools/run_quality_demo.py > /tmp/r5_qdemo.log 2>&1
echo "QDEMO rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain2.log

timeout 5400 python tools/probe_block_quality.py --n_frames 300 \
    > /tmp/r5_blockq2.log 2>&1
echo "BLOCKQ2 rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain2.log

timeout 2400 python tools/probe_frame_block.py --mode headline \
    --ks 4,8 --sems 4,8 > /tmp/r5_hsweep.log 2>&1
echo "HSWEEP rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain2.log

timeout 5400 python tools/run_seg_quality_demo.py \
    > /tmp/r5_segdemo.log 2>&1
echo "SEGDEMO rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain2.log
echo "chain2 done $(date -u +%H:%M:%S)" >> /tmp/r5_chain2.log
