#!/bin/bash
# Round-5 TPU evidence chain: serialized single-process TPU jobs (the
# axon grant claim is per-process; concurrent holders contend).
#   1. 300-frame high-overlap block-quality probe (VERDICT r4 #5)
#   2. segmentation-training quality demo      (VERDICT r4 #6)
#   3. full bench validation                   (VERDICT r4 #1)
# Progress: /tmp/r5_chain.log; per-phase logs /tmp/r5_{blockq,segdemo,bench}.log
set -u
cd /root/repo
echo "chain start $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 7200 python tools/probe_block_quality.py --n_frames 300 \
    > /tmp/r5_blockq.log 2>&1
echo "BLOCKQ rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 5400 python tools/run_seg_quality_demo.py \
    > /tmp/r5_segdemo.log 2>&1
echo "SEGDEMO rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log

timeout 3000 python bench.py > /tmp/r5_bench.log 2>&1
echo "BENCH rc=$? $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
echo "chain done $(date -u +%H:%M:%S)" >> /tmp/r5_chain.log
