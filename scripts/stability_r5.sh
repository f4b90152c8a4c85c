#!/bin/bash
# Round-5 VERDICT item 6: one production-length stability run.
#
# The longest flagship training on record before this was 15 epochs; the
# reference schedule is 200 (pytorch/config/s3dis/origin_*-w.1.yaml:18-24,
# global batch 16 over 4 GPUs). This runs the full 200-epoch schedule on
# synthetic_full with the PRODUCTION defaults (sorted+strided pyramid, bf16,
# Pallas kernels on probe/auto, always-on NaN sentinels), eval every 25
# epochs, at this box's B=4 (single chip; the batch-size difference is a
# documented deviation — this is a stability demonstration, not an accuracy
# claim). Success = completes with zero non-finite events; curve recorded
# in ABLATION.md.
set -x
cd /root/repo
timeout 18000 python -m contrastboundary_tpu.main -c synthetic_full \
  --set "optim.epochs:200;eval.eval_freq:25;save_freq:100" \
  --exp_dir results/stability_r5
echo STABILITY_DONE rc=$?
