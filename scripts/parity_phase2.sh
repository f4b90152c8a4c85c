#!/bin/bash
# Parity campaign phase 2: the StaleBatchNorm production-candidate arm
# (fast pyramid + bn_mode='stale'), checkpoint-controlled like phase 1.
# StaleBN is the prerequisite for the fused attention kernel to ever be a
# production default (ops/pallas/pt_attn.py needs fold-friendly BN), so the
# accuracy question "does stale-stats normalization cost mIoU?" must be
# answered seed-paired before any preset flip. Run AFTER parity_campaign.sh.
set -x
cd /root/repo
export WIN_TOPK=off
export PARITY_EPOCHS=${PARITY_EPOCHS:-15}
export PARITY_VOTES=${PARITY_VOTES:-5}
for seed in 0 1; do
  ck="results/ckpts/parity_s${seed}_fast_stale_e${PARITY_EPOCHS}.pkl"
  if [ ! -f "$ck" ]; then
    timeout 7200 python scripts/parity_ckpt.py train $seed fast_stale || exit 1
  fi
  # paired read-out: stale-vs-batch under the SAME fast eval pyramid
  timeout 7200 python scripts/parity_ckpt.py eval $seed fast_stale fast_stale || exit 1
done
echo PHASE2_DONE
