#!/bin/bash
# Round-5 parity campaign, final tail. Seeds 0-2 have full clean 2x2
# matrices in results/parity_ckpt.jsonl (summary: mean totalD +0.99 mIoU
# fast-favored). Remaining, in gating order:
#   1. StaleBN phase-2 arm seed 0 (gates the attention-kernel ship decision)
#   2. seed-3 decision cells (f/f, p/p) -> 4th clean seed for the totalD rule
#   3. StaleBN arm seed 1
# Protocol identical to parity_round5.sh (WIN_TOPK=off CBL_DENSE=off,
# 15 epochs, PARITY_VOTES=5; stale arms force PT_ATTN=off in parity_ckpt.py).
set -x
cd /root/repo
export WIN_TOPK=off
export CBL_DENSE=off
export PARITY_EPOCHS=${PARITY_EPOCHS:-15}
export PARITY_VOTES=${PARITY_VOTES:-5}

run() { timeout 7200 python scripts/parity_ckpt.py "$@"; }
train_if_missing() {
  ck="results/ckpts/parity_s${1}_${2}_e${PARITY_EPOCHS}.pkl"
  [ -f "$ck" ] || run train "$1" "$2"
}

if train_if_missing 0 fast_stale; then
  run eval 0 fast_stale fast_stale
fi

if train_if_missing 3 fast && train_if_missing 3 paper; then
  run eval 3 fast fast
  run eval 3 paper paper
fi

if train_if_missing 1 fast_stale; then
  run eval 1 fast_stale fast_stale
fi
echo ROUND5C_CAMPAIGN_DONE
