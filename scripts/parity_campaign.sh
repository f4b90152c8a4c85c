#!/bin/bash
# Round-4 parity campaign (VERDICT item 3): serialized TPU jobs.
# Phase 1 — checkpoint-controlled (search-recall isolation, zero training
# noise): train one ckpt per arm per seed, evaluate each ckpt under BOTH
# pyramid protocols with identical vote seeds.
# Phase 2 (time permitting, driven manually) — more seed pairs.
# Each job is its own process (compile caches persist via the fingerprinted
# dir); everything appends to results/parity_ckpt.jsonl.
set -x
cd /root/repo
# kernels off for the campaign: accuracy arms must not die on the remote
# Mosaic helper's in-step 500s (the kernels are bit-exact mod ulp ties, so
# accuracy conclusions are unaffected; see PERF.md round 4)
export WIN_TOPK=off
export PARITY_EPOCHS=${PARITY_EPOCHS:-15}
for seed in 0 1; do
  for arm in fast paper; do
    ck="results/ckpts/parity_s${seed}_${arm}_e${PARITY_EPOCHS}.pkl"
    if [ ! -f "$ck" ]; then
      timeout 7200 python scripts/parity_ckpt.py train $seed $arm || exit 1
    fi
  done
  for train_arm in fast paper; do
    for eval_arm in fast paper; do
      timeout 7200 python scripts/parity_ckpt.py eval $seed $train_arm $eval_arm || exit 1
    done
  done
done
echo CAMPAIGN_DONE
