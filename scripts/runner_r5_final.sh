#!/bin/bash
# Round-5 final serialized TPU queue. One TPU + 1 host CPU (CLAUDE.md):
# every stage runs alone, logs to its own file, and each completed stage is
# independently valuable if the round ends mid-queue. Order:
#   1. preset-shape grid-split A/B (VERDICT item 4 — cheap, may flip the
#      bench preset kernel policy before the driver's final bench run)
#   2. parity seed-3 decision cells f/f + p/p (4th clean seed for the
#      round-3 decision rule)
#   3. parity seed-3 cross cells f/p + p/f (completes the 2x2 matrix)
#   4. StaleBN phase-2 arm, seed 0 (train fast_stale + eval s/s)
#   5. production-length stability run (item 6) — takes whatever time is
#      left; scalars JSONL + eval-every-25 survive a mid-run kill.
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

# stage 1: preset-shape A/B (kernels need their own env, not the parity one)
( unset WIN_TOPK CBL_DENSE
  timeout 3600 python scripts/ab_preset_split.py selfoff,split \
    > /tmp/r5_preset_split.log 2>&1 )
echo "STAGE1_DONE rc=$?"

# stage 2: seed-3 decision cells
if train_if_missing 3 fast; then run eval 3 fast fast; fi \
  > /tmp/r5_seed3_fast.log 2>&1
echo "STAGE2A_DONE rc=$?"
if train_if_missing 3 paper; then run eval 3 paper paper; fi \
  > /tmp/r5_seed3_paper.log 2>&1
echo "STAGE2B_DONE rc=$?"

# stage 3: seed-3 cross cells (completes the 2x2)
run eval 3 fast paper > /tmp/r5_seed3_fp.log 2>&1
echo "STAGE3A_DONE rc=$?"
run eval 3 paper fast > /tmp/r5_seed3_pf.log 2>&1
echo "STAGE3B_DONE rc=$?"

# stage 4: StaleBN production-candidate arm, seed 0
if train_if_missing 0 fast_stale; then run eval 0 fast_stale fast_stale; fi \
  > /tmp/r5_stale_s0.log 2>&1
echo "STAGE4_DONE rc=$?"

# stage 5: stability run — everything that remains
( unset WIN_TOPK CBL_DENSE
  bash scripts/stability_r5.sh > /tmp/r5_stability.log 2>&1 )
echo "STAGE5_DONE rc=$?"
echo RUNNER_R5_FINAL_DONE
