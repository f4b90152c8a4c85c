#!/bin/bash
# Round-5 parity campaign (VERDICT round-4 item 2): extend the
# checkpoint-controlled design to >=4 clean seeds + the StaleBN phase-2 arm,
# then execute the ship/flip decision (ABLATION.md).
#
# Protocol notes:
# - WIN_TOPK=off / CBL_DENSE=off: accuracy arms stay on the plain XLA paths
#   (bit-exact mod ulp vs the kernels; avoids the remote Mosaic helper's
#   in-step 500s) and stay COMPARABLE with the round-4 seed-0 rows, which
#   ran pre-cbl_dense.
# - PARITY_VOTES=5: a reduced paired vote budget (20 in the reference
#   protocol, tensorflow/config/s3dis.py:52) — decision-grade for DELTAS
#   because both arms share identical vote seeds; recorded per row.
# - A train that halts on the NaN sentinel exits this queue for that seed
#   only (the next seed still runs); handle diverged seeds manually
#   (scripts/nan_bisect.py, PARITY_CLIP).
# - Seed 1 fast: the round-4 checkpoint NaN-diverged (quarantined as
#   *.nan-r4); retraining here on the same code path is the determinism
#   probe for the postmortem.
# - Seed 3 runs the decision cells only (f/f, p/p — the paired totalDelta);
#   seeds 0-2 carry the full 2x2 eval-effect decomposition.
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

# --- seed 1: exact-path retrain + decision/decomposition evals ---
if train_if_missing 1 fast; then
  run eval 1 fast fast
  run eval 1 fast paper
fi

# --- seed 2: full 2x2 ---
if train_if_missing 2 fast && train_if_missing 2 paper; then
  run eval 2 fast fast
  run eval 2 fast paper
  run eval 2 paper fast
  run eval 2 paper paper
fi

# --- seed 3: decision cells ---
if train_if_missing 3 fast && train_if_missing 3 paper; then
  run eval 3 fast fast
  run eval 3 paper paper
fi

# --- phase 2: StaleBN production-candidate arm (seeds 0, 1) ---
for seed in 0 1; do
  if train_if_missing $seed fast_stale; then
    run eval $seed fast_stale fast_stale
  fi
done
echo ROUND5_CAMPAIGN_DONE
