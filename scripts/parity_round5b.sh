#!/bin/bash
# Round-5 parity campaign, REORDERED tail (see parity_round5.sh for the
# protocol): the StaleBN phase-2 arm moves ahead of the seed-3 decision
# cells because it gates the attention-kernel ship decision (VERDICT
# round-4 item 3 depends on it), and the queue is designed to degrade
# gracefully if the chip is reclaimed for the perf A/Bs before the tail
# finishes. Waits for any in-flight parity child from the killed
# original wrapper, then continues from the checkpoint state on disk.
set -x
cd /root/repo
while kill -0 $(cat /tmp/parity_inflight.pid) 2>/dev/null; do sleep 30; done
export WIN_TOPK=off
export CBL_DENSE=off
export PARITY_EPOCHS=${PARITY_EPOCHS:-15}
export PARITY_VOTES=${PARITY_VOTES:-5}

run() { timeout 7200 python scripts/parity_ckpt.py "$@"; }
train_if_missing() {
  ck="results/ckpts/parity_s${1}_${2}_e${PARITY_EPOCHS}.pkl"
  [ -f "$ck" ] || run train "$1" "$2"
}

# --- seed 2: full 2x2 ---
if train_if_missing 2 fast && train_if_missing 2 paper; then
  run eval 2 fast fast
  run eval 2 fast paper
  run eval 2 paper fast
  run eval 2 paper paper
fi

# --- phase 2 first: StaleBN production-candidate arm, seed 0 ---
if train_if_missing 0 fast_stale; then
  run eval 0 fast_stale fast_stale
fi

# --- seed 3: decision cells ---
if train_if_missing 3 fast && train_if_missing 3 paper; then
  run eval 3 fast fast
  run eval 3 paper paper
fi

# --- phase 2, seed 1 ---
if train_if_missing 1 fast_stale; then
  run eval 1 fast_stale fast_stale
fi
echo ROUND5_CAMPAIGN_DONE
