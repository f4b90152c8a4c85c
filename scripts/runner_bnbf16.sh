#!/bin/bash
# Round-5 continuation: seed-paired accuracy arms for the BN_COMPUTE=model
# step knob (scripts/ab_bn_dtype.py: 67.7 -> 63.6 ms). Matches the parity
# campaign env exactly (WIN_TOPK=off CBL_DENSE=off, 15 epochs, 5 votes) so
# the ONLY delta vs the existing fast cells is the BN compute dtype during
# training; eval runs under the plain 'fast' arm (BN f32) for both.
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

if train_if_missing 0 fast_bnbf16; then run eval 0 fast_bnbf16 fast; fi \
  > /tmp/bnbf16_s0.log 2>&1
echo "BNBF16_S0_DONE rc=$?"
if train_if_missing 2 fast_bnbf16; then run eval 2 fast_bnbf16 fast; fi \
  > /tmp/bnbf16_s2.log 2>&1
echo "BNBF16_S2_DONE rc=$?"
echo RUNNER_BNBF16_DONE
