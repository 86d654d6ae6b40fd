#!/bin/bash
# Round-4 queue part C: pin the fused-vs-r2 batch-size crossover for the
# NSA_FUSED_DECODE_MAX_B default, and xprof the bs-1 step (what remains
# between 0.684 ms fused and 0.608 ms full attention).
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_result/r4
L=exp_result/r4

stage() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a $L/queue.log
  timeout "$STAGE_TIMEOUT" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $L/queue.log
  tail -5 "$L/$name.log" | tee -a $L/queue.log
  return $rc
}

STAGE_TIMEOUT=2400
stage bs8_r2path  env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 8  --paths pallas --gen 50
stage bs16_fused  env NSA_FUSED_DECODE_MAX_B=64 python -u scripts/profile_bs.py --batch 16 --paths pallas --gen 50
stage bs16_r2path env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 16 --paths pallas --gen 50
stage bs32_fused  env NSA_FUSED_DECODE_MAX_B=64 python -u scripts/profile_bs.py --batch 32 --paths pallas --gen 50
stage bs32_r2path env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 32 --paths pallas --gen 50

STAGE_TIMEOUT=3000
stage trace_bs1 python -u scripts/trace_decode.py --pallas

echo "QUEUE-C DONE $(date)" | tee -a $L/queue.log
