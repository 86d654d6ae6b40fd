#!/bin/bash
# Round-3 TPU work queue: run after scripts/tpu_fused_smoke.py passes.
# Stages are independent; a failure logs and continues.  Logs under
# exp_result/r3/.
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_result/r3
L=exp_result/r3

stage() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a $L/queue.log
  timeout "$STAGE_TIMEOUT" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a $L/queue.log
  tail -5 "$L/$name.log" | tee -a $L/queue.log
}

# -- decode benches (fused path) -----------------------------------------
STAGE_TIMEOUT=2400
stage bs1_fused python -u scripts/profile_bs.py --batch 1 --paths pallas,full --gen 50
stage bs8_fused python -u scripts/profile_bs.py --batch 8 --paths pallas --gen 50
stage bs64_fused python -u scripts/profile_bs.py --batch 64 --paths pallas,full --gen 50
# A/B: round-2 kernel path and MXU select
stage bs1_r2path env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 1 --paths pallas --gen 50
stage bs64_r2path env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 64 --paths pallas --gen 50
stage bs64_vpusel env NSA_SELECT_VPU=1 python -u scripts/profile_bs.py --batch 64 --paths pallas --gen 50
stage bs1_noff env NSA_NO_FF_FUSE=1 python -u scripts/profile_bs.py --batch 1 --paths pallas --gen 50

# -- headline bench -------------------------------------------------------
STAGE_TIMEOUT=3000
stage bench_quick python -u bench.py --quick
STAGE_TIMEOUT=4200
stage bench_full python -u bench.py

# -- serving --------------------------------------------------------------
STAGE_TIMEOUT=3000
stage serve8 python -u scripts/serve_bench.py --max-batch 8 --requests 16 --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096
stage serve64 python -u scripts/serve_bench.py --max-batch 64 --requests 128 --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096

# -- training profile -----------------------------------------------------
STAGE_TIMEOUT=5400
stage train_profile python -u scripts/profile_train.py --paths sparse,full --chunks 128,256,512 --trace

echo "QUEUE DONE $(date)" | tee -a $L/queue.log
