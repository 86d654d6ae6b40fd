#!/bin/bash
# Round-4 queue part B: the stages that failed on the scoped-VMEM OOM,
# after the lazy_jit compiler-options fix, plus a fused-vs-r2 headline A/B
# to pick the default large-batch decode path by measurement.
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

STAGE_TIMEOUT=4200
stage bench_full python -u bench.py
stage bench_full_r2path env NSA_NO_FUSED_DECODE=1 python -u bench.py

STAGE_TIMEOUT=2400
stage bs64_vpusel env NSA_SELECT_VPU=1 python -u scripts/profile_bs.py --batch 64 --paths pallas --gen 50

STAGE_TIMEOUT=3000
stage serve64 python -u scripts/serve_bench.py --max-batch 64 --requests 128 --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096
stage serve64_paged python -u scripts/serve_bench.py --max-batch 64 --requests 128 --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096 --paged-pages 4096 --page-tokens 64
stage serve128_paged python -u scripts/serve_bench.py --max-batch 128 --requests 256 --prompt-len 1900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096 --paged-pages 4096 --page-tokens 64

echo "QUEUE-B DONE $(date)" | tee -a $L/queue.log
