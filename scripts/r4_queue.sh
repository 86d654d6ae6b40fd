#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 next-round items #1/#2/#5/#6).
# HARD PRECONDITION: scripts/tpu_fused_smoke.py must PASS (incl. the
# with_ff scalar + ragged sections) before any bench stage runs — the
# round-3 erfc crash shipped precisely because the smoked path and the
# benched path diverged.  Stages are independent after that; a failure
# logs and continues.  Logs under exp_result/r4/.
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

# -- gate: fused-kernel smoke (scalar + ragged + with_ff, both env states)
STAGE_TIMEOUT=3000
stage smoke512 python -u scripts/tpu_fused_smoke.py --max-len 512
if [ $? -ne 0 ]; then
  echo "SMOKE FAILED — aborting queue" | tee -a $L/queue.log
  exit 1
fi
stage smoke4096 python -u scripts/tpu_fused_smoke.py --max-len 4096
if [ $? -ne 0 ]; then
  echo "SMOKE(4096) FAILED — aborting queue" | tee -a $L/queue.log
  exit 1
fi

# -- headline bench (trained seq-4096 checkpoints) -------------------------
STAGE_TIMEOUT=3000
stage bench_quick python -u bench.py --quick
STAGE_TIMEOUT=4200
stage bench_full  python -u bench.py

# -- decode benches: fused path vs r2 path vs full, across batch sizes ----
STAGE_TIMEOUT=2400
stage bs1_fused   python -u scripts/profile_bs.py --batch 1  --paths pallas,full --gen 50
stage bs8_fused   python -u scripts/profile_bs.py --batch 8  --paths pallas --gen 50
stage bs64_fused  python -u scripts/profile_bs.py --batch 64 --paths pallas,full --gen 50
stage bs1_r2path  env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 1  --paths pallas --gen 50
stage bs64_r2path env NSA_NO_FUSED_DECODE=1 python -u scripts/profile_bs.py --batch 64 --paths pallas --gen 50
stage bs64_vpusel env NSA_SELECT_VPU=1      python -u scripts/profile_bs.py --batch 64 --paths pallas --gen 50
stage bs1_noff    env NSA_NO_FF_FUSE=1      python -u scripts/profile_bs.py --batch 1  --paths pallas --gen 50

# -- serving: dense pool vs r2, and paged-pool capacity A/B ----------------
STAGE_TIMEOUT=3000
stage serve8  python -u scripts/serve_bench.py --max-batch 8  --requests 16  --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096
stage serve64 python -u scripts/serve_bench.py --max-batch 64 --requests 128 --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096
# paged pool sized to live tokens (64 slots x 4000 rows / 64-token pages
# = 4000 pages ≈ fits the same traffic in ~ 'live' HBM, vs 64 x 4096 dense)
stage serve64_paged python -u scripts/serve_bench.py --max-batch 64 --requests 128 --prompt-len 3900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096 --paged-pages 4096 --page-tokens 64
# capacity demo: 2x the slots of the dense-pool HBM budget, paged
stage serve128_paged python -u scripts/serve_bench.py --max-batch 128 --requests 256 --prompt-len 1900 --gen 100 --max-len 4096 --steps-per-sync 8 --ckpt ckpt/sparse_mlp_seq4096 --paged-pages 4096 --page-tokens 64

# -- fine-tune signal (VERDICT r3 #8): longer schedule from the retrained
# seq-4096 teacher, CE vs a real distillation mode, accuracy with CIs ------
STAGE_TIMEOUT=5400
stage ft_ce python -u scripts/finetune_cs441.py --teacher-ckpt ckpt/full_attn_seq4096 \
  --mode ce --steps 1000 --log-csv exp_result/r4/ft_ce_loss.csv \
  --out exp_result/r4/finetune_ce.json
stage ft_kl python -u scripts/finetune_cs441.py --teacher-ckpt ckpt/full_attn_seq4096 \
  --mode kl_logits --steps 1000 --log-csv exp_result/r4/ft_kl_loss.csv \
  --out exp_result/r4/finetune_kl.json

# -- training profile ------------------------------------------------------
STAGE_TIMEOUT=5400
stage train_profile python -u scripts/profile_train.py --paths sparse,full --chunks 128,256,512 --trace

echo "QUEUE DONE $(date)" | tee -a $L/queue.log
