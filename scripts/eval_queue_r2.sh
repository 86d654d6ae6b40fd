#!/bin/bash
# Round-2 TPU eval queue: waits for the training queue to finish (PID arg
# or "QUEUE COMPLETE" in /tmp/queue_r2.log), then runs the full evaluation
# sweep on the trained checkpoints.  Only ONE process may touch the TPU.
# Logs to /tmp/eval_r2.log, per-run logs in /tmp/eval_*.log.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/eval_r2.log; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 7200 "$@" > /tmp/eval_${name}.log 2>&1
  rc=$?
  log "DONE $name exit=$rc $(tail -1 /tmp/eval_${name}.log | head -c 200)"
}

# wait for both training queues (B includes the re-run full-attn baseline)
while ! grep -q "QUEUE B COMPLETE" /tmp/queue_r2b.log 2>/dev/null; do
  sleep 120
done
log "training queues complete; starting evals"

# stale round-1 artifacts (1200-step models) -> archive
mkdir -p exp_result/r1_archive
for f in ppl_seq512.csv generation_seq512.csv efficiency_seq512.csv; do
  [ -f exp_result/$f ] && mv exp_result/$f exp_result/r1_archive/$f
done

# 1. seq-4096 PPL + generation, full vs sparse(mlp): the reference-scale
#    quality table (ppl_step5000.csv:7-11 analogue)
run ppl4096 python scripts/run_eval_suite.py --models full mlp \
  --seq-len 4096 --skip-efficiency --max-id-tokens 500000

# 2. continuous-pretrained (CS441 mid-training) variants: the meaningful
#    OOD comparison
run ppl4096cpt python scripts/run_eval_suite.py --models full mlp \
  --seq-len 4096 --ckpt-suffix _cpt --skip-efficiency \
  --max-id-tokens 500000

# 3. seq-512 all-compressor sweep (ppl_step5000.csv:2-6 analogue)
run ppl512 python scripts/run_eval_suite.py \
  --models full conv attn mean mlp --seq-len 512 --ckpt-suffix _s5000 \
  --skip-efficiency --max-id-tokens 500000

# 4. efficiency sweep parity at seq 4096 from trained checkpoints:
#    bs {1,8,16,32,64} x prompt {500,1500,2500,3900}, gen 100
run eff4096 python scripts/run_eval_suite.py --models full mlp \
  --seq-len 4096 --skip-ppl --skip-generate \
  --batch-sizes 1 8 16 32 64 --prompt-lens 500 1500 2500 3900 \
  --gen-len 100 --attn-impl pallas

# 5. headline benchmark from the trained checkpoint
run bench python bench.py

# 6. serving-engine throughput benchmark
run serve python scripts/serve_bench.py --max-len 4096 --prompt-len 3900 \
  --gen 100 --requests 16 --max-batch 8 \
  --ckpt ckpt/sparse_mlp_seq4096

# 7. long-context streaming kernels on the real chip (Mosaic compile +
#    manual DMA at 16k context; interpret equivalence is already tested)
run stream16k python scripts/validate_streaming_tpu.py --seq-len 16384

# 8. fine-tune line end-to-end on real task data (F4 + E6): NSA adapters
#    distilled from the trained full-attention teacher, base-vs-adapted
#    CS441 QA accuracy
run finetune python scripts/finetune_cs441.py \
  --teacher-ckpt ckpt/full_attn_seq512_s5000 --steps 300 --mode ce \
  --out exp_result/finetune_cs441.json \
  --log-csv exp_result/finetune_cs441_loss.csv

log "EVAL QUEUE COMPLETE"
