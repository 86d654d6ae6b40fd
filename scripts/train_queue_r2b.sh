#!/bin/bash
# Round-2 follow-up training queue: the full-attention seq-4096 baseline
# OOMed in queue A (chunked-attention backward saved O(n^2) weights; fixed
# by per-chunk remat in ops/attention.py).  Waits for queue A, re-runs the
# baseline + its continuous-pretrain leg, then marks completion for the
# eval queue.  Logs to /tmp/queue_r2b.log.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue_r2b.log; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 14400 "$@" > /tmp/train_${name}.log 2>&1
  rc=$?
  log "DONE $name exit=$rc $(tail -1 /tmp/train_${name}.log | head -c 200)"
}

while ! grep -q "QUEUE COMPLETE" /tmp/queue_r2.log 2>/dev/null; do
  sleep 120
done
log "queue A complete; starting queue B"

run full4096 python scripts/pretrain.py --full-attention --attn-impl xla \
  --seq-len 4096 --batch-size 16 --grad-accum 1 --num-batches 5000 \
  --ckpt-every 1000 --generate-every 0 --ckpt-dir ckpt/full_attn_seq4096 \
  --log-csv ckpt/full_attn_seq4096/train_log.csv

run cpt_full python scripts/continuous_pretrain.py \
  --ckpt-dir ckpt/full_attn_seq4096 --out-dir ckpt/full_attn_seq4096_cpt \
  --num-batches 300 --seq-len 4096 --batch-size 16 --mix-original 0.25

log "QUEUE B COMPLETE"
