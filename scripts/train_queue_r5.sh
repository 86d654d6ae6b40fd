#!/bin/bash
# Round-5 TPU training queue: retrain the seq-4096 flagship checkpoints
# (host migration wiped ckpt/ AND the end-of-run ckpt_export npz a third
# time).  Exports now refresh at EVERY checkpoint save (ckpt-every 500),
# so a partially completed run still leaves committable trained weights
# in ckpt_export/.  Sequential — only ONE process may touch the TPU.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue_r5.log; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 14400 "$@" > /tmp/train_${name}.log 2>&1
  rc=$?
  log "DONE $name exit=$rc $(tail -1 /tmp/train_${name}.log | head -c 200)"
}

# 1. sparse mlp seq4096 5000 steps (flagship; bench + serving + teacher)
run mlp4096 python scripts/pretrain.py --attn-impl pallas --seq-len 4096 \
  --batch-size 16 --grad-accum 1 --num-batches 5000 --ckpt-every 500 \
  --generate-every 0 --ckpt-dir ckpt/sparse_mlp_seq4096 \
  --log-csv ckpt/sparse_mlp_seq4096/train_log.csv

# 2. full attention seq4096 baseline
run full4096 python scripts/pretrain.py --full-attention --attn-impl xla \
  --seq-len 4096 --batch-size 16 --grad-accum 1 --num-batches 5000 \
  --ckpt-every 500 --generate-every 0 --ckpt-dir ckpt/full_attn_seq4096 \
  --log-csv ckpt/full_attn_seq4096/train_log.csv

log "QUEUE COMPLETE"
