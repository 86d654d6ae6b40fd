#!/bin/bash
# Round-2 TPU training queue: runs sequentially (only ONE process may touch
# the TPU). Logs to /tmp/queue_r2.log, per-run logs in /tmp/train_*.log.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/queue_r2.log; }

run() {
  name=$1; shift
  log "START $name: $*"
  timeout 14400 "$@" > /tmp/train_${name}.log 2>&1
  rc=$?
  log "DONE $name exit=$rc $(tail -1 /tmp/train_${name}.log | head -c 200)"
}

# 1. resume sparse mlp seq4096 3000 -> 5000 (flagship)
run mlp4096 python scripts/pretrain.py --attn-impl pallas --seq-len 4096 \
  --batch-size 16 --grad-accum 1 --num-batches 5000 --ckpt-every 1000 \
  --generate-every 0 --ckpt-dir ckpt/sparse_mlp_seq4096 \
  --log-csv ckpt/sparse_mlp_seq4096/train_log.csv

# 2. full attention seq4096 baseline 0 -> 5000
run full4096 python scripts/pretrain.py --full-attention --attn-impl xla \
  --seq-len 4096 --batch-size 16 --grad-accum 1 --num-batches 5000 \
  --ckpt-every 1000 --generate-every 0 --ckpt-dir ckpt/full_attn_seq4096 \
  --log-csv ckpt/full_attn_seq4096/train_log.csv

# 3. seq-512 model-type sweep, 5000 steps each (reference trains 5 types;
#    VERDICT allows seq 512 for the extra compressors)
for c in conv attn mean mlp; do
  run ${c}512 python scripts/pretrain.py --attn-impl pallas --seq-len 512 \
    --batch-size 32 --grad-accum 1 --num-batches 5000 --ckpt-every 2500 \
    --generate-every 0 --ckpt-dir ckpt/sparse_${c}_seq512_s5000 \
    --log-csv ckpt/sparse_${c}_seq512_s5000/train_log.csv --compressor $c
done
run full512 python scripts/pretrain.py --full-attention --attn-impl xla \
  --seq-len 512 --batch-size 32 --grad-accum 1 --num-batches 5000 \
  --ckpt-every 2500 --generate-every 0 --ckpt-dir ckpt/full_attn_seq512_s5000 \
  --log-csv ckpt/full_attn_seq512_s5000/train_log.csv

# 4. continuous pretrain (CS441 mid-training) on the two seq-4096 models
run cpt_mlp python scripts/continuous_pretrain.py \
  --ckpt-dir ckpt/sparse_mlp_seq4096 --out-dir ckpt/sparse_mlp_seq4096_cpt \
  --num-batches 300 --seq-len 4096 --batch-size 16 --mix-original 0.25
run cpt_full python scripts/continuous_pretrain.py \
  --ckpt-dir ckpt/full_attn_seq4096 --out-dir ckpt/full_attn_seq4096_cpt \
  --num-batches 300 --seq-len 4096 --batch-size 16 --mix-original 0.25

log "QUEUE COMPLETE"
