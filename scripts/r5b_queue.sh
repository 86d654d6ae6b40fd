#!/bin/bash
# Round-5b TPU queue: head-batched megakernel measurements.
# 1. bs-1 timing re-run (second sample: the first run's full-attn reading
#    of 0.2348 ms/step is ~2.6x its r5 baseline — same anomaly family as
#    the 1,013 tok/s quick-bench full reading this session).
# 2. bs-8 timing (the bench --quick regime; HB should compound the r5 win).
# 3. f32 token-exact gate on the HB kernel (the advisor-mandated on-chip gate).
# 4. bench --quick and full bench on the new default path.
set -u
cd /root/repo
mkdir -p exp_result/r5
LOG=exp_result/r5/queue_b.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "1/5 bs-1 timing, sample 2"
timeout 2400 python scripts/tpu_mega_smoke.py --gen 200 --prompt 128 \
  > exp_result/r5/mega_ab_hb2.log 2>&1
log "exit=$? :: $(grep SUMMARY exp_result/r5/mega_ab_hb2.log | head -c 400)"

log "2/5 bs-8 timing"
timeout 2400 python scripts/tpu_mega_smoke.py --batch 8 --gen 200 --prompt 128 \
  > exp_result/r5/mega_ab_hb_bs8.log 2>&1
log "exit=$? :: $(grep SUMMARY exp_result/r5/mega_ab_hb_bs8.log | head -c 400)"

log "3/5 f32 token-exact gate (HB kernel)"
timeout 2400 python scripts/tpu_mega_smoke.py --f32 --skip-timing \
  > exp_result/r5/mega_smoke_hb_f32.log 2>&1
log "exit=$? :: $(tail -2 exp_result/r5/mega_smoke_hb_f32.log | head -c 300)"

log "4/5 bench --quick (HB default at bs 8)"
timeout 1800 python bench.py --quick > exp_result/r5/bench_quick_hb.log 2>&1
log "exit=$? :: $(tail -1 exp_result/r5/bench_quick_hb.log | head -c 300)"

log "5/5 full headline bench"
timeout 3600 python bench.py > exp_result/r5/bench_full.log 2>&1
log "exit=$? :: $(tail -1 exp_result/r5/bench_full.log | head -c 400)"
log "R5B QUEUE COMPLETE"
