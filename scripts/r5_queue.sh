#!/bin/bash
# Round-5 TPU measurement queue (run AFTER the retrain queue releases the
# TPU): megakernel on-chip validation — f32 token-exact first (the gate
# the r4 advisor flagged as never running on chip), then bf16 — bs-1
# timing A/B (mega vs mega-x8 vs fused-2k vs full), then the full
# headline bench on the retrained exports.  Logs land in exp_result/r5/.
set -u
cd /root/repo
mkdir -p exp_result/r5
LOG=exp_result/r5/queue.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "1/5 mega smoke gates 1+2, f32 (token-exact expectation)"
timeout 2400 python scripts/tpu_mega_smoke.py --f32 --skip-timing \
  > exp_result/r5/mega_smoke_f32.log 2>&1
rc32=$?
log "f32 smoke exit=$rc32 :: $(tail -2 exp_result/r5/mega_smoke_f32.log | head -c 300)"

log "2/5 mega smoke gates 1+2, bf16 (teacher-forced)"
timeout 2400 python scripts/tpu_mega_smoke.py --skip-timing \
  > exp_result/r5/mega_smoke.log 2>&1
rc=$?
log "bf16 smoke exit=$rc :: $(tail -2 exp_result/r5/mega_smoke.log | head -c 300)"

if [ $rc -eq 0 ]; then
  log "3/5 mega timing A/B (bs 1, gen 200)"
  timeout 3600 python scripts/tpu_mega_smoke.py --gen 200 --prompt 128 \
    > exp_result/r5/mega_ab.log 2>&1
  log "timing exit=$? :: $(grep SUMMARY exp_result/r5/mega_ab.log | head -c 400)"
else
  log "bf16 smoke failed - skipping timing"
fi

log "4/5 full headline bench (trained exports, both models)"
timeout 3600 python bench.py > exp_result/r5/bench_full.log 2>&1
log "bench exit=$? :: $(tail -1 exp_result/r5/bench_full.log | head -c 400)"

log "5/5 bench --quick sanity"
timeout 1800 python bench.py --quick > exp_result/r5/bench_quick.log 2>&1
log "quick exit=$? :: $(tail -1 exp_result/r5/bench_quick.log | head -c 300)"
log "R5 QUEUE COMPLETE"
