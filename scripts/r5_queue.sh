#!/bin/bash
# Round-5 TPU measurement queue (run AFTER the retrain queue releases the
# TPU): megakernel on-chip validation with the teacher-forced gate 2,
# bs-1 timing A/B (mega vs mega-x8 vs fused-2k vs full), then bench
# sanity on the retrained exports.  Logs land in exp_result/r5/.
set -u
cd /root/repo
mkdir -p exp_result/r5
LOG=exp_result/r5/queue.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "1/3 mega smoke gates 1+2 (teacher-forced)"
timeout 2400 python scripts/tpu_mega_smoke.py --skip-timing \
  > exp_result/r5/mega_smoke.log 2>&1
rc=$?
log "smoke exit=$rc :: $(tail -2 exp_result/r5/mega_smoke.log | head -c 300)"

if [ $rc -eq 0 ]; then
  log "2/3 mega timing A/B (bs 1, gen 200)"
  timeout 3600 python scripts/tpu_mega_smoke.py --gen 200 --prompt 128 \
    > exp_result/r5/mega_ab.log 2>&1
  log "timing exit=$? :: $(grep SUMMARY exp_result/r5/mega_ab.log | head -c 300)"
else
  log "smoke failed - skipping timing"
fi

log "3/3 bench --quick sanity (trained exports)"
timeout 1800 python bench.py --quick > exp_result/r5/bench_quick.log 2>&1
log "bench exit=$? :: $(tail -1 exp_result/r5/bench_quick.log | head -c 300)"
log "R5 QUEUE COMPLETE"
