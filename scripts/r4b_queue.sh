#!/bin/bash
# Round-4b TPU queue: megakernel on-chip validation + bs-1 A/B.
# Waits for the retrain queue (scripts/train_queue_r4.sh) to release the
# TPU, then runs, in order:
#   1. Mosaic legality micro-probes (fast attribution if anything fails)
#   2. megakernel smoke gates 1+2 (compile+run, rollout equivalence)
#   3. full smoke with timing: mega vs fused-2k vs full attention, bs 1
#   4. bench.py --quick sanity (trained checkpoints now present)
# Logs land in exp_result/r4/.  Only ONE process may touch the TPU.
set -u
cd /root/repo
LOG=exp_result/r4/r4b_queue.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "waiting for train queue to complete..."
while ! grep -q "QUEUE COMPLETE" /tmp/queue_r4.log 2>/dev/null; do
  sleep 60
done
# paranoia: wait for any straggler pretrain process to exit (exact PIDs
# are gone by now; the queue only logs COMPLETE after both runs return)
sleep 10
log "TPU free; starting mega validation"

log "1/6 probes"
timeout 900 python scripts/mega_probe.py \
  > exp_result/r4/mega_probe.log 2>&1
log "probes exit=$?"

log "2/6 smoke gates 1+2"
timeout 2400 python scripts/tpu_mega_smoke.py --skip-timing \
  > exp_result/r4/mega_smoke.log 2>&1
rc=$?
log "smoke exit=$rc"
if [ $rc -ne 0 ]; then
  log "smoke FAILED - skipping timing, still running bench sanity"
else
  log "3/6 timing A/B (bs 1, gen 200)"
  timeout 3600 python scripts/tpu_mega_smoke.py --gen 200 --prompt 128 \
    > exp_result/r4/mega_ab.log 2>&1
  log "timing exit=$?"
fi

log "4/6 bench --quick"
timeout 1800 python bench.py --quick \
  > exp_result/r4/bench_quick_r4b.log 2>&1
log "bench quick exit=$? $(tail -1 exp_result/r4/bench_quick_r4b.log | head -c 200)"

log "5/6 hybrid A/B at the bs-64 headline config (r2 baseline first)"
timeout 2400 python scripts/hybrid_ab.py \
  > exp_result/r4/hybrid_ab_r2.log 2>&1
log "r2 exit=$? $(tail -1 exp_result/r4/hybrid_ab_r2.log | head -c 200)"
log "6/6 hybrid A/B (NSA_HYBRID_DECODE=1)"
timeout 2400 env NSA_HYBRID_DECODE=1 python scripts/hybrid_ab.py \
  > exp_result/r4/hybrid_ab_on.log 2>&1
log "hybrid exit=$? $(tail -1 exp_result/r4/hybrid_ab_on.log | head -c 200)"
log "R4B QUEUE COMPLETE"
