#!/bin/bash
# Stage-2 chip work queue: waits for the flatchain A/B watcher
# (tools/ab_flatchain.sh -> /tmp/ab_flatchain.log DONE marker) so two
# compile-heavy processes never overlap (1 vCPU), then runs:
#   1. Pallas tconv microbench vs XLA at the unet_big decoder shapes
#   2. region-metric eval timing at the PR-curve operating point
#      (batch 64 x 100 thresholds x 256^2) with the int8 one-hot path
# Log: /tmp/chip_queue2.log
cd /root/repo
LOG=/tmp/chip_queue2.log
: > "$LOG"
echo "[$(date +%H:%M:%S)] waiting for ab_flatchain DONE" >> "$LOG"
for i in $(seq 1 720); do
  if grep -q "DONE\|chip never came back" /tmp/ab_flatchain.log 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q DONE /tmp/ab_flatchain.log 2>/dev/null; then
  # chip never granted to stage 1; probe once ourselves before giving up
  if ! timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('TPU_OK', float((x@x).sum()))" >> "$LOG" 2>/dev/null; then
    echo "[$(date +%H:%M:%S)] no chip; aborting stage 2" >> "$LOG"
    exit 1
  fi
fi
echo "[$(date +%H:%M:%S)] tconv microbench" >> "$LOG"
timeout 1200 python tools/proto_tconv.py --bench >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] pool microbench" >> "$LOG"
timeout 1200 python tools/bench_pool.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] region eval timing" >> "$LOG"
timeout 1800 python tools/bench_region_eval.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] unet_big step A/B (tconv+pool kernels)" >> "$LOG"
timeout 1200 python tools/profile_step.py --model big --batch 8 --steps 30 >> "$LOG" 2>&1
DNNCA_PTCONV=1 DNNCA_PPOOL=1 timeout 1200 python tools/profile_step.py --model big --batch 8 --steps 30 >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] small-model trace (resident-pool relayout check)" >> "$LOG"
timeout 1200 python tools/profile_step.py --model small --batch 8 --steps 10 >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] STAGE2 DONE" >> "$LOG"
