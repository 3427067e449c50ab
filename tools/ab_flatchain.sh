#!/bin/bash
# Flatland chain kernel A/B on the real chip. Probes until the axon relay
# answers, then runs bench.py under three configs sequentially (never two
# compile-heavy processes at once — 1 vCPU):
#   A: flatchain off (current default path)
#   B: DNNCA_FLATCHAIN=1 im2col strategy (default)
#   C: DNNCA_FLATCHAIN=1 nine-dot strategy (DNNCA_FLATCHAIN_IM2COL=0)
# plus the standalone kernel microbench (proto_flatchain) at the three
# eligible level shapes. Log: /tmp/ab_flatchain.log
cd /root/repo
LOG=/tmp/ab_flatchain.log
: > "$LOG"
echo "[$(date +%H:%M:%S)] probing for TPU" >> "$LOG"
for i in $(seq 1 360); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('TPU_OK', float((x@x).sum()))" >> "$LOG" 2>/dev/null; then
    break
  fi
  sleep 50
done
if ! grep -q TPU_OK "$LOG"; then
  echo "[$(date +%H:%M:%S)] chip never came back" >> "$LOG"
  exit 1
fi
echo "[$(date +%H:%M:%S)] chip up; bench A (flatchain off)" >> "$LOG"
timeout 900 python bench.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] bench B (flatchain im2col)" >> "$LOG"
DNNCA_FLATCHAIN=1 timeout 900 python bench.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] bench C (flatchain nine-dot)" >> "$LOG"
DNNCA_FLATCHAIN=1 DNNCA_FLATCHAIN_IM2COL=0 timeout 900 python bench.py >> "$LOG" 2>&1
echo "[$(date +%H:%M:%S)] kernel microbench" >> "$LOG"
for shape in "--ci 6 --cm 12 --co 12 --H 64 --W 64" \
             "--ci 12 --cm 24 --co 24 --H 32 --W 32" \
             "--ci 24 --cm 12 --co 12 --H 64 --W 64"; do
  timeout 600 python tools/bench_flatchain.py $shape >> "$LOG" 2>&1
  DNNCA_FLATCHAIN_IM2COL=0 timeout 600 \
    python tools/bench_flatchain.py $shape >> "$LOG" 2>&1
done
echo "[$(date +%H:%M:%S)] DONE" >> "$LOG"
