#!/bin/bash
# A/B the fused augmentation chain (DNNCA_FUSEDAUG) and the bench's
# steps_per_call operating point on the real chip. Grants vary ~20%;
# compare only within one run of this script.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  env "$@" timeout 1700 python bench.py 2>/dev/null
}
# On-device parity first: a throughput win is meaningless if Mosaic
# miscompiles the fused kernel (CLAUDE.md flags its construct classes);
# abort the A/B when fused vs composed outputs diverge on this chip.
# (1800s: a fully cold relay compile of the composed chain alone was
# measured at 150s/case-path; 900s flaked on a cold morning relay.)
timeout 1800 python tools/chip_fusedaug_parity.py || exit 1
# SPC values must divide bench.py's short leg (STEPS/4 = 100).
run DNNCA_FUSEDAUG=0 BENCH_SPC=10
run DNNCA_FUSEDAUG=1 BENCH_SPC=10
run DNNCA_FUSEDAUG=1 BENCH_SPC=25
run DNNCA_FUSEDAUG=0 BENCH_SPC=25
