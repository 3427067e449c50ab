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
run DNNCA_FUSEDAUG=0 BENCH_SPC=10
run DNNCA_FUSEDAUG=1 BENCH_SPC=10
run DNNCA_FUSEDAUG=1 BENCH_SPC=40
run DNNCA_FUSEDAUG=0 BENCH_SPC=40
