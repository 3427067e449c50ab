#!/bin/bash
# A/B the warp-bank augmentation path (DNNCA_WARPBANK) on the real chip.
# Grants vary ~20%; compare only within one run of this script.
#
# The banked path is pure XLA (gather + mirror selects + the existing
# upsample/resample tail) -- no new Mosaic kernel -- but run the bank test
# file on-device first anyway: a throughput win is meaningless if the
# gathered fields are wrong on this backend.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  env "$@" timeout 1700 python bench.py 2>/dev/null
}
timeout 1800 python -m pytest tests/test_warp_bank.py -x -q || exit 1
run DNNCA_WARPBANK=0 BENCH_SPC=10
run DNNCA_WARPBANK=1 BENCH_SPC=10
run DNNCA_WARPBANK=1 BENCH_SPC=25
run DNNCA_WARPBANK=0 BENCH_SPC=25
