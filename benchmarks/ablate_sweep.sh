#!/bin/bash
# Ablation sweep at the current default tile: one FRESH process per leg
# (jit caches by traced structure, so MCGP_KERNEL_ABLATE must be set before
# the first trace). Feeds the runtime-share table in docs/KERNEL_DESIGN.md.
cd "$(dirname "$0")/.."
for leg in "" overtakes ot_chain ot_extract ot_decide grid; do
  echo "=== ablate='${leg}' ==="
  MCGP_KERNEL_ABLATE="$leg" timeout 900 python benchmarks/kernel_bench.py 2>&1 | tail -3
done
