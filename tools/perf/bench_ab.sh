#!/usr/bin/env bash
# A/B matrix for the r3 bench regression (VERDICT r4 ask #2): fused-vs-lax
# block conv x scene_blocked on/off, on the real TPU. Writes one JSON line per
# cell to docs/ab_results.jsonl (appended, with the knob values).
set -u
cd "$(dirname "$0")/../.."
out=docs/ab_results.jsonl
for lax in 0 1; do
  for sb in 0 1; do
    echo "=== BLOCK_CONV_LAX=$lax BENCH_SCENE_BLOCKED=$sb ==="
    line=$(BENCH_TESTER=0 BLOCK_CONV_LAX=$lax BENCH_SCENE_BLOCKED=$sb timeout 900 python bench.py 2>/dev/null | tail -1)
    echo "{\"lax\": $lax, \"scene_blocked\": $sb, \"result\": $line}" | tee -a "$out"
  done
done
