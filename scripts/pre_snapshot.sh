#!/usr/bin/env bash
# Snapshot gate: refuse to tag/ship a tree whose test tiers are red.
#
# r3 shipped two red slow-tier tests because nothing gated the end-of-round
# snapshot (VERDICT r3 weak #4). Run this before any snapshot/tag; it runs
# the quick tier, then the slow tier, and exits nonzero on any failure.
#
# Measured tier runtimes on the 1-core build box (solo, no contention) are
# recorded in pytest.ini next to the markers.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== quick tier (everything not marked slow) =="
time python -m pytest tests/ -m "not slow" -q --no-header -x

echo "== slow tier (overfit/learning proofs, full-scale oracle parity) =="
time python -m pytest tests/ -m slow -q --no-header -x

echo "pre_snapshot: ALL GREEN"
