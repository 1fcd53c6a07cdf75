"""Per-step op cost table from a bench xplane trace (BENCH_PROFILE=dir).

Aggregates the sync 'XLA Ops' line, drops the outer while/module wrappers,
divides by the executed step count, and prints every op >= min_ms, annotated
with a coarse category guessed from the HLO text.

python tools/perf/step_table.py /tmp/trace_dir [steps=30] [min_ms=0.3]
"""

import glob
import re
import sys
from collections import defaultdict


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def classify(name: str) -> str:
    n = name
    if n.startswith("%while") or "jit_" in n:
        return "WRAPPER"
    if "custom-call" in n:
        m = re.match(r"%(\w+?)[.\d]*\s*=", n)
        return f"pallas:{m.group(1) if m else '?'}"
    if re.search(r"%(copy|transpose|bitcast)[.\d]* =", n):
        return "layout-copy"
    if "%sort" in n.split("=")[0]:
        return "sort"
    if "convolution" in n or re.search(r"fusion\(bf16\[\d,\d,\d,\d+,\d+\]", n):
        return "conv"
    m = re.search(r"= \S*\[([\d,]*)\]", n)
    return "fusion/other"


def main():
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    min_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    xs = load_xspace(trace_dir)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            totals = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9
                counts[name] += 1
            rows = []
            cats = defaultdict(float)
            grand = 0.0
            for name, ms in totals.items():
                cat = classify(name)
                if cat == "WRAPPER":
                    continue
                per_step = ms / steps
                grand += per_step
                cats[cat] += per_step
                if per_step >= min_ms:
                    rows.append((per_step, counts[name], cat, name))
            rows.sort(reverse=True)
            print(f"== per-step total {grand:.1f} ms over {steps} steps ==")
            for per_step, cnt, cat, name in rows:
                print(f"{per_step:8.2f} ms  {cat:<16} {name[:180]}")
            print("\n-- categories (ms/step) --")
            for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"{ms:10.2f}  {100*ms/grand:5.1f}%  {cat}")


if __name__ == "__main__":
    main()
