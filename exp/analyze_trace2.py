"""Per-line xplane aggregation: separates the module line, the sync op line,
and async-activity lines so async copy spans don't pollute op self-time.

python exp/analyze_trace2.py /tmp/bench_trace [line_filter] [top_n]
"""

import glob
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


def bucket_of(name: str) -> str:
    n = name.lower()
    if "sort" in n:
        return "sort"
    if "gather" in n or "dynamic-slice" in n or "dynamicslice" in n or "slice" in n:
        return "gather/slice"
    if "scatter" in n or "dynamic-update" in n:
        return "scatter"
    if "conv" in n and "convert" not in n:
        return "conv"
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n or "attn" in n or "cpe_conv" in n or "stem_conv" in n:
        return "pallas/custom"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n:
        return "reduce"
    return "other"


def main():
    trace_dir = sys.argv[1]
    line_filter = sys.argv[2] if len(sys.argv) > 2 else None
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    xs = load_xspace(trace_dir)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            totals = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9
                counts[name] += 1
            if not totals:
                continue
            grand = sum(totals.values())
            print(f"\n-- line: {line.name!r}  total {grand:.1f} ms, {sum(counts.values())} events")
            if line_filter:
                for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
                    print(f"{ms:10.2f} ms {100*ms/grand:5.1f}% x{counts[name]:<5d} {name[:150]}")
                buckets = defaultdict(float)
                for name, ms in totals.items():
                    buckets[bucket_of(name)] += ms
                print("   buckets:")
                for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
                    print(f"{ms:12.2f} ms {100*ms/grand:5.1f}%  {b}")


if __name__ == "__main__":
    main()
