"""Aggregate a jax.profiler xplane trace into per-op totals.

python exp/analyze_trace.py /tmp/bench_trace [top_n]
"""

import glob
import sys
from collections import defaultdict


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = load_xspace(trace_dir)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        meta = {m.id: m.name for m in plane.event_metadata.values()} if hasattr(
            plane.event_metadata, "values"
        ) else {k: v.name for k, v in plane.event_metadata.items()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        grand = sum(totals.values())
        print(f"total device time: {grand:.1f} ms over {sum(counts.values())} events")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{ms:10.2f} ms {100 * ms / max(grand, 1e-9):5.1f}%  x{counts[name]:<5d} {name[:140]}")

        # bucket by op family
        buckets = defaultdict(float)
        for name, ms in totals.items():
            n = name.lower()
            if "sort" in n:
                b = "sort"
            elif "gather" in n or "dynamic-slice" in n or "dynamicslice" in n:
                b = "gather/slice"
            elif "scatter" in n or "dynamic-update" in n:
                b = "scatter"
            elif "conv" in n:
                b = "conv"
            elif "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
                b = "pallas/custom"
            elif "dot" in n or "einsum" in n or "matmul" in n:
                b = "matmul"
            elif "fusion" in n:
                b = "fusion(elementwise/mixed)"
            elif "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
                b = "layout/copy"
            elif "reduce" in n:
                b = "reduce"
            else:
                b = "other"
            buckets[b] += ms
        print("\n-- buckets --")
        for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"{ms:10.2f} ms {100 * ms / max(grand, 1e-9):5.1f}%  {b}")


if __name__ == "__main__":
    main()
