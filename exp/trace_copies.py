"""Aggregate copy + fusion events by output shape signature.

python exp/trace_copies.py /tmp/bench_trace4 [family]
"""

import re
import sys
from collections import defaultdict

sys.path.insert(0, "exp")
from analyze_trace2 import load_xspace


def main():
    xs = load_xspace(sys.argv[1])
    family = sys.argv[2] if len(sys.argv) > 2 else "copy"
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(lambda: [0, 0.0])
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                base = name.split(" = ")[0].lstrip("%")
                basefam = "".join(ch for ch in base if not ch.isdigit()).rstrip(".")
                if basefam != family:
                    continue
                m = re.search(r"= ([a-z0-9\[\],(){}:ST_ ]+?) " + family.split("_")[0], name)
                sig = m.group(1) if m else name[:80]
                agg[sig][0] += 1
                agg[sig][1] += ev.duration_ps / 1e9
            print(f"-- {family} by output signature (ms/iter = /30):")
            for sig, (c, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]:
                print(f"  {ms/30:7.3f} ms/iter x{c//30:<4d} {sig[:110]}")


if __name__ == "__main__":
    main()
