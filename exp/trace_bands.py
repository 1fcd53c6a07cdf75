"""Duration-band histogram of XLA Ops line + top fusions by family.

python exp/trace_bands.py /tmp/bench_trace4
"""

import sys
from collections import defaultdict

sys.path.insert(0, "exp")
from analyze_trace2 import load_xspace


def main():
    xs = load_xspace(sys.argv[1])
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            bands = defaultdict(lambda: [0, 0.0])  # band -> [count, ms]
            fam = defaultdict(lambda: [0, 0.0])
            for ev in line.events:
                us = ev.duration_ps / 1e6
                ms = ev.duration_ps / 1e9
                if us < 5:
                    b = "<5us"
                elif us < 20:
                    b = "5-20us"
                elif us < 50:
                    b = "20-50us"
                elif us < 200:
                    b = "50-200us"
                elif us < 1000:
                    b = "0.2-1ms"
                else:
                    b = ">1ms"
                bands[b][0] += 1
                bands[b][1] += ms
                name = meta.get(ev.metadata_id, "?")
                # family = op name up to first '.' / digits stripped
                base = name.split(" = ")[0].lstrip("%")
                base = "".join(ch for ch in base if not ch.isdigit()).rstrip(".")
                fam[base][0] += 1
                fam[base][1] += ms
            print("-- duration bands (per-iter = /30):")
            for b in ["<5us", "5-20us", "20-50us", "50-200us", "0.2-1ms", ">1ms"]:
                c, ms = bands[b]
                print(f"  {b:>9}: {c:6d} events  {ms:8.1f} ms total  {ms/30:6.2f} ms/iter")
            print("-- op families > 30ms total:")
            for name, (c, ms) in sorted(fam.items(), key=lambda kv: -kv[1][1])[:25]:
                print(f"  {ms:8.1f} ms ({ms/30:6.2f}/iter) x{c:<6d} {name}")


if __name__ == "__main__":
    main()
