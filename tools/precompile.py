"""Warm the persistent XLA compile cache for the driver-visible surfaces.

The axon remote-compile path costs 45-120 s per kernel cold; this compiles
(1) the single-chip entry forward, (2) the 8-virtual-device multichip train
step (CPU platform, separate process), so subsequent driver checks and bench
runs start hot.

python tools/precompile.py [--skip-entry] [--skip-multichip]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-entry", action="store_true")
    parser.add_argument("--skip-multichip", action="store_true")
    args = parser.parse_args()

    if not args.skip_multichip:
        # separate process: platform forcing must precede jax backend init
        t0 = time.time()
        subprocess.run(
            [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            cwd=REPO, check=True,
        )
        print(f"multichip dryrun warm in {time.time() - t0:.0f}s")

    if not args.skip_entry:
        import jax

        import __graft_entry__ as g

        t0 = time.time()
        fn, a = g.entry()
        out = jax.jit(fn)(*a)
        jax.block_until_ready(out)
        print(f"entry forward warm in {time.time() - t0:.0f}s: {out.shape}")


if __name__ == "__main__":
    main()
