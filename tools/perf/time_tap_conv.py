"""Standalone TPU timing for the fused tap-conv kernel at bench stage shapes.

Usage: python tools/perf/time_tap_conv.py [stage ...]
Stages default to the B=4 ScanNet bench geometry (bench.py). Prints compile
time and steady-state ms per call for tap_conv at each (R, b, k, Cin, Cout).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_tpu.ops.pallas.tap_conv import tap_conv, _plan

STAGES = {
    "stem": (37248, 4, 5, 6, 32),
    "s0": (37248, 4, 3, 32, 32),
    "s1": (9560, 4, 3, 64, 64),
    "s2": (2392, 4, 3, 128, 128),
    "s3": (600, 4, 3, 256, 256),
    "s4": (152, 4, 3, 512, 512),
}


def main():
    names = sys.argv[1:] or list(STAGES)
    rng = np.random.RandomState(0)
    for name in names:
        r, b, k, cin, cout = STAGES[name]
        hsz = b + k - 1
        dt = jnp.bfloat16
        halo = jnp.asarray(rng.randn(r, hsz**3 * cin), dt)
        w = jnp.asarray(rng.randn(k**3, cin, cout) * 0.1, dt)
        plan = _plan(b, k, cin, cout, 2)
        fn = jax.jit(lambda h, w: tap_conv(h, w, b, k, cin))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(halo, w))
        t_compile = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(halo, w)
        jax.block_until_ready(out)
        dt_ms = (time.perf_counter() - t0) / iters * 1e3
        flops = 2 * r * b**3 * k**3 * cin * cout
        print(
            f"{name}: R={r} b={b} k={k} {cin}->{cout} plan={plan} "
            f"compile={t_compile:.1f}s steady={dt_ms:.2f}ms "
            f"eff={flops / (dt_ms * 1e-3) / 1e12:.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
