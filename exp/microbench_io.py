"""Microbenchmarks for the host-geometry design decision:

1. H2D transfer bandwidth through the axon tunnel (jax.device_put of big arrays,
   async overlap).
2. Device gather/scatter rows/s: random vs sorted indices, narrow vs wide rows.
3. In-graph sort throughput reference.

Run on the TPU: python exp/microbench_io.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # ---- 1. H2D bandwidth
    for mb in (4, 16, 64):
        x = np.random.randint(0, 1 << 30, size=(mb * 1024 * 1024 // 4,), dtype=np.int32)
        t = timeit(lambda: jax.device_put(x, dev), n=5, warmup=1)
        print(f"H2D {mb:4d} MB: {t*1e3:8.2f} ms  -> {mb/t/1024:.2f} GB/s")

    # H2D overlap: can N puts be in flight concurrently?
    xs = [np.random.randint(0, 1 << 30, size=(16 * 1024 * 1024 // 4,), dtype=np.int32) for _ in range(4)]
    t0 = time.perf_counter()
    bufs = [jax.device_put(x, dev) for x in xs]
    jax.block_until_ready(bufs)
    t = time.perf_counter() - t0
    print(f"H2D 4x16 MB batched: {t*1e3:8.2f} ms -> {64/t/1024:.2f} GB/s")

    # ---- 2. gather rows/s
    n = 102400
    reps = 20
    for width in (1, 8, 32, 128):
        src = jnp.array(np.random.randn(n, width), jnp.float32)
        m = n * 27
        rnd = jnp.array(np.random.randint(0, n, size=(m,)), jnp.int32)
        srt = jnp.sort(rnd)

        def mk(idx):
            @jax.jit
            def f(src, idx):
                def body(i, acc):
                    g = jnp.take(src, idx, axis=0)
                    return acc + g[0, 0] + g[-1, -1]
                return jax.lax.fori_loop(0, reps, body, 0.0)
            return lambda: f(src, idx)

        tr = timeit(mk(rnd), n=3, warmup=1) / reps
        ts = timeit(mk(srt), n=3, warmup=1) / reps
        print(f"gather w={width:4d}: random {m/tr/1e6:8.1f} Mrows/s ({m*width*4/tr/2**30:7.1f} GB/s) | sorted {m/ts/1e6:8.1f} Mrows/s")

    # ---- 3. scatter rows/s (int32 payload, like the map build)
    m = 102400 * 27
    vals = jnp.array(np.random.randint(0, n, size=(m,)), jnp.int32)
    rnd = jnp.array(np.random.permutation(m), jnp.int32)
    srt = jnp.arange(m, dtype=jnp.int32)  # fully sequential

    def mk_scatter(idx):
        @jax.jit
        def f(vals, idx):
            def body(i, acc):
                out = jnp.zeros((m,), jnp.int32).at[idx].set(vals + i)
                return acc + out[0] + out[-1]
            return jax.lax.fori_loop(0, reps, body, 0)
        return lambda: f(vals, idx)

    tr = timeit(mk_scatter(rnd), n=3, warmup=1) / reps
    ts = timeit(mk_scatter(srt), n=3, warmup=1) / reps
    print(f"scatter int32: random {m/tr/1e6:8.1f} Mrows/s | sequential {m/ts/1e6:8.1f} Mrows/s")

    # ---- 4. sort reference
    k1 = jnp.array(np.random.randint(0, 1 << 30, size=(m,)), jnp.int32)
    k2 = jnp.array(np.random.randint(0, 1 << 30, size=(m,)), jnp.int32)
    p = jnp.arange(m, dtype=jnp.int32)

    @jax.jit
    def srt3(k1, k2, p):
        def body(i, acc):
            a, b, c = jax.lax.sort((k1 + i, k2, p), num_keys=2, is_stable=False)
            return acc + a[0] + c[-1]
        return jax.lax.fori_loop(0, reps, body, 0)

    t = timeit(lambda: srt3(k1, k2, p), n=3, warmup=1) / reps
    print(f"sort 2key+payload {m} rows: {t*1e3:.2f} ms -> {m/t/1e6:.1f} Mrows/s")


if __name__ == "__main__":
    main()
