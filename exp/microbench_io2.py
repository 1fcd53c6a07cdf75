"""Honest microbenchmarks: CSE-proof gather/scatter, H2D paths, overlap.

python exp/microbench_io2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    n = 102400
    reps = 10

    # ---- gather rows/s, index varies per iteration (CSE-proof)
    for width in (8, 32, 128):
        src = jnp.array(np.random.randn(n, width), jnp.float32)
        m = n * 27
        rnd = jnp.array(np.random.randint(0, n - reps, size=(m,)), jnp.int32)
        srt = jnp.sort(rnd)

        def mk(idx):
            @jax.jit
            def f(src, idx):
                def body(i, acc):
                    g = jnp.take(src, idx + i, axis=0)
                    return acc + g.sum()
                return jax.lax.fori_loop(0, reps, body, 0.0)
            return lambda: f(src, idx)

        tr = timeit(mk(rnd)) / reps
        ts = timeit(mk(srt)) / reps
        print(f"gather w={width:4d}: random {m/tr/1e6:8.1f} Mrows/s ({m*width*4/tr/2**30:7.1f} GB/s) | near-sorted {m/ts/1e6:8.1f} Mrows/s")

    # bf16 gather
    src = jnp.array(np.random.randn(n, 32), jnp.bfloat16)
    m = n * 27
    rnd = jnp.array(np.random.randint(0, n - reps, size=(m,)), jnp.int32)
    @jax.jit
    def fbf(src, idx):
        def body(i, acc):
            return acc + jnp.take(src, idx + i, axis=0).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.bfloat16(0))
    t = timeit(lambda: fbf(src, rnd)) / reps
    print(f"gather w=32 bf16: random {m/t/1e6:8.1f} Mrows/s ({m*32*2/t/2**30:7.1f} GB/s)")

    # ---- scatter int32 (set), destination varies
    m2 = n * 27
    vals = jnp.array(np.random.randint(0, n, size=(m2,)), jnp.int32)
    rnd_d = jnp.array(np.random.permutation(m2), jnp.int32)

    @jax.jit
    def fsc(vals, idx):
        def body(i, acc):
            out = jnp.zeros((m2,), jnp.int32).at[(idx + i * 7919) % m2].set(vals)
            return acc + out[0] + out[-1]
        return jax.lax.fori_loop(0, reps, body, 0)

    t = timeit(lambda: fsc(vals, rnd_d)) / reps
    print(f"scatter int32 random: {m2/t/1e6:8.1f} Mrows/s")

    # ---- H2D paths
    x16 = np.random.randint(0, 1 << 30, size=(16 * 1024 * 1024 // 4,), dtype=np.int32)
    t = timeit(lambda: jax.device_put(x16, dev), n=4)
    print(f"H2D device_put 16MB int32: {t*1e3:7.1f} ms -> {16/1024/t:.2f} GB/s")
    x16_16 = x16.astype(np.int16)
    t = timeit(lambda: jax.device_put(x16_16, dev), n=4)
    print(f"H2D device_put  8MB int16: {t*1e3:7.1f} ms -> {8/1024/t:.2f} GB/s")

    @jax.jit
    def consume(a):
        return a.sum()

    t = timeit(lambda: consume(x16), n=4)
    print(f"H2D via jit arg 16MB: {t*1e3:7.1f} ms")

    # ---- overlap: long device compute + concurrent device_put
    big = jnp.array(np.random.randn(4096, 4096), jnp.float32)

    @jax.jit
    def heavy(a):
        def body(i, x):
            return x @ a / jnp.float32(64.0)
        return jax.lax.fori_loop(0, 60, body, a)

    t_heavy = timeit(lambda: heavy(big))
    print(f"heavy compute alone: {t_heavy*1e3:.1f} ms")
    t_put = timeit(lambda: jax.device_put(x16, dev), n=4)

    def overlapped():
        r = heavy(big)  # async dispatch
        b = jax.device_put(x16, dev)
        jax.block_until_ready((r, b))

    t_both = timeit(overlapped)
    print(f"put alone {t_put*1e3:.1f} ms; heavy+put overlapped: {t_both*1e3:.1f} ms "
          f"(serial would be {(t_heavy+t_put)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
