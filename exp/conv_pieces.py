"""Per-piece timing of the block-conv chain + block-size variants.

Times fill / halo / conv / take-back cumulatively at full resolution for
B=8 (current) and B=4 blocks, C=32/64, on the real chip.

python exp/conv_pieces.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from pointcept_tpu.ops.block_conv import _halo_expand
    from pointcept_tpu.ops.pallas.block_fill import block_fill_pallas

    n = 102400

    def run_case(bb, nb, c, label):
        b3 = (1 << bb) ** 3
        bsz = 1 << bb
        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.standard_normal((n, c)), jnp.bfloat16)
        # contiguous member windows
        counts = rng.integers(max(1, n // nb - 8), min(b3, n // nb + 8), nb)
        starts_np = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        rc = np.full((n,), -1, np.int32)
        for b in range(nb):
            s, cnt = starts_np[b], min(int(counts[b]), b3, n - int(starts_np[b]))
            if cnt <= 0:
                break
            rc[s : s + cnt] = b * b3 + rng.choice(b3, cnt, replace=False)
        starts = jnp.asarray(starts_np)
        rc = jnp.asarray(rc)
        nbr = jnp.asarray(
            np.clip(np.arange(nb + 1)[:, None] + rng.integers(-40, 40, (nb + 1, 27)), 0, nb),
            jnp.int32,
        )
        slot = jnp.asarray(rng.integers(0, nb * b3, (n,)), jnp.int32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.05, jnp.bfloat16)

        def fill(x):
            return block_fill_pallas(x, rc, starts, b3)

        def halo(x):
            d = fill(x).reshape(nb + 1, bsz, bsz, bsz, c)
            return _halo_expand(d, nbr, 1)

        def conv(x):
            h = halo(x)
            return jax.lax.conv_general_dilated(
                h, w, (1, 1, 1), "VALID", dimension_numbers=("NDHWC", "NDHWC"[:0] + "DHWIO", "NDHWC")
            )

        def full(x):
            out = conv(x).reshape((nb + 1) * b3, c)
            return jnp.take(out, slot, axis=0)

        def timed(f, reps=20):
            jf = jax.jit(lambda x: f(x))
            y = jax.block_until_ready(jf(feat))
            t0 = time.perf_counter()
            for _ in range(reps):
                y = jf(feat)
            jax.block_until_ready(y)
            return (time.perf_counter() - t0) / reps * 1000

        tf = timed(fill)
        th = timed(halo)
        tc = timed(conv)
        tt = timed(full)
        print(
            f"{label}: fill {tf:.2f}  +halo {th - tf:.2f}  +conv {tc - th:.2f}  "
            f"+takeback {tt - tc:.2f}  total {tt:.2f} ms",
            flush=True,
        )

    run_case(3, 2432, 64, "B8 C64 nb2432")
    run_case(3, 2432, 32, "B8 C32 nb2432")
    run_case(2, 8448, 64, "B4 C64 nb8448")
    run_case(2, 8448, 32, "B4 C32 nb8448")


if __name__ == "__main__":
    main()
