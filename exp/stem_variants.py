"""Stem-conv (k5, halo2, Cin=6, B=4 blocks) layout variants, honestly timed.

Timing: ONE jitted fn per variant with a dynamic fori_loop trip count and a
fold-proof inter-iteration dependence (min(|carry|*1e-30, 0) added to inputs),
so XLA can neither dedup nor hoist. Device ms = (t(n2)-t(n1))/(n2-n1).

Variants:
  v0_current   fill -> 27-region 5D halo -> 3D conv NDHWC -> takeback
  v1_zfold     fill -> [nb,4,4,24] (z,c folded) -> 9-column halo with
               channel-concat z pieces -> 2D conv [5,5,48,128] -> takeback
               (banded weights: exact same math, ~1.6x redundant FLOPs)
  v2_flatrow   fill -> halo regions gathered as flattened [nb, x*y*z*c] rows
               (forces row-major gathers) -> 3D conv -> takeback

python exp/stem_variants.py
"""

import functools
import os
import sys
import time

print_ = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 409600
NB = 37256
BB = 2
BSZ = 4
B3 = 64
CIN = 6
COUT = 32
K = 5
HALO = 2


def make_inputs():
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((N, CIN)).astype(np.float32)
    counts = rng.integers(max(1, N // NB - 6), min(B3, N // NB + 6), NB)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    rc = np.full((N,), -1, np.int32)
    for b in range(NB):
        s, cnt = int(starts[b]), min(int(counts[b]), B3, N - int(starts[b]))
        if cnt <= 0:
            break
        rc[s : s + cnt] = b * B3 + rng.choice(B3, cnt, replace=False)
    nbr = np.clip(np.arange(NB + 1)[:, None] + rng.integers(-40, 40, (NB + 1, 27)), 0, NB).astype(np.int32)
    slot = rng.integers(0, NB * B3, (N,)).astype(np.int32)
    w3 = (rng.standard_normal((K, K, K, CIN, COUT)) * 0.05).astype(np.float32)
    return feat, rc, starts, nbr, slot, w3


def main():
    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from pointcept_tpu.ops.block_conv import _halo_expand, OFFS27
    from pointcept_tpu.ops.pallas.block_fill import block_fill_pallas

    feat, rc, starts, nbr, slot, w3 = map(jnp.asarray, make_inputs())
    w3 = w3.astype(jnp.bfloat16)

    # folded 2D weights: W2[kx,ky, zi*CIN+ci, zo*COUT+co] = W3[kx,ky,zi-zo,ci,co]
    w2_np = np.zeros((K, K, (BSZ + 2 * HALO) * 0 + 8 * CIN // 1, BSZ * COUT), np.float32)
    w2_np = np.zeros((K, K, (BSZ + 2 * HALO) * CIN, BSZ * COUT), np.float32)
    w3_np = np.asarray(w3, np.float32)
    for zo in range(BSZ):
        for zi in range(BSZ + 2 * HALO):
            kz = zi - zo
            if 0 <= kz < K:
                w2_np[:, :, zi * CIN : (zi + 1) * CIN, zo * COUT : (zo + 1) * COUT] = w3_np[:, :, kz]
    w2 = jnp.asarray(w2_np, jnp.bfloat16)

    def fill(x):
        return block_fill_pallas(x.astype(jnp.bfloat16), rc, starts, B3)

    def v0_current(x):
        d = fill(x)
        nrows = d.shape[0] // B3
        d = d.reshape(nrows, BSZ, BSZ, BSZ, CIN)
        nbr_ext = jnp.concatenate([nbr, jnp.full((nrows - NB - 1, 27), NB, jnp.int32)], 0) if nrows > NB + 1 else nbr[:nrows]
        h = _halo_expand(d, nbr_ext, HALO)
        out = jax.lax.conv_general_dilated(h, w3, (1, 1, 1), "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.take(out.reshape(nrows * B3, COUT), slot, axis=0)

    def _slab2(a):
        if a == -1:
            return BSZ - HALO, BSZ
        if a == 0:
            return 0, BSZ
        return 0, HALO

    def v1_zfold(x):
        d = fill(x)
        nrows = d.shape[0] // B3
        dz = d.reshape(nrows, BSZ, BSZ, BSZ * CIN)  # (z,c) folded into lanes
        nbr_ext = jnp.concatenate([nbr, jnp.full((nrows - NB - 1, 27), NB, jnp.int32)], 0) if nrows > NB + 1 else nbr[:nrows]
        cols_x = []
        for a in (-1, 0, 1):
            x0, x1 = _slab2(a)
            cols_y = []
            for b in (-1, 0, 1):
                y0, y1 = _slab2(b)
                zpieces = []
                for c in (-1, 0, 1):
                    k = OFFS27.index((a, b, c))
                    zc0, zc1 = _slab2(c)
                    sub = dz[:, x0:x1, y0:y1, zc0 * CIN : zc1 * CIN]
                    if (a, b, c) == (0, 0, 0):
                        zpieces.append(sub)
                    else:
                        zpieces.append(jnp.take(sub, nbr_ext[:, k], axis=0))
                cols_y.append(jnp.concatenate(zpieces, axis=3))
            cols_x.append(jnp.concatenate(cols_y, axis=2))
        h = jnp.concatenate(cols_x, axis=1)  # [nrows, 8, 8, 48]
        out = jax.lax.conv_general_dilated(h, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.take(out.reshape(nrows * B3, COUT), slot, axis=0)

    def v2_flatrow(x):
        d = fill(x)
        nrows = d.shape[0] // B3
        d5 = d.reshape(nrows, BSZ, BSZ, BSZ, CIN)
        nbr_ext = jnp.concatenate([nbr, jnp.full((nrows - NB - 1, 27), NB, jnp.int32)], 0) if nrows > NB + 1 else nbr[:nrows]
        pieces_x = []
        for a in (-1, 0, 1):
            x0, x1 = _slab2(a)
            pieces_y = []
            for b in (-1, 0, 1):
                y0, y1 = _slab2(b)
                pieces_z = []
                for c in (-1, 0, 1):
                    z0, z1 = _slab2(c)
                    if (a, b, c) == (0, 0, 0):
                        pieces_z.append(d5)
                        continue
                    k = OFFS27.index((a, b, c))
                    sub = d5[:, x0:x1, y0:y1, z0:z1, :]
                    shp = sub.shape
                    flat = sub.reshape(shp[0], -1)
                    src = jnp.take(flat, nbr_ext[:, k], axis=0).reshape((nrows,) + shp[1:])
                    pieces_z.append(src)
                pieces_y.append(jnp.concatenate(pieces_z, axis=3))
            pieces_x.append(jnp.concatenate(pieces_y, axis=2))
        h = jnp.concatenate(pieces_x, axis=1)
        out = jax.lax.conv_general_dilated(h, w3, (1, 1, 1), "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.take(out.reshape(nrows * B3, COUT), slot, axis=0)


    def v3_zfold_flat(x):
        d = fill(x)
        nrows = d.shape[0] // B3
        dz = d.reshape(nrows, BSZ, BSZ, BSZ * CIN)
        nbr_ext = jnp.concatenate([nbr, jnp.full((nrows - NB - 1, 27), NB, jnp.int32)], 0) if nrows > NB + 1 else nbr[:nrows]
        cols_x = []
        for a in (-1, 0, 1):
            x0, x1 = _slab2(a)
            cols_y = []
            for b in (-1, 0, 1):
                y0, y1 = _slab2(b)
                zpieces = []
                for c in (-1, 0, 1):
                    k = OFFS27.index((a, b, c))
                    zc0, zc1 = _slab2(c)
                    sub = dz[:, x0:x1, y0:y1, zc0 * CIN : zc1 * CIN]
                    if (a, b, c) == (0, 0, 0):
                        zpieces.append(sub)
                    else:
                        shp = sub.shape
                        flat = sub.reshape(shp[0], -1)
                        zpieces.append(jnp.take(flat, nbr_ext[:, k], axis=0).reshape(shp))
                cols_y.append(jnp.concatenate(zpieces, axis=3))
            cols_x.append(jnp.concatenate(cols_y, axis=2))
        h = jnp.concatenate(cols_x, axis=1)
        out = jax.lax.conv_general_dilated(h, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.take(out.reshape(nrows * B3, COUT), slot, axis=0)

    import jax

    def timed(f, name):
        import jax.numpy as jnp

        @jax.jit
        def run(x, n):
            def body(i, carry):
                z = jnp.minimum(jnp.abs(carry) * 1e-30, 0.0)
                y = f(x + z.astype(x.dtype))
                return y.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        print_(f"compiling {name}...")
        jax.block_until_ready(run(feat, 1))
        ts = {}
        for n in (1, 9):
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(run(feat, n))
            ts[n] = (time.perf_counter() - t0) / 3 * 1e3
        ms = (ts[9] - ts[1]) / 8
        print_(f"{name}: {ms:.2f} ms/conv (t1={ts[1]:.1f} t9={ts[9]:.1f})")
        return ms

    # correctness cross-check first (v1 must equal v0)
    y0 = v0_current(feat)
    y1 = v1_zfold(feat)
    y2 = v2_flatrow(feat)
    print_(f"v1 max|diff| = {float(jnp.max(jnp.abs(y0 - y1))):.6f}")
    print_(f"v2 max|diff| = {float(jnp.max(jnp.abs(y0 - y2))):.6f}")

    y3 = v3_zfold_flat(feat)
    print_(f"v3 max|diff| = {float(jnp.max(jnp.abs(y0 - y3))):.6f}")
    timed(v3_zfold_flat, "v3_zfold_flat")
    timed(v2_flatrow, "v2_flatrow")


if __name__ == "__main__":
    main()
