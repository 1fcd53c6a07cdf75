"""Micro-bench: block-conv chain formulations on the real chip.

The profiled chain per full-res conv is fill -> [layout copies] -> halo gather
-> lax.conv -> [layout copies] -> take-back gather; the copies cost ~3 ms per
conv because XLA assigns conflicting layouts to the Pallas custom-call output
({2,1,0}), the conv operand ({4,0,3,2,1}), and the gather operand ({1,0}).

Variants measured here (serial-rep fit, data dependence between reps):
  A: current NDHWC formulation  [nb,8,8,8,C]
  B: transposed DHWNC formulation [8,8,8,nb,C] (halo take on axis 3), conv
     emits NDHWC for the take-back
  C: NDHWC conv but take-back directly from the conv's raw output (no reshape
     hint)

python exp/conv_chain_variants.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from pointcept_tpu.ops.block_conv import OFFS27, CENTER27, _slab

    nb, b3, c, n = 2432, 512, 64, 102400
    bsz, halo = 8, 1
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.standard_normal(((nb + 1) * b3, c)), jnp.bfloat16)
    nbr = jnp.asarray(
        np.clip(np.arange(nb + 1)[:, None] + rng.integers(-40, 40, (nb + 1, 27)), 0, nb),
        jnp.int32,
    )
    slot = jnp.asarray(rng.integers(0, nb * b3, (n,)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.05, jnp.bfloat16)

    def pin(x):
        # identity Pallas kernel: pins the producer layout to the custom-call
        # default ({2,1,0}/{1,0}), mimicking the real fill kernel's output.
        # Gridded over row-blocks so VMEM holds one block at a time.
        from jax.experimental import pallas as pl

        rows = x.shape[0]
        blk = b3  # one 8^3 block of rows per grid step
        assert rows % blk == 0

        def k(i_ref, o_ref):
            o_ref[:] = i_ref[:]

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, x.shape[1]), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((blk, x.shape[1]), lambda i: (i, 0)),
        )(x)

    def halo_expand_axis0(d5, nbr):  # d5 [nb+1,8,8,8,C]
        px = []
        for a in (-1, 0, 1):
            x0, x1 = _slab(a, bsz, halo)
            py = []
            for b in (-1, 0, 1):
                y0, y1 = _slab(b, bsz, halo)
                pz = []
                for cc in (-1, 0, 1):
                    z0, z1 = _slab(cc, bsz, halo)
                    if (a, b, cc) == (0, 0, 0):
                        pz.append(d5)
                        continue
                    k = OFFS27.index((a, b, cc))
                    pz.append(jnp.take(d5[:, x0:x1, y0:y1, z0:z1, :], nbr[:, k], axis=0))
                py.append(jnp.concatenate(pz, axis=3))
            px.append(jnp.concatenate(py, axis=2))
        return jnp.concatenate(px, axis=1)

    def halo_expand_axis3(d5t, nbr):  # d5t [8,8,8,nb+1,C]
        px = []
        for a in (-1, 0, 1):
            x0, x1 = _slab(a, bsz, halo)
            py = []
            for b in (-1, 0, 1):
                y0, y1 = _slab(b, bsz, halo)
                pz = []
                for cc in (-1, 0, 1):
                    z0, z1 = _slab(cc, bsz, halo)
                    if (a, b, cc) == (0, 0, 0):
                        pz.append(d5t)
                        continue
                    k = OFFS27.index((a, b, cc))
                    pz.append(jnp.take(d5t[x0:x1, y0:y1, z0:z1, :, :], nbr[:, k], axis=3))
                py.append(jnp.concatenate(pz, axis=2))
            px.append(jnp.concatenate(py, axis=1))
        return jnp.concatenate(px, axis=0)

    def chain_A(x):
        d = pin(x)
        d5 = d.reshape(nb + 1, bsz, bsz, bsz, c)
        hal = halo_expand_axis0(d5, nbr)
        out = jax.lax.conv_general_dilated(
            hal, w, (1, 1, 1), "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        )
        return jnp.take(out.reshape((nb + 1) * b3, c), slot, axis=0)

    def chain_B(x):
        d = pin(x)
        d5t = d.reshape(nb + 1, bsz, bsz, bsz, c).transpose(1, 2, 3, 0, 4)
        hal = halo_expand_axis3(d5t, nbr)
        out = jax.lax.conv_general_dilated(
            hal, w, (1, 1, 1), "VALID", dimension_numbers=("DHWNC", "DHWIO", "NDHWC")
        )
        return jnp.take(out.reshape((nb + 1) * b3, c), slot, axis=0)

    def pin_t(x):
        # identity Pallas kernel emitting the transposed [b3, nb+1, C] shape:
        # models a fill kernel whose out_spec writes straight into DHWNC order
        # (same data path, transposed out-DMA pattern)
        from jax.experimental import pallas as pl

        def k(i_ref, o_ref):
            o_ref[:] = i_ref[:].reshape(1, b3, c).transpose(1, 0, 2)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((b3, nb + 1, c), x.dtype),
            grid=(nb + 1,),
            in_specs=[pl.BlockSpec((b3, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((b3, 1, c), lambda i: (0, i, 0)),
        )(x)

    def chain_C(x):
        # fill emits [b3, nb+1, C] == DHWNC view; conv emits DHWNC too; flat
        # take-back uses slot' = local * (nb+1) + rank
        d5t = pin_t(x).reshape(bsz, bsz, bsz, nb + 1, c)
        hal = halo_expand_axis3(d5t, nbr)
        out = jax.lax.conv_general_dilated(
            hal, w, (1, 1, 1), "VALID", dimension_numbers=("DHWNC", "DHWIO", "DHWNC")
        )
        rank = slot // b3
        local = slot % b3
        slot_t = local * (nb + 1) + rank
        return jnp.take(out.reshape(b3 * (nb + 1), c), slot_t, axis=0)

    def rep(chain, x, r):
        def body(i, acc):
            return chain(acc[: (nb + 1) * b3].reshape((nb + 1) * b3 // b3 * b3, c) * 0 + x) \
                if False else acc
        # simple serial dependence: feed a perturbed input each rep
        y = x
        outs = None
        for i in range(r):
            outs = chain(y)
            y = y.at[:n].add(outs.astype(y.dtype) * 1e-6)
        return y

    for name, chain in [("A_ndhwc", chain_A), ("B_dhwnc", chain_B), ("C_fillT", chain_C)]:
        f1 = jax.jit(lambda x: rep(chain, x, 1))
        f9 = jax.jit(lambda x: rep(chain, x, 9))
        jax.block_until_ready(f1(dense)); jax.block_until_ready(f9(dense))
        t0 = time.perf_counter(); jax.block_until_ready(f1(dense)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(f9(dense)); t9 = time.perf_counter() - t0
        # numeric check vs A
        print(f"{name}: per-conv-chain {(t9 - t1) / 8 * 1000:.3f} ms", flush=True)

    ya = jax.jit(chain_A)(dense)
    yb = jax.jit(chain_B)(dense)
    yc = jax.jit(chain_C)(dense)
    print("max |A-B|:", float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))))
    print("max |A-C|:", float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yc.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
