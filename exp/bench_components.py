"""Fresh component timings on the real chip (serial-dependence in-graph reps).

Times the candidate on-device geometry pieces for the block-dense design:
  1. 4-order curve encode + sort at N=102400
  2. pooling run-detection + cluster scatters
  3. patch partition vector math
  4. block-dense SubM k5 conv (scatter -> halo gather -> lax.conv -> gather)
  5. sort-merge k5 neighbor map (current approach, for comparison)

python exp/bench_components.py
"""

import time
from functools import partial
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from pointcept_tpu.ops import serialization as ser
    from pointcept_tpu.ops.sparse_conv import build_subm_neighbor_map

    dev = jax.devices()[0]
    print("device:", dev)
    N, depth = 102400, 10
    rng = np.random.RandomState(0)

    # synthetic surface-like scene: points on a smooth heightfield
    from bench import synthetic_batch

    arrays = synthetic_batch(N, 1, seed=0)
    grid = jnp.asarray(arrays["grid_coord"])
    batch = jnp.asarray(arrays["batch"])
    feat = jnp.asarray(arrays["feat"])
    kb = jnp.where(batch >= 0, batch, ser.BATCH_SENTINEL).astype(jnp.int32)
    mask = batch >= 0

    def timed(name, fn, *args, reps=10):
        f = jax.jit(fn)
        r = f(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:42s} {min(ts)*1e3:9.2f} ms")
        return min(ts)

    # 1. encode+sort, 4 orders, with serial dep through grid
    def serialize4(grid, kb):
        out = 0
        g = grid
        for o in ("z", "z-trans", "hilbert", "hilbert-trans"):
            keys = ser.encode(g, kb, depth, o)
            order = ser.argsort_keys(keys)
            inv = ser.invert_order(order)
            out = out + order[0] + inv[-1]
            g = g + (out % 2)  # serial dependence, no effect on cost
        return out

    timed("serialize: 4x (encode+sort+invert)", serialize4, grid, kb)

    def serialize1(grid, kb):
        keys = ser.encode(grid, kb, depth, "z")
        order = ser.argsort_keys(keys)
        return order

    timed("serialize: 1x z (encode+sort)", serialize1, grid, kb)

    # single-operand int32 sort (depth 10 packs into 32 bits + batch 2 bits)
    def sort_packed(grid, kb):
        hi, lo = ser.morton_encode_pair(grid[:, 0], grid[:, 1], grid[:, 2], depth)
        key = (kb << 30) | lo
        iota = jnp.arange(N, dtype=jnp.int32)
        k, v = jax.lax.sort((key, iota), num_keys=1, is_stable=False)
        return v

    timed("sort: single int32 key + payload", sort_packed, grid, kb)

    # 2. pooling run-detect on a sorted order
    keys0 = ser.encode(grid, kb, depth, "z")
    order0 = ser.argsort_keys(keys0)

    def pool_cluster(keys, order0, mask):
        m = 35840
        sk = ser.key_shift_right(keys, 3)[order0]
        valid = mask[order0]
        prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
        head = valid & ~prev_eq
        cs = jnp.cumsum(head.astype(jnp.int32)) - 1
        cl = jnp.where(valid & (cs < m), cs, m)
        cluster_of_point = jnp.full((N,), m, jnp.int32).at[order0].set(cl)
        return cluster_of_point

    timed("pooling: run-detect + cluster scatter", pool_cluster, keys0, order0, mask)

    # 3. patch partition (from PointBatch)
    from pointcept_tpu.models.utils.structure import PointBatch

    pb = PointBatch(coord=jnp.zeros((N, 3)), feat=feat, grid_coord=grid, batch=batch, num_scenes=1)
    pb = pb.serialize(depth=depth)

    def partition(pb):
        s, p = pb.patch_partition(0, 1024)
        return s[0] + p[-1]

    timed("patch partition (1 order)", partition, pb)

    # 4. block-dense k5 conv
    # host-side block structure for the experiment
    g_np = np.asarray(grid)
    b_np = np.asarray(batch)
    code = (g_np[:, 0].astype(np.int64) >> 3 << 40) | (g_np[:, 1].astype(np.int64) >> 3 << 20) | (g_np[:, 2].astype(np.int64) >> 3)
    code = np.where(b_np >= 0, code, -1)
    blocks, inv_ = np.unique(code[b_np >= 0], return_inverse=True)
    nB = len(blocks)
    print(f"blocks(8^3): {nB} ({N/nB:.1f} pts/block, fill {N/nB/512*100:.0f}%)")
    block_rank = np.full(N, nB, np.int32)
    block_rank[b_np >= 0] = inv_.astype(np.int32)
    # neighbor table
    lut = {c: i for i, c in enumerate(blocks.tolist())}
    offs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]
    bg = np.stack([(blocks >> 40) & 0xFFFFF, (blocks >> 20) & 0xFFFFF, blocks & 0xFFFFF], 1)
    nbr_blocks = np.full((nB, 27), nB, np.int32)
    for k, (a, b, c) in enumerate(offs):
        q = (bg[:, 0] + a).astype(np.int64) << 40 | (bg[:, 1] + b).astype(np.int64) << 20 | (bg[:, 2] + c).astype(np.int64)
        for i in range(nB):
            j = lut.get(int(q[i]), nB)
            nbr_blocks[i, k] = j
    local = ((g_np[:, 0] & 7) << 6) | ((g_np[:, 1] & 7) << 3) | (g_np[:, 2] & 7)
    slot = np.where(b_np >= 0, block_rank * 512 + local, nB * 512).astype(np.int32)

    slot_j = jnp.asarray(slot)
    nbrb_j = jnp.asarray(nbr_blocks)
    w5 = jnp.asarray(rng.randn(5, 5, 5, 6, 32).astype(np.float32) * 0.1)

    nB_cap = nB  # static for the experiment

    def block_conv_k5(feat, slot, nbrb, w):
        c = feat.shape[1]
        dense = jnp.zeros((nB_cap * 512 + 1, c), jnp.bfloat16).at[slot].set(feat.astype(jnp.bfloat16))
        dense4 = dense[:-1].reshape(nB_cap, 8, 8, 8, c)
        dense4 = jnp.concatenate([dense4, jnp.zeros((1, 8, 8, 8, c), jnp.bfloat16)])  # trash block
        hal = jnp.zeros((nB_cap, 12, 12, 12, c), jnp.bfloat16)
        for k, (a, b, cc) in enumerate(offs):
            src = dense4[nbrb[:, k]]
            # region of src landing in halo coords [o*8+2 .. o*8+10) clipped to [0,12)
            d0, d1 = max(0, a * 8 + 2), min(12, a * 8 + 10)
            e0, e1 = max(0, b * 8 + 2), min(12, b * 8 + 10)
            f0, f1 = max(0, cc * 8 + 2), min(12, cc * 8 + 10)
            s0, s1 = d0 - (a * 8 + 2), d1 - (a * 8 + 2)
            t0_, t1_ = e0 - (b * 8 + 2), e1 - (b * 8 + 2)
            u0, u1 = f0 - (cc * 8 + 2), f1 - (cc * 8 + 2)
            hal = hal.at[:, d0:d1, e0:e1, f0:f1, :].set(src[:, s0:s1, t0_:t1_, u0:u1, :])
        out = jax.lax.conv_general_dilated(
            hal, w.astype(jnp.bfloat16), (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(nB_cap * 512, -1)
        out = jnp.concatenate([out, jnp.zeros((1, out.shape[1]), out.dtype)])
        return jnp.take(out, slot, axis=0)

    timed("block-dense SubM k5 conv (6->32)", block_conv_k5, feat, slot_j, nbrb_j, w5)

    # correctness vs gather_conv
    from pointcept_tpu.ops.sparse_conv import gather_conv, kernel_offsets

    nbr5 = build_subm_neighbor_map(grid, kb, mask, depth, 5)
    w_flat = np.transpose(np.asarray(w5), (0, 1, 2, 3, 4)).reshape(125, 6, 32)
    ref = gather_conv(feat, nbr5, jnp.asarray(w_flat), compute_dtype=jnp.bfloat16)
    got = block_conv_k5(feat, slot_j, nbrb_j, w5)
    d = np.abs(np.asarray(ref) - np.asarray(got))[np.asarray(mask)]
    print(f"block conv vs gather conv: max diff {d.max():.5f}")

    # 5. current sort-merge k5 map
    def k5map(grid, kb, mask):
        return build_subm_neighbor_map(grid, kb, mask, depth, 5)[0, 0]

    timed("sort-merge k5 neighbor map (current)", k5map, grid, kb, mask, reps=3)


if __name__ == "__main__":
    main()
