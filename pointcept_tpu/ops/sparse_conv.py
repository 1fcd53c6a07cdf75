"""Sparse 3D convolution as gather-GEMM — TPU-native spconv replacement.

Reference counterpart: the spconv library used by SpUNet / PTv3 stem+xCPE / OA-CNNs
(`pointcept/models/sparse_unet/spconv_unet_v1m1_base.py`, `Point.sparsify()` at
`models/utils/structure.py:112-148`). spconv builds hash-table "rule maps"
(indice pairs per kernel offset) and scatters GEMM results; on TPU we instead:

1. sort active voxels once by their Morton key (a perfect spatial hash: the key
   is bijective with (batch, grid) at fixed depth);
2. for each kernel offset, vectorized **lexicographic binary search** of the
   neighbor's key over the sorted keys -> a dense neighbor-index table
   ``nbr [N, k^3]`` (-1 = missing), the analogue of spconv's rule map, reused
   across every conv sharing an ``indice_key`` (same resolution);
3. convolution = for each offset: gather rows + matmul + accumulate — pure
   gather-GEMM, no scatter needed for submanifold convs (output sites = input
   sites). Strided/inverse convs (SpUNet) build parent/child maps the same way.

Everything is static-shape and jit-compatible.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_tpu.ops import serialization as ser

# Batch id used for *queries* from padding points: never matches any stored key
# (stored padding uses BATCH_SENTINEL).
QUERY_VOID = ser.BATCH_SENTINEL + 1


def kernel_offsets(kernel_size: int, dilation: int = 1) -> np.ndarray:
    """[k^3, 3] integer offsets, C-order over (d0, d1, d2), centered.

    Matches the spatial enumeration order of a [k,k,k] conv weight tensor so the
    checkpoint converter can map spconv weights positionally.
    """
    k = kernel_size
    r = np.arange(k) - (k - 1) // 2
    offs = np.array(list(itertools.product(r, r, r)), dtype=np.int32) * dilation
    return offs


class SortedVoxelIndex:
    """Sorted key table for O(log N) voxel lookup (the TPU 'hash table')."""

    def __init__(self, kb: jnp.ndarray, hi: jnp.ndarray, lo: jnp.ndarray, point_idx: jnp.ndarray, depth: int):
        self.kb, self.hi, self.lo, self.point_idx, self.depth = kb, hi, lo, point_idx, depth

    @staticmethod
    def build(grid_coord: jnp.ndarray, key_batch: jnp.ndarray, depth: int) -> "SortedVoxelIndex":
        keys = ser.encode(grid_coord, key_batch, depth, "z")
        iota = jnp.arange(grid_coord.shape[0], dtype=jnp.int32)
        kb, hi, lo, idx = jax.lax.sort(
            (keys[:, 0], keys[:, 1], keys[:, 2], iota), num_keys=3, is_stable=False
        )
        return SortedVoxelIndex(kb, hi, lo, idx, depth)

    def lookup(self, grid_coord: jnp.ndarray, key_batch: jnp.ndarray) -> jnp.ndarray:
        """Find point index of each queried (batch, grid) voxel; -1 if absent."""
        q = ser.encode(grid_coord, key_batch, self.depth, "z")
        return self.lookup_keys(q[:, 0], q[:, 1], q[:, 2])

    def lookup_keys(self, qb: jnp.ndarray, qhi: jnp.ndarray, qlo: jnp.ndarray) -> jnp.ndarray:
        n = self.kb.shape[0]
        pos = lex_lookup(self.kb, self.hi, self.lo, qb, qhi, qlo)
        return jnp.where(pos >= 0, self.point_idx[jnp.maximum(pos, 0)], -1)


def _lex_lower_bound(kb, khi, klo, qb, qhi, qlo):
    """Vectorized lower_bound over 3-int32 lexicographic keys.

    kb/khi/klo: sorted [N]; qb/qhi/qlo: queries [M]; returns [M] int32 positions.

    NOTE: each unrolled step gathers 3 key columns — fine for one-off lookups,
    but for batched joins prefer `lex_lookup` (sort-merge): the round-2 device
    profile showed ~55 ms/scene in thousands of tiny per-step fusions when this
    ran once per kernel offset per stage.
    """
    n = kb.shape[0]
    iters = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    lo_idx = jnp.zeros(qb.shape, jnp.int32)
    hi_idx = jnp.full(qb.shape, n, jnp.int32)
    for _ in range(iters):
        mid = (lo_idx + hi_idx) >> 1
        mb, mh, ml = kb[mid], khi[mid], klo[mid]
        less = (mb < qb) | ((mb == qb) & ((mh < qhi) | ((mh == qhi) & (ml < qlo))))
        lo_idx = jnp.where(less, mid + 1, lo_idx)
        hi_idx = jnp.where(less, hi_idx, mid)
    return lo_idx


def lex_lookup(kb, khi, klo, qb, qhi, qlo):
    """Exact-match positions of query key-triples in sorted key-triples.

    Returns [M] int32: position in kb of the matching key, -1 if absent.

    Scatter-free sort-merge join: concat (table, queries), one 4-key sort
    (table rows tie-break before queries), prefix-cummax carries the last
    table rank through each equal-key run, a second 1-key sort restores query
    order. Two sorts + O(1) elementwise passes replace log2(N) gather steps —
    the fast path for batched joins (all kernel offsets of a stage at once).
    """
    nt = kb.shape[0]
    nq = qb.shape[0]
    k1 = jnp.concatenate([kb, qb])
    k2 = jnp.concatenate([khi, qhi])
    k3 = jnp.concatenate([klo, qlo])
    isq = jnp.concatenate(
        [jnp.zeros((nt,), jnp.int32), jnp.ones((nq,), jnp.int32)]
    )
    payload = jnp.arange(nt + nq, dtype=jnp.int32)
    s1, s2, s3, sq, sp = jax.lax.sort((k1, k2, k3, isq, payload), num_keys=4, is_stable=False)
    pos = jnp.arange(nt + nq, dtype=jnp.int32)
    is_table = sq == 0
    # table payloads are 0..nt-1 and kb was sorted, so within the sorted merge
    # the last-table-row payload IS its position in kb
    last_rank = jax.lax.cummax(jnp.where(is_table, sp, -1))
    last_tpos = jax.lax.cummax(jnp.where(is_table, pos, -1))
    new_run = jnp.concatenate(
        [
            jnp.array([True]),
            (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) | (s3[1:] != s3[:-1]),
        ]
    )
    run_start = jax.lax.cummax(jnp.where(new_run, pos, -1))
    matched = (~is_table) & (last_tpos >= run_start) & (last_rank >= 0)
    res_sorted = jnp.where(matched, last_rank, -1)
    # restore original order (payload ascending: table rows first, then queries)
    _, res = jax.lax.sort((sp, res_sorted), num_keys=1, is_stable=False)
    return res[nt:]


def build_subm_neighbor_map(
    grid_coord: jnp.ndarray,
    key_batch: jnp.ndarray,
    mask: jnp.ndarray,
    depth: int,
    kernel_size: int,
    dilation: int = 1,
    method: str = "auto",
) -> jnp.ndarray:
    """nbr [N, k^3] int32: per active site, the input site at each kernel offset
    (-1 = none). This is the spconv SubM 'rule map' equivalent, built once per
    resolution and reused by every conv with the same indice_key.

    method="auto" (default) picks by size: the sort-merge join wins at large N
    (it converts random access into streaming), but its scatter-backs serialize
    (~10 M rows/s on TPU), so small stages use the scatter-free per-offset
    binary search instead.
    """
    if method == "auto":
        method = "bsearch" if grid_coord.shape[0] <= 16384 else "sortmerge"
    if method == "bsearch":
        return _build_subm_neighbor_map_bsearch(grid_coord, key_batch, mask, depth, kernel_size, dilation)
    return _build_subm_neighbor_map_sortmerge(grid_coord, key_batch, mask, depth, kernel_size, dilation)


def _build_subm_neighbor_map_bsearch(grid_coord, key_batch, mask, depth, kernel_size, dilation=1):
    """All k^3-1 offsets join in ONE batched lookup (one sort-merge) — a
    per-offset loop costs thousands of tiny op launches (see lex_lookup)."""
    index = SortedVoxelIndex.build(grid_coord, key_batch, depth)
    offs_np = kernel_offsets(kernel_size, dilation)
    center = int(np.where((offs_np == 0).all(axis=1))[0][0])
    noncenter = np.concatenate([offs_np[:center], offs_np[center + 1 :]])
    n = grid_coord.shape[0]
    lim = (1 << depth) - 1
    qb = jnp.where(mask, key_batch, QUERY_VOID)

    qg = grid_coord[None, :, :] + jnp.asarray(noncenter, jnp.int32)[:, None, :]  # [K-1, N, 3]
    in_range = jnp.all((qg >= 0) & (qg <= lim), axis=-1)
    qg = jnp.clip(qg, 0, lim)
    qbt = jnp.where(in_range, qb[None, :], QUERY_VOID)
    res = index.lookup(qg.reshape(-1, 3), qbt.reshape(-1)).reshape(len(noncenter), n)

    self_col = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), -1)
    return jnp.concatenate(
        [res[:center], self_col[None, :], res[center:]], axis=0
    ).T


def _build_subm_neighbor_map_sortmerge(grid_coord, key_batch, mask, depth, kernel_size, dilation=1):
    """Sort-merge join with two packed int32 sort keys.

    key1 = batch_tag << 18 | morton_hi (batch ids remapped to < 2^12 so table
    padding=4096 / void queries=4097 sort last); key2 = morton_lo << 1 | is_query
    (table rows before their matching queries). Only offsets with positive
    lexicographic sign are queried; the mirror direction is filled by scattering
    the found pair the other way (halves the sort).
    """
    n = grid_coord.shape[0]
    offs_np = kernel_offsets(kernel_size, dilation)
    k_total = len(offs_np)
    center = int(np.where((offs_np == 0).all(axis=1))[0][0])
    # offsets strictly after center in enumeration order are the "positive" half;
    # mirror(j) = k_total - 1 - j (offsets are centro-symmetric by construction)
    pos_ids = list(range(center + 1, k_total))
    lim = (1 << depth) - 1
    assert depth <= 16

    # local batch tags: valid ids stay (< 2^11 assumed), padding -> 4096
    PAD_TAG = jnp.int32(1 << 12)
    VOID_TAG = PAD_TAG + 1
    t_tag = jnp.where(mask, key_batch, PAD_TAG)

    def pack(grid, tag, isq):
        hi, lo = ser.morton_encode_pair(grid[:, 0], grid[:, 1], grid[:, 2], depth)
        k1 = (tag << 18) | hi
        k2 = (lo << 1) | isq
        return k1, k2

    tk1, tk2 = pack(jnp.clip(grid_coord, 0, lim), t_tag, 0)

    qk1_list, qk2_list = [], []
    for j in pos_ids:
        qg = grid_coord + jnp.asarray(offs_np[j])[None, :]
        in_range = jnp.all((qg >= 0) & (qg <= lim), axis=-1) & mask
        qg = jnp.clip(qg, 0, lim)
        k1, k2 = pack(qg, jnp.where(in_range, t_tag, VOID_TAG), 1)
        qk1_list.append(k1)
        qk2_list.append(k2)
    q = n * len(pos_ids)

    # sort the table alone (cheap): table payloads in the big sort are then
    # RANKS, which are monotone in sorted order, so "latest table entry" is a
    # single cummax with NO key gathers (gathers run at ~0.5 GB/s on TPU —
    # they, not the sort, dominate this op)
    t_rank_sorted = jax.lax.sort((tk1, tk2, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=False)
    stk1, stk2, table_pid_by_rank = t_rank_sorted

    all_k1 = jnp.concatenate([stk1] + qk1_list)
    all_k2 = jnp.concatenate([stk2] + qk2_list)
    payload = jnp.arange(n + q, dtype=jnp.int32)  # table rows: rank (monotone)
    sk1, sk2, sp = jax.lax.sort((all_k1, all_k2, payload), num_keys=2, is_stable=False)

    pos = jnp.arange(n + q, dtype=jnp.int32)
    is_table = (sk2 & 1) == 0
    last_rank = jax.lax.cummax(jnp.where(is_table, sp, -1))  # sp of table rows = rank
    # key-run starts: a query matches iff its run contains a table entry,
    # i.e. the last table entry is at/after the current run start
    last_table_pos = jax.lax.cummax(jnp.where(is_table, pos, -1))
    new_run = jnp.concatenate(
        [jnp.array([True]), (sk1[1:] != sk1[:-1]) | ((sk2[1:] >> 1) != (sk2[:-1] >> 1))]
    )
    run_start = jax.lax.cummax(jnp.where(new_run, pos, -1))
    matched = (
        (last_table_pos >= run_start)
        & (last_rank >= 0)
        & (~is_table)
        & (sk1 < (PAD_TAG << 18))  # real batches only
    )
    match_pid = jnp.where(matched, table_pid_by_rank[jnp.clip(last_rank, 0, n - 1)], -1)

    # flat neighbor table [k_total * n]; column-major per offset
    qflat = sp - n  # flat (offset_pos, point) id for query rows
    point_of_q = jnp.where(~is_table, qflat % n, 0)
    offpos_of_q = jnp.where(~is_table, qflat // n, 0)

    dead = k_total * n
    # forward: nbr[point, pos_ids[offpos]] = pid
    fwd_col = jnp.asarray(np.asarray(pos_ids, np.int32))[offpos_of_q]
    fwd_slot = jnp.where(matched, fwd_col.astype(jnp.int32) * n + point_of_q, dead)
    # mirror: nbr[pid, mirror(pos_ids[offpos])] = point
    mir_col = jnp.asarray(np.asarray([k_total - 1 - j for j in pos_ids], np.int32))[offpos_of_q]
    mir_slot = jnp.where(matched, mir_col.astype(jnp.int32) * n + jnp.maximum(match_pid, 0), dead)

    flat = jnp.full((k_total * n + 1,), -1, jnp.int32)
    flat = flat.at[fwd_slot].set(match_pid)
    flat = flat.at[mir_slot].set(point_of_q)
    nbr = flat[: k_total * n].reshape(k_total, n)
    self_col = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), -1)
    nbr = nbr.at[center].set(self_col)
    return nbr.T


def gather_conv(
    feat: jnp.ndarray,  # [N, Cin]
    nbr: jnp.ndarray,  # [N, K]
    weight: jnp.ndarray,  # [K, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    fuse: bool = True,
    compute_dtype=None,
) -> jnp.ndarray:
    """out[i] = sum_k feat[nbr[i,k]] @ weight[k] (missing neighbors contribute 0).

    `fuse=True` materializes the im2col tensor [N, K*Cin] and runs ONE MXU matmul
    — fastest when memory allows; `fuse=False` accumulates K small matmuls.
    """
    n, k = nbr.shape
    cin = feat.shape[1]
    cout = weight.shape[2]
    valid = (nbr >= 0)[..., None]
    idx = jnp.maximum(nbr, 0)
    f = feat if compute_dtype is None else feat.astype(compute_dtype)
    w = weight if compute_dtype is None else weight.astype(compute_dtype)
    if fuse:
        gathered = jnp.take(f, idx.reshape(-1), axis=0).reshape(n, k, cin)
        gathered = jnp.where(valid, gathered, 0)
        out = jax.lax.dot_general(
            gathered.reshape(n, k * cin),
            w.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.zeros((n, cout), jnp.float32)
        for j in range(k):
            g = jnp.take(f, idx[:, j], axis=0)
            g = jnp.where(valid[:, j], g, 0)
            out = out + jnp.dot(g, w[j], preferred_element_type=jnp.float32)
    out = out.astype(feat.dtype)
    if bias is not None:
        out = out + bias
    return out


def build_strided_maps(
    grid_coord: jnp.ndarray,
    key_batch: jnp.ndarray,
    mask: jnp.ndarray,
    depth: int,
    out_capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stride-2 downsample structure (SparseConv3d k2 s2 / its inverse).

    Returns:
      out_grid [M,3], out_batch [M] (-1 empty), child [M,8] int32 point index of
      each child offset (-1 missing), parent_of [N] int32 cluster id of each
      input point (=M if dropped/padding), child_slot [N] int32 in {0..7}.
    """
    n = grid_coord.shape[0]
    coarse = grid_coord >> 1
    keys = ser.encode(coarse, jnp.where(mask, key_batch, ser.BATCH_SENTINEL), depth - 1, "z")
    order = ser.argsort_keys(keys)
    sk = keys[order]
    valid_sorted = mask[order]
    prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
    head = valid_sorted & (~prev_eq)
    cluster_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    m = out_capacity
    cl = jnp.where(valid_sorted & (cluster_sorted < m), cluster_sorted, m)
    # parent cluster of each input point
    parent_of = jnp.full((n,), m, jnp.int32).at[order].set(cl.astype(jnp.int32))
    child_slot = ((grid_coord[:, 0] & 1) << 2) | ((grid_coord[:, 1] & 1) << 1) | (grid_coord[:, 2] & 1)
    # out grid/batch via head scatter
    head_target = jnp.where(head & (cluster_sorted < m), cluster_sorted, m)
    out_grid = jnp.zeros((m + 1, 3), jnp.int32).at[head_target].set(coarse[order])[:m]
    out_batch = jnp.full((m + 1,), -1, jnp.int32).at[head_target].set(
        jnp.where(valid_sorted, key_batch[order], -1)
    )[:m]
    # child table: child[cluster, slot] = point idx
    flat = parent_of * 8 + child_slot.astype(jnp.int32)
    flat = jnp.where(parent_of < m, flat, m * 8)
    child = (
        jnp.full((m * 8 + 1,), -1, jnp.int32)
        .at[flat]
        .set(jnp.where(mask, jnp.arange(n, dtype=jnp.int32), -1))[: m * 8]
        .reshape(m, 8)
    )
    return out_grid, out_batch, child, parent_of, child_slot.astype(jnp.int32)


def strided_conv(feat, child, weight, bias=None):
    """Downsampling conv k2 s2: out[c] = sum_slot feat[child[c,slot]] @ W[slot]."""
    return gather_conv(feat, child, weight, bias)


def inverse_conv(feat_coarse, parent_of, child_slot, weight, bias=None, num_fine: Optional[int] = None):
    """SparseInverseConv3d k2: each fine site reads its parent through the weight
    of its child slot: out[i] = feat_coarse[parent_of[i]] @ W[child_slot[i]].
    Computed as 8 coarse-level matmuls + one gather (MXU-friendly).
    """
    m = feat_coarse.shape[0]
    k, cin, cout = weight.shape
    assert k == 8
    per_slot = jnp.einsum("mc,kcd->kmd", feat_coarse, weight, preferred_element_type=jnp.float32).astype(
        feat_coarse.dtype
    )  # [8, M, Cout]
    valid = parent_of < m
    p = jnp.minimum(parent_of, m - 1)
    out = per_slot[child_slot, p]  # [N, Cout] advanced-index gather
    out = jnp.where(valid[:, None], out, 0)
    if bias is not None:
        out = out + bias
    return out


def build_fused_neighbor_maps(stage_specs):
    """Build neighbor maps for MANY (grid, kernel) stages with ONE sort-merge.

    stage_specs: list of dicts(grid_coord [N_s,3], key_batch [N_s], mask [N_s],
    depth (<=13), kernel_size). Returns a list of nbr [N_s, k^3] tables.

    Rationale: jax.lax.sort cost on TPU is strongly sub-linear in size (large
    fixed overhead per invocation), so fusing the stem k5 + every stage's k3
    join into one sort of the concatenated tagged keys is much cheaper than
    per-stage sorts. Key packing: k1 = stage(4b @ 19) | batch-tag(10b @ 9) |
    morton-hi(9b), k2 = lo(30b) | is_query(1b). depth <= 13 so hi fits 9 bits.
    """
    assert len(stage_specs) <= 16
    tk1_list, tk2_list, qk1_list, qk2_list = [], [], [], []
    meta = []  # (n, pos_ids, center, k_total)
    PAD_TAG = jnp.int32(1 << 9)
    VOID_TAG = PAD_TAG + 1

    for si, spec in enumerate(stage_specs):
        grid = spec["grid_coord"]
        kb = spec["key_batch"]
        mask = spec["mask"]
        depth = spec["depth"]
        assert depth <= 13, "fused builder supports depth <= 13 (morton hi must fit 9 bits)"
        k = spec["kernel_size"]
        offs_np = kernel_offsets(k, spec.get("dilation", 1))
        k_total = len(offs_np)
        center = int(np.where((offs_np == 0).all(axis=1))[0][0])
        pos_ids = list(range(center + 1, k_total))
        lim = (1 << depth) - 1
        n = grid.shape[0]
        t_tag = jnp.where(mask, jnp.minimum(kb, PAD_TAG - 2), PAD_TAG)
        stage_bits = jnp.int32(si) << 19

        def pack(g, tag, isq):
            hi, lo = ser.morton_encode_pair(g[:, 0], g[:, 1], g[:, 2], depth)
            k1 = stage_bits | (tag << 9) | hi
            k2 = (lo << 1) | isq
            return k1, k2

        k1, k2 = pack(jnp.clip(grid, 0, lim), t_tag, 0)
        # pre-sort the table per stage so ranks are monotone
        k1, k2, pid = jax.lax.sort((k1, k2, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=False)
        tk1_list.append(k1)
        tk2_list.append(k2)
        meta.append(dict(n=n, pos_ids=pos_ids, center=center, k_total=k_total, pid_by_rank=pid, mask=mask))
        for j in pos_ids:
            qg = grid + jnp.asarray(offs_np[j])[None, :]
            in_range = jnp.all((qg >= 0) & (qg <= lim), axis=-1) & mask
            qg = jnp.clip(qg, 0, lim)
            qk1, qk2 = pack(qg, jnp.where(in_range, t_tag, VOID_TAG), 1)
            qk1_list.append(qk1)
            qk2_list.append(qk2)

    # global payload layout: tables first (rank within stage), then queries
    t_sizes = [m["n"] for m in meta]
    t_offsets = np.concatenate([[0], np.cumsum(t_sizes)])
    q_sizes = [m["n"] * len(m["pos_ids"]) for m in meta]
    q_offsets = np.concatenate([[0], np.cumsum(q_sizes)])
    n_t = int(t_offsets[-1])
    n_q = int(q_offsets[-1])

    all_k1 = jnp.concatenate(tk1_list + qk1_list)
    all_k2 = jnp.concatenate(tk2_list + qk2_list)
    payload = jnp.arange(n_t + n_q, dtype=jnp.int32)
    sk1, sk2, sp = jax.lax.sort((all_k1, all_k2, payload), num_keys=2, is_stable=False)

    pos = jnp.arange(n_t + n_q, dtype=jnp.int32)
    is_table = (sk2 & 1) == 0
    # table payloads are global positions which increase with the sort order
    # (stage-major, rank-minor) -> cummax gives the latest table row id
    last_tid = jax.lax.cummax(jnp.where(is_table, sp, -1))
    last_tpos = jax.lax.cummax(jnp.where(is_table, pos, -1))
    new_run = jnp.concatenate(
        [jnp.array([True]), (sk1[1:] != sk1[:-1]) | ((sk2[1:] >> 1) != (sk2[:-1] >> 1))]
    )
    run_start = jax.lax.cummax(jnp.where(new_run, pos, -1))
    real = (sk1 & (PAD_TAG << 9)) == 0  # tag < PAD_TAG for every stage block
    matched = (last_tpos >= run_start) & (last_tid >= 0) & (~is_table) & real

    # per-stage pid lookup table, concatenated: pid_global[t_offset + rank] = point id
    pid_by_rank = jnp.concatenate([m["pid_by_rank"] for m in meta])
    match_pid = jnp.where(matched, pid_by_rank[jnp.clip(last_tid, 0, n_t - 1)], -1)

    # scatter back: flat query id = sp - n_t (global, stage-major)
    qflat = jnp.where(~is_table, sp - n_t, n_q)
    flat = jnp.full((n_q + 1,), -1, jnp.int32).at[qflat].set(match_pid)[:n_q]

    # also fill mirrors: need (stage, offset pos, point) of each query and the
    # mirror column; do it per stage on the flat array
    results = []
    for si, m in enumerate(meta):
        n = m["n"]
        npos = len(m["pos_ids"])
        seg = flat[int(q_offsets[si]) : int(q_offsets[si + 1])].reshape(npos, n)
        k_total = m["k_total"]
        nbr = jnp.full((k_total, n), -1, jnp.int32)
        for li, j in enumerate(m["pos_ids"]):
            nbr = nbr.at[j].set(seg[li])
        # mirror: nbr[mirror(j)][pid] = i  where seg[li][i] = pid
        dead = n
        for li, j in enumerate(m["pos_ids"]):
            mj = k_total - 1 - j
            pid = seg[li]
            tgt = jnp.where(pid >= 0, pid, dead)
            col = jnp.full((n + 1,), -1, jnp.int32).at[tgt].set(
                jnp.where(pid >= 0, jnp.arange(n, dtype=jnp.int32), -1)
            )[:n]
            nbr = nbr.at[mj].set(col)
        self_col = jnp.where(m["mask"], jnp.arange(n, dtype=jnp.int32), -1)
        nbr = nbr.at[m["center"]].set(self_col)
        results.append(nbr.T)
    return results


def depthwise_gather_conv(feat, nbr, weight, bias=None):
    """Depthwise submanifold conv (ocnn dwconv.OctreeDWConv equivalent):
    out[i, c] = sum_k feat[nbr[i,k], c] * weight[k, c]."""
    n, k = nbr.shape
    ok = nbr >= 0
    safe = jnp.minimum(jnp.maximum(nbr, 0), feat.shape[0] - 1)
    g = feat[safe] * ok[..., None]  # [N, K, C]
    out = jnp.einsum("nkc,kc->nc", g, weight)
    if bias is not None:
        out = out + bias
    return out


def k3_columns_of_k5() -> np.ndarray:
    """Column indices selecting the 3^3 neighbor map out of a 5^3 map built at
    the same resolution (kernel_offsets enumeration): nbr3 = nbr5[:, these].
    Saves rebuilding the full-resolution k3 map after a k5 stem."""
    offs5 = kernel_offsets(5)
    offs3 = kernel_offsets(3)
    lut = {tuple(o): i for i, o in enumerate(offs5.tolist())}
    return np.asarray([lut[tuple(o)] for o in offs3.tolist()], np.int32)
