"""Point Transformer V3 — TPU-native (JAX/Flax) rebuild.

Reference: `pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py`
(PT-v3m1). Same architecture — serialization -> SubM k5 stem -> U-Net of
[SerializedPooling + Block×d] encoder stages and [SerializedUnpooling + Block×d]
decoder stages, Block = xCPE (SubM k3 + linear + LN) + serialized patch
attention + MLP with pre-norm residuals — but re-expressed for XLA:

* ragged offsets -> fixed-capacity `PointBatch` with masks (static shapes);
* flash_attn varlen -> dense [num_patches, K, K] bf16 patch attention over the
  static patch layout from `PointBatch.patch_partition` (MXU-shaped);
* spconv SubM convs -> gather-GEMM over binary-searched neighbor maps, built
  once per stage and shared by every block (the indice_key reuse pattern);
* torch_scatter segment_csr pooling -> sorted-run cluster ids + jax segment
  reductions with a static per-stage capacity;
* python pad loops -> vectorized cumsum arithmetic.

Stage-local auxiliary structures (neighbor maps, patch partitions) are computed
once per stage in the traced graph and reused across blocks, mirroring the
reference's per-Point-dict caching (`get_padding_and_inverse`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import DropPath, LayerNorm, MaskedBatchNorm, MLP, PDNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.attention import patch_attention
from pointcept_tpu.ops.permute import permute_rows
from pointcept_tpu.ops.segment_ops import segment_reduce
from pointcept_tpu.ops.block_conv import block_subm_conv, build_block_tables, default_block_capacity
from pointcept_tpu.ops.sparse_conv import build_subm_neighbor_map, gather_conv, k3_columns_of_k5

# torch kaiming_uniform(a=sqrt(5)) equivalent for conv/linear kernels
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# pdnorm config: None for plain norms, else dict(conditions, decouple, adaptive)
PDCfg = Optional[dict]


def apply_bn(name: str, pd: PDCfg, x, mask, train, pb):
    if pd is not None and pd.get("bn"):
        return PDNorm(
            conditions=tuple(pd["conditions"]),
            decouple=pd["decouple"],
            adaptive=pd["adaptive"],
            norm_type="bn",
            name=name,
        )(x, mask, train, pb.condition, pb.context)
    return MaskedBatchNorm(name=name)(x, mask, train)


def apply_ln(name: str, pd: PDCfg, x, train, pb):
    if pd is not None and pd.get("ln"):
        return PDNorm(
            conditions=tuple(pd["conditions"]),
            decouple=pd["decouple"],
            adaptive=pd["adaptive"],
            norm_type="ln",
            name=name,
        )(x, None, train, pb.condition, pb.context)
    return LayerNorm(name=name)(x)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SubMConv(nn.Module):
    """Submanifold sparse conv: gather-GEMM over a neighbor map, or the
    block-dense engine (ops/block_conv.py) when given block tables. Identical
    params either way ("weight" [k^3, Cin, Cout]) — checkpoint-interchangeable."""

    out_channels: int
    num_offsets: int  # k^3
    use_bias: bool = True

    @nn.compact
    def __call__(self, feat: jnp.ndarray, geom, train: bool = False) -> jnp.ndarray:
        cin = feat.shape[-1]
        w = self.param("weight", conv_kernel_init, (self.num_offsets, cin, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        # jax.checkpoint (train only): the conv's intermediates (dense fill
        # ~300 MB, halo tile ~1 GB per full-res conv at bench scale) would
        # otherwise be saved as VJP residuals — the whole backward then spills
        # HBM to host (measured 115 s/step through the bench tunnel).
        # Rematerializing costs one extra fill+halo+conv in the backward;
        # residuals shrink to the [N, C] input. Eval graphs skip the wrapper:
        # remat's optimization barriers blow XLA CPU compile time up ~100x
        # (a 1-minute eval compile was observed stuck for hours).
        ckpt = jax.checkpoint if train else (lambda f: f)
        if isinstance(geom, dict):  # block tables
            k = round(self.num_offsets ** (1.0 / 3.0))
            statics = dict(
                identity_order0=bool(geom.get("identity_order0", False)),
                block_bits=int(geom.get("block_bits", 3)),
            )
            arrays = {
                kk: v for kk, v in geom.items()
                if kk not in ("identity_order0", "block_bits", "overflow")
            }

            def conv_fn(f, ww, bb_, t):
                return block_subm_conv(f, {**t, **statics}, ww, bb_, kernel_size=k)

            return ckpt(conv_fn)(feat, w, b, arrays)
        # bf16 gather+matmul (f32 accumulate): halves the gather traffic;
        # matches the reference's AMP behavior
        return ckpt(
            lambda f, ww, bb_, g: gather_conv(f, g, ww, bb_, compute_dtype=jnp.bfloat16)
        )(feat, w, b, geom)


class RPE(nn.Module):
    """Relative positional bias table (reference `RPE`, ptv3 base `:29-48`)."""

    patch_size: int
    num_heads: int

    @nn.compact
    def __call__(self, rel_grid: jnp.ndarray) -> jnp.ndarray:
        # rel_grid [nP, K, K, 3] int32 -> bias [nP, H, K, K]
        pos_bnd = int((4 * self.patch_size) ** (1 / 3) * 2)
        rpe_num = 2 * pos_bnd + 1
        table = self.param(
            "rpe_table",
            nn.initializers.truncated_normal(0.02),
            (3 * rpe_num, self.num_heads),
        )
        idx = jnp.clip(rel_grid, -pos_bnd, pos_bnd) + pos_bnd + jnp.arange(3) * rpe_num
        out = jnp.take(table, idx.reshape(-1), axis=0).reshape(idx.shape + (self.num_heads,))
        out = out.sum(axis=3)  # sum over xyz -> [nP, K, K, H]
        return out.transpose(0, 3, 1, 2)


class SerializedAttention(nn.Module):
    """Reference `SerializedAttention` (`:51-222`), dense static-patch form."""

    channels: int
    num_heads: int
    patch_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    order_index: int = 0
    enable_rpe: bool = False
    lora_rank: int = 0  # >0: low-rank adapter on qkv (reference DefaultLORASegmentorV2)
    # v3m3 (utonia) 3D RoPE on q/k (reference v3m3_utonia.py Point3DRoPE + :275-305)
    rope_base: Optional[float] = None
    shift_coords: Optional[float] = None
    jitter_coords: Optional[float] = None
    rescale_coords: Optional[float] = None
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, feat, grid_coord, partition, train: bool, coord=None, valid_n=None) -> jnp.ndarray:
        c = self.channels
        h = self.num_heads
        scale = self.qk_scale or (c // h) ** -0.5
        # scene-blocked window mode (PointBatch.scene_capacity): patches are
        # fixed windows of the physical layout; non-0 orders rebase the stream
        # with one [N, C] permutation instead of qkv slot gathers + partitions
        win = isinstance(partition, dict) and partition.get("kind") == "window"
        win_order = None
        if win:
            assert not self.enable_rpe, "window attention has no RPE path"
            win_order, win_inverse = partition.get("order"), partition.get("inverse")
            if win_order is not None and self.rope_base and coord is not None:
                coord = jnp.take(coord, win_order, axis=0)
        else:
            slot_to_point, point_to_slot, *rest = partition
            identity_layout = bool(rest[0]) if rest else False
        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, kernel_init=conv_kernel_init,
            dtype=self.dtype, name="qkv",
        )(feat)
        if self.lora_rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02), (c, self.lora_rank))
            b = self.param("lora_b", nn.initializers.zeros, (self.lora_rank, 3 * c))
            qkv = qkv + (feat @ a.astype(feat.dtype)) @ b.astype(feat.dtype)
        if win and win_order is not None:
            # rebase the stream AFTER the qkv projection: [N, 3C] rows gather at
            # full row-streaming rate, while the narrow [N, C] feat rows of the
            # 32-ch stages gather ~2.5x slower per row (sub-64-lane packing)
            qkv = permute_rows(qkv, win_order, win_inverse)
        if self.rope_base and coord is not None:
            from pointcept_tpu.ops.pointrope import point_rope

            rope_coord = coord
            if train and self.has_rng("dropout"):
                key = self.make_rng("dropout")
                k1, k2, k3 = jax.random.split(key, 3)
                if self.shift_coords is not None and self.shift_coords > 0:
                    rope_coord = rope_coord + jax.random.uniform(
                        k1, (1, 3), minval=-self.shift_coords, maxval=self.shift_coords
                    )
                if self.jitter_coords is not None and self.jitter_coords > 1.0:
                    jm = math.log(self.jitter_coords)
                    rope_coord = rope_coord * jnp.exp(
                        jax.random.uniform(k2, (1, 3), minval=-jm, maxval=jm)
                    )
                if self.rescale_coords is not None and self.rescale_coords > 1.0:
                    rm = math.log(self.rescale_coords)
                    rope_coord = rope_coord * jnp.exp(
                        jax.random.uniform(k3, (1, 1), minval=-rm, maxval=rm)
                    )
            n = feat.shape[0]
            qkv4 = qkv.reshape(n, 3, h, c // h)
            # point_rope expects [..., H, K, D]; treat points as the K axis
            q = qkv4[:, 0].transpose(1, 0, 2)[None]  # [1, H, N, D]
            k = qkv4[:, 1].transpose(1, 0, 2)[None]
            pos = rope_coord[None]  # [1, N, 3]
            q = point_rope(q, pos, freq=self.rope_base)[0].transpose(1, 0, 2)
            k = point_rope(k, pos, freq=self.rope_base)[0].transpose(1, 0, 2)
            qkv = jnp.stack([q, k, qkv4[:, 2]], axis=1).reshape(n, 3 * c)
        if win:
            from pointcept_tpu.ops.attention import window_attention

            out = window_attention(
                qkv,
                partition["counts"],
                partition["cap"],
                num_heads=h,
                patch_size=self.patch_size,
                scale=scale,
            )
            if win_order is not None:
                if c < 64:
                    # pad to 64 lanes: sub-64-lane row gathers run ~2.5x slower
                    # per row than full-tile rows (profiled on the bench)
                    outp = jnp.concatenate([out, jnp.zeros_like(out)], axis=1)
                    out = permute_rows(outp, win_inverse, win_order)[:, :c]
                else:
                    out = permute_rows(out, win_inverse, win_order)
        else:
            bias = None
            if self.enable_rpe:
                k = self.patch_size
                g = jnp.take(grid_coord, slot_to_point, axis=0).reshape(-1, k, 3)
                rel = g[:, :, None, :] - g[:, None, :, :]
                bias = RPE(self.patch_size, h, name="rpe")(rel)
            out = patch_attention(
                qkv,
                slot_to_point,
                point_to_slot,
                num_heads=h,
                patch_size=self.patch_size,
                scale=scale,
                bias=bias,
                identity_layout=identity_layout,
                valid_n=valid_n,
            )
        out = nn.Dense(c, kernel_init=conv_kernel_init, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class Block(nn.Module):
    """Reference `Block` (`:250-338`): xCPE + attention + MLP, pre-norm residuals."""

    channels: int
    num_heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    pre_norm: bool = True
    order_index: int = 0
    enable_rpe: bool = False
    pd: PDCfg = None
    lora_rank: int = 0
    layer_scale: Optional[float] = None  # v3m2 LayerScale init value (sonata `:27-40`)
    rope_base: Optional[float] = None
    shift_coords: Optional[float] = None
    jitter_coords: Optional[float] = None
    rescale_coords: Optional[float] = None
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, pb: PointBatch, nbr3, partition, train: bool, cpe_feat=None) -> PointBatch:
        c = self.channels
        feat = pb.feat

        def ls(name, x):
            if self.layer_scale is None:
                return x
            gamma = self.param(name, nn.initializers.constant(self.layer_scale), (c,))
            return x * gamma.astype(x.dtype)
        # xCPE residual. `cpe_feat` replicates a reference behavior the trained
        # weights depend on: PointSequential routes spconv modules through
        # `point.sparse_conv_feat` (reference modules.py:84-105), and
        # SerializedUnpooling assigns `parent.feat = skip + up` WITHOUT
        # re-syncing the sparse tensor (ptv3 base :477-479) — so the first
        # decoder block's cpe conv sees only the proj_skip branch, while the
        # residual shortcut uses the proper sum.
        cpe = SubMConv(c, 27, use_bias=True, name="cpe_conv")(
            feat if cpe_feat is None else cpe_feat, nbr3, train
        )
        cpe = nn.Dense(c, kernel_init=conv_kernel_init, dtype=self.dtype, name="cpe_linear")(cpe)
        cpe = apply_ln("cpe_norm", self.pd, cpe, train, pb)
        feat = feat + cpe

        shortcut = feat
        x = apply_ln("norm1", self.pd, feat, train, pb) if self.pre_norm else feat
        x = SerializedAttention(
            channels=c,
            num_heads=self.num_heads,
            patch_size=self.patch_size,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            order_index=self.order_index,
            enable_rpe=self.enable_rpe,
            lora_rank=self.lora_rank,
            rope_base=self.rope_base,
            shift_coords=self.shift_coords,
            jitter_coords=self.jitter_coords,
            rescale_coords=self.rescale_coords,
            dtype=self.dtype,
            name="attn",
        )(x, pb.grid_coord, partition, train, coord=pb.coord,
          valid_n=pb.num_points if pb.num_scenes == 1 else None)
        x = DropPath(self.drop_path, name="drop_path1")(ls("ls1_gamma", x), train)
        feat = shortcut + x
        if not self.pre_norm:
            feat = apply_ln("norm1", self.pd, feat, train, pb)

        shortcut = feat
        x = apply_ln("norm2", self.pd, feat, train, pb) if self.pre_norm else feat
        x = MLP(
            hidden_channels=int(c * self.mlp_ratio),
            out_channels=c,
            drop=self.proj_drop,
            dtype=self.dtype,
            name="mlp",
        )(x, train)
        x = DropPath(self.drop_path, name="drop_path2")(ls("ls2_gamma", x), train)
        feat = shortcut + x
        if not self.pre_norm:
            feat = apply_ln("norm2", self.pd, feat, train, pb)
        return pb.replace(feat=feat)


def pooling_geometry(
    pb: PointBatch,
    stride: int,
    out_capacity: int,
    orders,
    needed,
    identity_order0: bool,
    scene_out=None,
) -> dict:
    """Feat-independent half of SerializedPooling: cluster assignment, head
    compaction, pooled grid/batch/segment and pooled serialization keys.

    Shared by the inline eval/train path and the precomputed-geometry path
    (all test fragments of a scene pool identically — reference GridSample
    test mode gives every fragment the same voxel set). Returns a dict of
    traced arrays plus static ints; `SerializedPooling` consumes it for the
    feat-dependent reductions."""
    bits = 3 * (stride.bit_length() - 1)
    pdepth = stride.bit_length() - 1
    m = out_capacity
    n = pb.capacity
    s = pb.serialized_keys.shape[0]
    reencode = orders is not None and needed is not None

    keys0 = pb.serialized_keys[0]
    order0 = pb.serialized_order[0]
    inverse0 = pb.serialized_inverse[0]
    if reencode:
        shifted0 = ser.key_shift_right(keys0, bits)
        shifted = None
    else:
        shifted = jnp.stack([ser.key_shift_right(pb.serialized_keys[i], bits) for i in range(s)])
        shifted0 = shifted[0]
    if identity_order0:
        # sorted-persistent layout: the batch IS in order-0 order
        sk = shifted0
        valid_sorted = pb.batch >= 0
    else:
        sk = shifted0[order0]  # sorted (shift is monotone on sorted codes)
        valid_sorted = pb.batch[order0] >= 0
    prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
    head = valid_sorted & ~prev_eq
    sb = pb.scene_capacity is not None and scene_out is not None
    if sb:
        # scene-blocked: rank clusters WITHIN each scene so the pooled
        # layout keeps static scene regions of scene_out rows. The
        # per-scene overflow slot (u = scene_out + 1 segments per scene)
        # keeps segment ids non-decreasing across the scene-tail padding.
        S = pb.num_scenes
        cs_in = pb.scene_capacity
        ms = scene_out
        assert m == S * ms and n == S * cs_in
        cnt = jnp.cumsum(head.astype(jnp.int32))  # inclusive
        bnd = np.arange(S) * cs_in
        base = jnp.where(
            jnp.asarray(bnd) > 0, cnt[np.maximum(bnd - 1, 0)], 0
        )  # heads before each scene
        srow = jnp.arange(n, dtype=jnp.int32) // cs_in
        rank_in = (cnt - 1) - base[srow]
        ok = valid_sorted & (rank_in < ms)
        cluster_sorted = srow * ms + rank_in
        u = ms + 1
        seg_ids = srow * u + jnp.where(
            valid_sorted, jnp.minimum(rank_in, ms), ms
        )  # non-decreasing, overflow/padding -> per-scene slot ms
        nseg = S * u
        overflow = jnp.sum((valid_sorted & (rank_in >= ms)).astype(jnp.int32))
        sb_spec = (S, u, ms)
    else:
        cluster_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
        ok = valid_sorted & (cluster_sorted < m)
        seg_ids = jnp.where(ok, cluster_sorted, m)
        nseg = m
        overflow = jnp.sum((valid_sorted & (cluster_sorted >= m)).astype(jnp.int32))
        sb_spec = None
    # per-input-point cluster id (M = dropped/padding). NO scatters here:
    # TPU scatters serialize, so everything routes through gathers and one
    # compaction sort.
    cl_sorted = jnp.where(ok, cluster_sorted, m)
    cluster_of_point = (
        cl_sorted if identity_order0 else jnp.take(cl_sorted, inverse0, axis=0)
    )

    # head compaction: ONE sort gives each cluster's head position; every
    # head attribute is then a gather
    if sb:
        from pointcept_tpu.ops.segment_ops import scene_compaction

        head_valid, hsel = scene_compaction(head, cnt, S, cs_in, ms)
    else:
        head_rank = jnp.where(head & ok, cluster_sorted, jnp.int32(n))
        hr, hpos = jax.lax.sort((head_rank, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=False)
        if m > n:  # capacity can exceed the input point count in tiny configs
            hr = jnp.concatenate([hr, jnp.full((m - n,), n, jnp.int32)])
            hpos = jnp.concatenate([hpos, jnp.zeros((m - n,), jnp.int32)])
        head_valid = hr[:m] < n
        hsel = hpos[:m]
    # point id of each cluster head
    head_point = hsel if identity_order0 else jnp.take(order0, hsel, axis=0)
    grid = jnp.where(head_valid[:, None], jnp.take(pb.grid_coord, head_point, axis=0) >> pdepth, 0)
    batch = jnp.where(head_valid, jnp.take(pb.batch, head_point, axis=0), -1)
    seg = None
    if pb.segment is not None:
        seg = jnp.where(head_valid, jnp.take(pb.segment, head_point, axis=0), -1)

    # per-order pooled keys = shifted key of the cluster head point; with
    # `reencode`, identically re-encoded from the pooled grid (hierarchical
    # curve codes) for exactly the orders read at the pooled stage
    iota_m = jnp.arange(m, dtype=jnp.int32)
    if sb:
        # scene-blocked padding keys: (scene, MAX, MAX) sorts to the scene
        # tail, preserving static scene regions at the pooled stage
        imax = jnp.int32(2**31 - 1)
        slot_scene = iota_m // scene_out
        sentinel_rows = jnp.stack(
            [slot_scene, jnp.full_like(slot_scene, imax), jnp.full_like(slot_scene, imax)],
            axis=-1,
        )
        kb_m = jnp.where(batch >= 0, batch, slot_scene).astype(jnp.int32)
    else:
        sentinel_rows = jnp.broadcast_to(
            jnp.asarray([ser.BATCH_SENTINEL, 0, 0], jnp.int32), (m, 3)
        )
        kb_m = jnp.where(batch >= 0, batch, ser.BATCH_SENTINEL).astype(jnp.int32)
    new_keys = []
    new_order = []
    new_inverse = []
    for i in range(s):
        if reencode:
            if i == 0 or i in needed:
                ki = ser.encode(grid, kb_m, pb.serialized_depth - pdepth, orders[i])
                if sb:
                    ki = jnp.where(head_valid[:, None], ki, sentinel_rows)
            else:
                ki = new_keys[0]  # placeholder — never read (see needed)
        else:
            ki = jnp.where(
                head_valid[:, None], jnp.take(shifted[i], head_point, axis=0), sentinel_rows
            )
        new_keys.append(ki)
        if i == 0:
            # cluster ids were assigned in ascending keys[0] order and
            # sentinel rows sort last, so keys[0] is ALREADY sorted:
            # the argsort is the identity (exact, keys unique)
            new_order.append(iota_m)
            new_inverse.append(iota_m)
        elif needed is not None and i not in needed:
            # no attention block reads this order at the pooled stage;
            # keys stay correct for deeper stages, permutation is identity
            new_order.append(iota_m)
            new_inverse.append(iota_m)
        else:
            oi = ser.argsort_keys(ki, pb.serialized_depth - pdepth)
            new_order.append(oi)
            new_inverse.append(ser.invert_order(oi))
    return dict(
        seg_ids=seg_ids,
        nseg=nseg,
        sb_spec=sb_spec,
        cluster_of_point=cluster_of_point,
        overflow=overflow,
        grid=grid,
        batch=batch,
        segment=seg,
        keys=jnp.stack(new_keys),
        order=jnp.stack(new_order),
        inverse=jnp.stack(new_inverse),
        identity_order0=identity_order0,
    )


class SerializedPooling(nn.Module):
    """Reference `SerializedPooling` (`:341-444`): grid pool by shifted curve codes.

    Static-shape version: clusters are runs of equal shifted keys in the (already
    sorted) order-0 permutation; output has a static `out_capacity` (clusters
    beyond it are dropped — sized generously; overflow is 0 in practice for
    stride-2 pooling of surface scans at the default factors).
    """

    out_channels: int
    out_capacity: int
    stride: int = 2
    reduce: str = "max"
    shuffle_orders: bool = True
    pd: PDCfg = None
    # scene-blocked layout: per-scene pooled capacity (out_capacity = S * scene_out);
    # cluster ranks are assigned per scene so the pooled stage keeps static
    # scene regions (see PointBatch.scene_capacity)
    scene_out: Optional[int] = None
    # order names: when given (and orders are unshuffled, i.e. `needed` is not
    # None), pooled keys are RE-ENCODED from the pooled grid instead of
    # gathered from the input keys — curve codes are hierarchical
    # (code >> 3 == parent-cell code, z and hilbert alike), so the values are
    # identical, but full-res keys need not be carried through the stage
    orders: Optional[Tuple[str, ...]] = None
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool, shuffle_key=None, pre=None, needed=None,
                 identity_order0: bool = False, geom: Optional[dict] = None):
        if pre is not None:
            return self._precomputed(pb, train, pre)
        pdepth = self.stride.bit_length() - 1
        m = self.out_capacity
        inline_geom = geom is None
        if inline_geom:
            geom = pooling_geometry(
                pb, self.stride, m, self.orders, needed, identity_order0,
                scene_out=self.scene_out,
            )
        identity_order0 = geom["identity_order0"]
        order0 = pb.serialized_order[0] if pb.serialized_order is not None else None
        inverse0 = pb.serialized_inverse[0] if pb.serialized_inverse is not None else None
        seg_ids, nseg, sb_spec = geom["seg_ids"], geom["nseg"], geom["sb_spec"]
        if sb_spec is not None:
            S, u, ms = sb_spec

            def compact(x):  # [S*u(,C)] -> [S*ms(,C)]
                return x.reshape((S, u) + x.shape[1:])[:, :ms].reshape((m,) + x.shape[1:])

        else:

            def compact(x):
                return x

        if inline_geom and self.is_mutable_collection("diagnostics") and not self.is_initializing():
            # clusters beyond out_capacity vanish from the pooled stage;
            # surface the dropped-point count so capacity mis-sizing is
            # visible in metrics (opt-in: eval graph unchanged). Precomputed
            # geometry reports its overflow once via __call__ instead.
            self.sow("diagnostics", "pool_overflow", geom["overflow"])
        cluster_of_point = geom["cluster_of_point"]

        proj = nn.Dense(self.out_channels, kernel_init=conv_kernel_init, dtype=self.dtype, name="proj")(pb.feat)
        # reduce in the sorted layout: cluster ids are non-decreasing there
        proj_sorted = proj if identity_order0 else permute_rows(proj, order0, inverse0)
        feat = compact(segment_reduce(proj_sorted, seg_ids, nseg, reduce=self.reduce, indices_are_sorted=True))
        coord_sorted = pb.coord if identity_order0 else jnp.take(pb.coord, order0, axis=0)
        coord = compact(segment_reduce(coord_sorted, seg_ids, nseg, reduce="mean", indices_are_sorted=True))
        origin_sorted = (
            None if pb.origin_coord is None
            else (pb.origin_coord if identity_order0 else jnp.take(pb.origin_coord, order0, axis=0))
        )
        origin_coord = (
            compact(segment_reduce(origin_sorted, seg_ids, nseg, reduce="mean", indices_are_sorted=True))
            if origin_sorted is not None
            else None
        )

        out = PointBatch(
            coord=coord,
            feat=feat,
            grid_coord=geom["grid"],
            batch=geom["batch"],
            origin_coord=origin_coord,
            segment=geom["segment"],
            condition=pb.condition,
            context=pb.context,
            serialized_keys=geom["keys"],
            serialized_order=geom["order"],
            serialized_inverse=geom["inverse"],
            serialized_depth=pb.serialized_depth - pdepth,
            num_scenes=pb.num_scenes,
            scene_capacity=self.scene_out if sb_spec is not None else None,
        )
        out = out.replace(feat=nn.gelu(apply_bn("norm", self.pd, out.feat, out.mask, train, out)))
        if self.shuffle_orders and shuffle_key is not None:
            out = out.shuffle_orders_(shuffle_key)
        return out, cluster_of_point

    def _precomputed(self, pb: PointBatch, train: bool, pre: dict):
        """Host-geometry path: cluster ids / pooled attributes precomputed by
        ops/host_geometry.py; the device does only proj + segment reduce + norm.
        Parameter names/shapes are identical to the in-graph path, so
        checkpoints are interchangeable."""
        pdepth = self.stride.bit_length() - 1
        m = self.out_capacity
        cluster = pre["cluster"]
        assert cluster.shape[0] == pb.capacity
        assert pre["batch"].shape[0] == m, (pre["batch"].shape, m)
        proj = nn.Dense(self.out_channels, kernel_init=conv_kernel_init, dtype=self.dtype, name="proj")(pb.feat)
        feat = segment_reduce(proj, cluster, m, reduce=self.reduce)
        coord = pre.get("coord")
        if coord is None:
            coord = segment_reduce(pb.coord, cluster, m, reduce="mean")
        origin_coord = (
            segment_reduce(pb.origin_coord, cluster, m, reduce="mean")
            if pb.origin_coord is not None
            else None
        )
        out = PointBatch(
            coord=coord,
            feat=feat,
            grid_coord=pre["grid"],
            batch=pre["batch"],
            origin_coord=origin_coord,
            segment=pre.get("segment"),
            condition=pb.condition,
            context=pb.context,
            serialized_depth=pb.serialized_depth - pdepth,
            num_scenes=pb.num_scenes,
        )
        out = out.replace(feat=nn.gelu(apply_bn("norm", self.pd, out.feat, out.mask, train, out)))
        return out, cluster


class SerializedUnpooling(nn.Module):
    """Reference `SerializedUnpooling` (`:447-482`): proj + skip add by cluster."""

    out_channels: int
    pd: PDCfg = None
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, pb: PointBatch, skip_pb: PointBatch, cluster: jnp.ndarray, train: bool) -> PointBatch:
        m = pb.capacity
        x = nn.Dense(self.out_channels, kernel_init=conv_kernel_init, dtype=self.dtype, name="proj")(pb.feat)
        x = apply_bn("proj_norm", self.pd, x, pb.mask, train, pb)
        x = nn.gelu(x)
        skip = nn.Dense(
            self.out_channels, kernel_init=conv_kernel_init, dtype=self.dtype, name="proj_skip"
        )(skip_pb.feat)
        skip = apply_bn("proj_skip_norm", self.pd, skip, skip_pb.mask, train, skip_pb)
        skip = nn.gelu(skip)
        up = jnp.take(x, jnp.minimum(cluster, m - 1), axis=0)
        up = jnp.where((cluster < m)[:, None], up, 0)
        # second output: the skip branch alone — the reference never syncs the
        # summed feat into sparse_conv_feat, so the NEXT block's cpe conv reads
        # this value (see Block.cpe_feat)
        return skip_pb.replace(feat=skip + up), skip


class Embedding(nn.Module):
    """Reference `Embedding` (`:485-516`): SubM k5 stem + BN + GELU.

    mode="linear" is the v3m2 embedding (sonata `:507-540`): Linear + LN + GELU,
    with an optional learnable mask token substituted at `patch_mask` points
    (the masked-distillation input of Sonata)."""

    embed_channels: int
    pd: PDCfg = None
    mode: str = "conv"
    mask_token: bool = False
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, pb: PointBatch, nbr5, train: bool, patch_mask=None) -> PointBatch:
        if self.mode == "linear":
            feat = nn.Dense(self.embed_channels, dtype=self.dtype, name="stem_linear")(pb.feat)
            feat = apply_ln("stem_norm", self.pd, feat, train, pb)
            feat = nn.gelu(feat)
        else:
            feat = SubMConv(self.embed_channels, 125, use_bias=False, name="stem_conv")(pb.feat, nbr5, train)
            feat = apply_bn("stem_norm", self.pd, feat, pb.mask, train, pb)
            feat = nn.gelu(feat)
        if self.mask_token:
            token = self.param("mask_token", nn.initializers.zeros, (1, self.embed_channels))
            if patch_mask is not None:
                feat = jnp.where(patch_mask[:, None], token.astype(feat.dtype), feat)
        return pb.replace(feat=feat)


@MODELS.register_module("PT-v3m1")
class PointTransformerV3(nn.Module):
    """PT-v3m1 backbone. Returns the decoded PointBatch (feat = per-point features).

    TPU-specific knobs: `serialize_depth` (static curve depth, replaces the
    reference's data-adaptive depth) and `pool_capacity_factors` (static pooled
    capacities per encoder stage, as fractions of the input capacity).
    """

    in_channels: int = 6
    order: Sequence[str] = ("z", "z-trans", "hilbert", "hilbert-trans")
    stride: Sequence[int] = (2, 2, 2, 2)
    enc_depths: Sequence[int] = (2, 2, 2, 6, 2)
    enc_channels: Sequence[int] = (32, 64, 128, 256, 512)
    enc_num_head: Sequence[int] = (2, 4, 8, 16, 32)
    enc_patch_size: Sequence[int] = (1024, 1024, 1024, 1024, 1024)
    dec_depths: Sequence[int] = (2, 2, 2, 2)
    dec_channels: Sequence[int] = (64, 64, 128, 256)
    dec_num_head: Sequence[int] = (4, 4, 8, 16)
    dec_patch_size: Sequence[int] = (1024, 1024, 1024, 1024)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.3
    pre_norm: bool = True
    shuffle_orders: bool = True
    enable_rpe: bool = False
    enable_flash: bool = True  # accepted for config parity; attention is always fused
    upcast_attention: bool = False  # parity no-op (softmax always f32)
    upcast_softmax: bool = False  # parity no-op
    enc_mode: bool = False
    pdnorm_bn: bool = False
    pdnorm_ln: bool = False
    pdnorm_decouple: bool = True
    pdnorm_adaptive: bool = False
    pdnorm_affine: bool = True
    pdnorm_conditions: Sequence[str] = ("ScanNet", "S3DIS", "Structured3D")
    serialize_depth: int = 12
    pool_capacity_factors: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    # sparse-conv engine for stem/xCPE: "block" = dense z-order blocks
    # (ops/block_conv.py, fastest on TPU), "gather" = neighbor-map gather-GEMM
    conv_engine: str = "gather"
    block_capacity_factor: Any = 1.0 / 16.0  # float or per-stage tuple
    # dense-block edge length = 2^block_bits. 8^3 blocks suit dense indoor
    # scans; 4^3 blocks cut the dense-conv FLOP redundancy ~2.3x at ScanNet
    # densities (measured 25-28% faster conv chains) at ~3.5x more blocks
    block_bits: int = 3
    # physically pin the batch to z-order after serialization: order 0 becomes
    # the identity so fills/attention/pooling need no per-point gathers
    sorted_layout: bool = True
    # scene-blocked layout: pad each scene to capacity/num_scenes rows with
    # per-scene sort sentinels so every stage keeps STATIC scene regions.
    # Patch attention becomes fixed windows (no slot gathers / partition index
    # arrays at any batch size); non-0 orders rebase the stream with one
    # permutation. Requires sorted_layout, no shuffle, no RPE, and
    # capacity % num_scenes == 0 with per-scene capacity % patch_size == 0
    # (falls back to the gather path otherwise).
    scene_blocked: bool = False
    # stages smaller than this fall back to gather-GEMM maps even under
    # conv_engine="block": dense blocks are mostly empty at coarse resolutions
    block_engine_min_points: int = 8192
    grid_size: float = 0.02  # used only when the input lacks grid_coord
    lora_rank: int = 0
    # AMP: run the activation stream (Dense/conv/attention/residuals) in bf16
    # with f32 params and f32 norm statistics — the TPU analogue of the
    # reference's `enable_amp=True` torch.autocast forward, which the headline
    # configs train with (reference configs/scannet/semseg-pt-v3m1-0-base.py:8)
    amp: bool = False
    # v3m2 (sonata variant) options
    embed_mode: str = "conv"  # "linear" = v3m2 Linear+LN stem
    mask_token: bool = False
    layer_scale: Optional[float] = None
    # v3m3 (utonia) options
    rope_base: Optional[float] = None
    shift_coords: Optional[float] = None
    jitter_coords: Optional[float] = None
    rescale_coords: Optional[float] = None

    # ------------------------------------------------------------ geometry
    # Shared by __call__ (inline) and build_geometry (precomputed): the
    # feat-independent index structures of the forward.

    def _block_tables(self, pb, stage, *, sb, shuffle_active, orders, ident0,
                      count_overflow):
        # scalar factor, or per-stage tuple (deeper stages hold far fewer
        # occupied blocks per point: pooled clusters spread over the SAME
        # spatial extent, so occupancy per 8^3 block rises ~2x per stage)
        f = self.block_capacity_factor
        if isinstance(f, (tuple, list)):
            f = f[min(stage, len(f) - 1)]
        if sb:
            mb_s = default_block_capacity(pb.scene_capacity, f)
            m = pb.num_scenes * mb_s
        else:
            mb_s = None
            m = default_block_capacity(pb.capacity, f)
        # order index 0 is the config's first order unless shuffling is
        # active (then it could be any curve -> tables re-sort by z inside)
        curve_is_z = (not shuffle_active) and orders[0] == "z"
        return build_block_tables(
            pb.serialized_keys[0], pb.serialized_order[0], pb.grid_coord, pb.mask,
            pb.serialized_depth, m, block_bits=self.block_bits,
            inverse0=pb.serialized_inverse[0],
            curve_is_z=curve_is_z,
            identity_order0=curve_is_z and ident0,
            count_overflow=count_overflow,
            scene_capacity=pb.scene_capacity if sb else None,
            scene_block_capacity=mb_s,
        )

    def _stage_ctx(self, pb, stage, patch_size, *, sb, used, ident0, nbr3,
                   block_tables_fn):
        use_block = self.conv_engine == "block"
        if nbr3 is None:
            if use_block and pb.capacity >= self.block_engine_min_points:
                nbr3 = block_tables_fn()
            else:
                depth_s = self.serialize_depth - stage
                nbr3 = build_subm_neighbor_map(pb.grid_coord, pb.key_batch(), pb.mask, depth_s, 3)
        if sb:
            # scene-blocked: fixed windows, no partition index arrays.
            # Order 0 is the physical layout (ident0 holds at every stage);
            # other orders rebase the stream by their permutation.
            counts = pb.scene_counts()
            parts = {
                oi: dict(
                    kind="window",
                    counts=counts,
                    cap=pb.scene_capacity,
                    order=None if oi == 0 else pb.serialized_order[oi],
                    inverse=None if oi == 0 else pb.serialized_inverse[oi],
                )
                for oi in used
            }
        else:
            parts = {
                oi: pb.patch_partition(oi, patch_size) + (oi == 0 and ident0 and pb.num_scenes == 1,)
                for oi in used
            }
        return dict(nbr3=nbr3, parts=parts)

    def build_geometry(self, pb: PointBatch) -> dict:
        """Feat-independent forward geometry, computed once and fed back via
        `__call__(..., precomputed=...)`.

        All test fragments of a scene share one voxel set (reference GridSample
        test mode picks one point per voxel per fragment,
        `datasets/transform.py:697-707` / reference `transform.py` test mode),
        so serialization sorts, z-order block tables, patch partitions and
        pooling clusters are identical across the fragment loop — ~20% of the
        per-fragment device time rebuilt for every fragment before this path.

        Plain method (no flax state): call it directly on the module instance
        inside the same jit as the fragment forwards. Requires the in-graph
        eval configuration (no host geometry, no order shuffle, no enc_mode).
        """
        orders = tuple(self.order) if not isinstance(self.order, str) else (self.order,)
        s_orders = len(orders)
        num_stages = len(self.enc_depths)
        assert pb.geometry is None and not self.enc_mode, (
            "build_geometry supports the in-graph eval path only"
        )

        def used_orders(stage):
            used = {0}
            used |= {i % s_orders for i in range(self.enc_depths[stage])}
            if stage < num_stages - 1:
                used |= {i % s_orders for i in range(self.dec_depths[stage])}
            return tuple(sorted(used))

        pb = pb.with_grid_coord(self.grid_size)
        # feat/origin stay out of the template: per-fragment data
        pb = pb.replace(feat=None, origin_coord=None)
        sorted_ok = self.sorted_layout
        patch_align = max(tuple(self.enc_patch_size) + tuple(self.dec_patch_size))
        sb = (
            self.scene_blocked
            and sorted_ok
            and not self.enable_rpe
            and orders[0] == "z"
            and pb.capacity % pb.num_scenes == 0
            and (pb.capacity // pb.num_scenes) % patch_align == 0
            and patch_align % 128 == 0
        )
        if sb:
            pb = pb.replace(scene_capacity=pb.capacity // pb.num_scenes)
        pb = pb.serialize(
            orders=orders, depth=self.serialize_depth, shuffle_key=None,
            sort_indices=used_orders(0), key_orders=used_orders(0),
        )
        perm0 = unsort = None
        if sorted_ok:
            perm0, inv0 = pb.serialized_order[0], pb.serialized_inverse[0]
            pb = pb.reorder(
                perm0, inv0, rebase_orders=used_orders(0), rebase_keys=used_orders(0)
            )
            unsort = (inv0, perm0)

        def ident0(stage):
            return stage > 0 or sorted_ok

        use_block = self.conv_engine == "block"
        overflow = jnp.int32(0)
        nbr5 = None
        if self.embed_mode == "conv":
            if use_block:
                nbr5 = self._block_tables(
                    pb, 0, sb=sb, shuffle_active=False, orders=orders,
                    ident0=ident0(0), count_overflow=True,
                )
                overflow = overflow + nbr5["overflow"]
            else:
                nbr5 = build_subm_neighbor_map(
                    pb.grid_coord, pb.key_batch(), pb.mask, self.serialize_depth, 5
                )

        stages = []
        pools = []
        pb0 = pb
        cap = pb.capacity
        cap_s_scene = pb.scene_capacity
        for s in range(num_stages):
            if s > 0:
                if sb:
                    cap_s_scene = _round_up(
                        max(int(math.ceil(cap_s_scene * self.pool_capacity_factors[s - 1])), patch_align),
                        patch_align,
                    )
                    cap = pb.num_scenes * cap_s_scene
                else:
                    cap = _round_up(max(int(math.ceil(cap * self.pool_capacity_factors[s - 1])), 128), 128)
                g = pooling_geometry(
                    pb, self.stride[s - 1], cap, orders, used_orders(s),
                    identity_order0=ident0(s - 1),
                    scene_out=cap_s_scene if sb else None,
                )
                overflow = overflow + g["overflow"]
                pools.append(g)
                pb = PointBatch(
                    coord=jnp.zeros((cap, 3), jnp.float32),
                    feat=None,
                    grid_coord=g["grid"],
                    batch=g["batch"],
                    segment=g["segment"],
                    serialized_keys=g["keys"],
                    serialized_order=g["order"],
                    serialized_inverse=g["inverse"],
                    serialized_depth=pb.serialized_depth - (self.stride[s - 1].bit_length() - 1),
                    num_scenes=pb.num_scenes,
                    scene_capacity=cap_s_scene if sb else None,
                )
            pre_nbr3 = None
            if s == 0 and use_block and isinstance(nbr5, dict):
                pre_nbr3 = nbr5
            elif s == 0 and nbr5 is not None and not isinstance(nbr5, dict):
                pre_nbr3 = nbr5[:, jnp.asarray(k3_columns_of_k5())]
            ctx = self._stage_ctx(
                pb, s, self.enc_patch_size[s], sb=sb, used=used_orders(s),
                ident0=ident0(s), nbr3=pre_nbr3,
                block_tables_fn=lambda pb=pb, s=s: self._block_tables(
                    pb, s, sb=sb, shuffle_active=False, orders=orders,
                    ident0=ident0(s), count_overflow=True,
                ),
            )
            t = ctx["nbr3"]
            if isinstance(t, dict) and "overflow" in t and t is not nbr5:
                overflow = overflow + t["overflow"]
            stages.append(ctx)
        return dict(
            pb0=pb0, perm0=perm0, unsort=unsort, nbr5=nbr5,
            stages=stages, pools=pools, overflow=overflow,
        )

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False, patch_mask=None,
                 precomputed=None) -> PointBatch:
        orders = tuple(self.order) if not isinstance(self.order, str) else (self.order,)
        s_orders = len(orders)
        num_stages = len(self.enc_depths)
        dt = jnp.bfloat16 if self.amp else None
        if self.amp:
            pb = pb.replace(feat=pb.feat.astype(jnp.bfloat16))
        if precomputed is not None:
            # shared forward geometry (build_geometry): serialization, layout
            # permutation, conv tables, partitions and pooling clusters were
            # computed once (all test fragments of a scene share them); this
            # forward only moves the per-fragment features through it.
            feat, coord, seg = pb.feat, pb.coord, pb.segment
            perm0 = precomputed.get("perm0")
            if perm0 is not None:
                feat = jnp.take(feat, perm0, axis=0)
                coord = jnp.take(coord, perm0, axis=0)
                seg = None if seg is None else jnp.take(seg, perm0, axis=0)
            pb = precomputed["pb0"].replace(
                feat=feat, coord=coord, segment=seg,
                condition=pb.condition, context=pb.context,
            )
            if self.is_mutable_collection("diagnostics") and not self.is_initializing():
                # static-capacity drops live in the geometry; surface them so
                # precise-eval overflow checks still see them
                self.sow("diagnostics", "geom_overflow", precomputed["overflow"])

        geo = pb.geometry  # host-precomputed geometry (None = build in-graph)

        def rng_or_none(name):
            # with host geometry the host's order shuffle is authoritative
            if geo is None and self.shuffle_orders and self.has_rng("shuffle"):
                return self.make_rng("shuffle")
            return None

        pd = None
        if self.pdnorm_bn or self.pdnorm_ln:
            pd = dict(
                bn=self.pdnorm_bn,
                ln=self.pdnorm_ln,
                conditions=tuple(self.pdnorm_conditions),
                decouple=self.pdnorm_decouple,
                adaptive=self.pdnorm_adaptive,
            )

        # static used-order sets per stage: without order shuffling, blocks read
        # only order (block_index % s_orders); skip sorts/partitions for the rest
        shuffle_active = geo is None and self.shuffle_orders and self.has_rng("shuffle")

        def used_orders(stage):
            if shuffle_active:
                return tuple(range(s_orders))
            used = {0}  # order 0 always drives pooling / block tables
            used |= {i % s_orders for i in range(self.enc_depths[stage])}
            if not self.enc_mode and stage < num_stages - 1:
                used |= {i % s_orders for i in range(self.dec_depths[stage])}
            return tuple(sorted(used))

        if precomputed is None:
            pb = pb.with_grid_coord(self.grid_size)
        sorted_ok = (
            self.sorted_layout and geo is None and not self.enc_mode and not shuffle_active
        )
        # scene-blocked mode: static per-stage scene regions (see class doc)
        patch_align = max(tuple(self.enc_patch_size) + tuple(self.dec_patch_size))
        sb = (
            self.scene_blocked
            and sorted_ok
            and not self.enable_rpe
            and orders[0] == "z"
            and pb.capacity % pb.num_scenes == 0
            and (pb.capacity // pb.num_scenes) % patch_align == 0
            and patch_align % 128 == 0
        )
        if sb and precomputed is None:
            pb = pb.replace(scene_capacity=pb.capacity // pb.num_scenes)
        unsort = None
        if precomputed is not None:
            unsort = precomputed["unsort"]
        elif geo is None:
            pb = pb.serialize(
                orders=orders,
                depth=self.serialize_depth,
                shuffle_key=rng_or_none("shuffle"),
                sort_indices=None if shuffle_active else used_orders(0),
                # pooled stages re-encode the extra orders they need from their
                # own (coarser) grid — only stage-0's orders need full-res keys
                key_orders=None if shuffle_active else used_orders(0),
            )
        if sorted_ok and precomputed is None:
            perm0, inv0 = pb.serialized_order[0], pb.serialized_inverse[0]
            pb = pb.reorder(
                perm0, inv0, rebase_orders=used_orders(0), rebase_keys=used_orders(0)
            )
            unsort = (inv0, perm0)
        # order 0 is the identity permutation at a stage when the layout is the
        # pooled construction order (always at pooled stages without shuffling,
        # at stage 0 after the reorder)
        def ident0(stage):
            return geo is None and not shuffle_active and (stage > 0 or sorted_ok)
        valid_n = pb.num_points if pb.num_scenes == 1 else None

        # drop-path schedule (reference: linspace over total depths)
        enc_dp = np.linspace(0, self.drop_path, sum(self.enc_depths)).tolist()
        dec_dp = np.linspace(0, self.drop_path, sum(self.dec_depths)).tolist() if not self.enc_mode else []

        use_block = self.conv_engine == "block" and geo is None

        def block_tables(pb, stage):
            diag = self.is_mutable_collection("diagnostics") and not self.is_initializing()
            t = self._block_tables(
                pb, stage, sb=sb, shuffle_active=shuffle_active, orders=orders,
                ident0=ident0(stage), count_overflow=diag,
            )
            if diag:
                # points in overflowed blocks get zero conv output; surface the
                # count so capacity mis-sizing on new data is visible in metrics
                self.sow("diagnostics", "block_overflow", t["overflow"])
            return t

        # stage 0 stem (k5): block tables serve every kernel size at a stage;
        # the gather engine needs the dedicated k5 map
        nbr5 = None
        stage0_tables = None
        if self.embed_mode == "conv":
            if precomputed is not None:
                nbr5 = precomputed["nbr5"]
                if use_block:
                    stage0_tables = nbr5
            elif geo is not None:
                nbr5 = geo["nbr_stem"]
            elif use_block:
                stage0_tables = block_tables(pb, 0)
                nbr5 = stage0_tables
            else:
                nbr5 = build_subm_neighbor_map(pb.grid_coord, pb.key_batch(), pb.mask, self.serialize_depth, 5)
        pb = Embedding(
            self.enc_channels[0], pd=pd, mode=self.embed_mode, mask_token=self.mask_token,
            dtype=dt, name="embedding",
        )(pb, nbr5, train, patch_mask=patch_mask)

        skips = []  # (skip_pb, cluster, stage_ctx)
        stage_ctx = {}

        def build_ctx(pb, stage, patch_size):
            if geo is not None:
                return dict(
                    nbr3=geo[f"nbr3_{stage}"],
                    parts={
                        oi: (geo[f"part_{stage}_{oi}_slot"], geo[f"part_{stage}_{oi}_inv"], False)
                        for oi in range(s_orders)
                    },
                )
            nbr3 = None
            if not (use_block and pb.capacity >= self.block_engine_min_points):
                if stage == 0 and nbr5 is not None and not isinstance(nbr5, dict):
                    # the stage-0 k3 map is a column subset of the stem k5 map
                    nbr3 = nbr5[:, jnp.asarray(k3_columns_of_k5())]
            elif stage == 0 and stage0_tables is not None:
                nbr3 = stage0_tables
            return self._stage_ctx(
                pb, stage, patch_size, sb=sb, used=used_orders(stage),
                ident0=ident0(stage), nbr3=nbr3,
                block_tables_fn=lambda: block_tables(pb, stage),
            )

        def pool_pre(stage):
            if geo is None:
                return None
            d = dict(
                cluster=geo[f"pool_{stage}_cluster"],
                grid=geo[f"pool_{stage}_grid"],
                batch=geo[f"pool_{stage}_batch"],
            )
            if f"pool_{stage}_segment" in geo:
                d["segment"] = geo[f"pool_{stage}_segment"]
            if f"pool_{stage}_coord" in geo:
                d["coord"] = geo[f"pool_{stage}_coord"]
            return d

        cap = pb.capacity
        cap_s_scene = pb.scene_capacity
        for s in range(num_stages):
            if s > 0:
                if sb:
                    # per-scene capacities aligned to the patch size keep the
                    # pooled stage scene-blocked
                    cap_s_scene = _round_up(
                        max(int(math.ceil(cap_s_scene * self.pool_capacity_factors[s - 1])), patch_align),
                        patch_align,
                    )
                    cap = pb.num_scenes * cap_s_scene
                else:
                    cap = _round_up(max(int(math.ceil(cap * self.pool_capacity_factors[s - 1])), 128), 128)
                skip_pb = pb
                pb, cluster = SerializedPooling(
                    out_channels=self.enc_channels[s],
                    out_capacity=cap,
                    stride=self.stride[s - 1],
                    reduce="max",
                    shuffle_orders=self.shuffle_orders,
                    pd=pd,
                    orders=orders,
                    scene_out=cap_s_scene if sb else None,
                    dtype=dt,
                    name=f"enc{s}_down",
                )(pb, train, rng_or_none("shuffle"), pre=pool_pre(s),
                  needed=None if shuffle_active else used_orders(s),
                  identity_order0=ident0(s - 1),
                  geom=None if precomputed is None else precomputed["pools"][s - 1])
                skips.append((skip_pb, cluster, stage_ctx))
            stage_ctx = (
                precomputed["stages"][s] if precomputed is not None
                else build_ctx(pb, s, self.enc_patch_size[s])
            )
            for i in range(self.enc_depths[s]):
                pb = Block(
                    channels=self.enc_channels[s],
                    num_heads=self.enc_num_head[s],
                    patch_size=self.enc_patch_size[s],
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    attn_drop=self.attn_drop,
                    proj_drop=self.proj_drop,
                    drop_path=enc_dp[sum(self.enc_depths[:s]) + i],
                    pre_norm=self.pre_norm,
                    order_index=i % s_orders,
                    enable_rpe=self.enable_rpe,
                    pd=pd,
                    lora_rank=self.lora_rank,
                    layer_scale=self.layer_scale,
                    rope_base=self.rope_base,
                    shift_coords=self.shift_coords,
                    jitter_coords=self.jitter_coords,
                    rescale_coords=self.rescale_coords,
                    dtype=dt,
                    name=f"enc{s}_block{i}",
                )(pb, stage_ctx["nbr3"], stage_ctx["parts"][i % s_orders], train)

        if not self.enc_mode:
            dec_channels = list(self.dec_channels) + [self.enc_channels[-1]]
            for s in reversed(range(num_stages - 1)):
                skip_pb, cluster, skip_ctx = skips[s]
                pb, stale_cpe_feat = SerializedUnpooling(
                    out_channels=dec_channels[s], pd=pd, dtype=dt, name=f"dec{s}_up"
                )(pb, skip_pb, cluster, train)
                dp_slice = dec_dp[sum(self.dec_depths[:s]) : sum(self.dec_depths[: s + 1])][::-1]
                for i in range(self.dec_depths[s]):
                    pb = Block(
                        channels=dec_channels[s],
                        num_heads=self.dec_num_head[s],
                        patch_size=self.dec_patch_size[s],
                        mlp_ratio=self.mlp_ratio,
                        qkv_bias=self.qkv_bias,
                        qk_scale=self.qk_scale,
                        attn_drop=self.attn_drop,
                        proj_drop=self.proj_drop,
                        drop_path=dp_slice[i],
                        pre_norm=self.pre_norm,
                        order_index=i % s_orders,
                        enable_rpe=self.enable_rpe,
                        pd=pd,
                        lora_rank=self.lora_rank,
                        layer_scale=self.layer_scale,
                        rope_base=self.rope_base,
                        shift_coords=self.shift_coords,
                        jitter_coords=self.jitter_coords,
                        rescale_coords=self.rescale_coords,
                        dtype=dt,
                        name=f"dec{s}_block{i}",
                    )(pb, skip_ctx["nbr3"], skip_ctx["parts"][i % s_orders], train,
                      cpe_feat=stale_cpe_feat if i == 0 else None)
            if unsort is not None:
                # restore the caller's point order; serialization state no
                # longer describes the layout
                pb = pb.reorder(unsort[0], unsort[1], rebase_orders=(), rebase_keys=False)
                pb = pb.replace(
                    serialized_keys=None, serialized_order=None, serialized_inverse=None,
                    scene_capacity=None,
                )
            return pb
        # enc_mode: expose the skip chain for SSL up_cast (reference enc_mode
        # leaves pooling_parent/pooling_inverse attached)
        return pb, skips


@MODELS.register_module("PT-v3m2")
class PointTransformerV3M2(PointTransformerV3):
    """Sonata variant (reference point_transformer_v3m2_sonata.py): linear
    embedding with optional mask token, LayerScale residual branches."""

    embed_mode: str = "linear"
    mask_token: bool = False
    layer_scale: Optional[float] = None


@MODELS.register_module("PT-v3m3")
class PointTransformerV3M3(PointTransformerV3M2):
    """Utonia variant (reference point_transformer_v3m3_utonia.py): v3m2 plus
    3D RoPE on q/k with optional train-time coordinate shift/jitter/rescale
    augmentation of the RoPE positions. Head dims must be divisible by 6
    (three axis chunks of rotation pairs)."""

    rope_base: Optional[float] = 10000.0
    shift_coords: Optional[float] = None
    jitter_coords: Optional[float] = None
    rescale_coords: Optional[float] = None
