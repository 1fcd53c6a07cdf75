"""LitePT — lightweight point transformer with PointROPE attention (TPU-native).

Reference: `pointcept/models/litept/litept_v1.py` (LitePT-v1): PTv3-style
serialized U-Net where early stages are conv-only (SubM k3) and deep stages are
attention-only with 3D rotary position embedding instead of xCPE; decoder
stages default to depth 0 (pure unpooling). Reuses this framework's PTv3
machinery (patch partitioning, serialized pooling, gather-GEMM convs) with the
RoPE from `ops/pointrope` fused into the patch attention.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import DropPath, LayerNorm, MaskedBatchNorm, MLP
from pointcept_tpu.models.point_transformer_v3.point_transformer_v3 import (
    Embedding,
    SerializedPooling,
    SerializedUnpooling,
    SubMConv,
    conv_kernel_init,
    _round_up,
)
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops.attention import patch_attention
from pointcept_tpu.ops.pointrope import point_rope
from pointcept_tpu.ops.sparse_conv import build_subm_neighbor_map


class PointROPEAttention(nn.Module):
    """Reference `PointROPEAttention` (`litept_v1.py:128-260`)."""

    channels: int
    num_heads: int
    patch_size: int
    rope_freq: float = 100.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, feat, grid_coord, partition, train: bool):
        c = self.channels
        h = self.num_heads
        d = c // h
        k = self.patch_size
        scale = self.qk_scale or d**-0.5
        slot_to_point, point_to_slot = partition
        p = slot_to_point.shape[0]
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=conv_kernel_init, name="qkv")(feat)
        qkv_p = jnp.take(qkv, slot_to_point, axis=0).reshape(p // k, k, 3, h, d)
        q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)
        kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
        pos = jnp.take(grid_coord, slot_to_point, axis=0).reshape(p // k, k, 3)
        q = point_rope(q, pos, self.rope_freq)
        kk = point_rope(kk, pos, self.rope_freq)
        q = q.astype(jnp.bfloat16)
        kk = kk.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        attn = jnp.einsum("phkd,phmd->phkm", q * scale, kk, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("phkm,phmd->phkd", attn, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(p, c)
        out = jnp.take(out, point_to_slot, axis=0).astype(feat.dtype)
        out = nn.Dense(c, kernel_init=conv_kernel_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class LitePTBlock(nn.Module):
    """Reference `Block` (`litept_v1.py:303-403`): optional conv and/or RoPE
    attention branches + MLP, pre-norm residuals."""

    channels: int
    num_heads: int
    patch_size: int
    rope_freq: float = 100.0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    proj_drop: float = 0.0
    drop_path: float = 0.0
    pre_norm: bool = True
    order_index: int = 0
    enable_conv: bool = True
    enable_attn: bool = False

    @nn.compact
    def __call__(self, pb: PointBatch, nbr3, partition, train: bool) -> PointBatch:
        c = self.channels
        feat = pb.feat
        if self.enable_conv:
            shortcut = feat
            x = LayerNorm(name="norm0")(feat) if self.pre_norm else feat
            x = SubMConv(c, 27, use_bias=True, name="conv")(x, nbr3)
            x = DropPath(self.drop_path, name="drop_path0")(x, train)
            feat = shortcut + x
        if self.enable_attn:
            shortcut = feat
            x = LayerNorm(name="norm1")(feat) if self.pre_norm else feat
            x = PointROPEAttention(
                channels=c,
                num_heads=self.num_heads,
                patch_size=self.patch_size,
                rope_freq=self.rope_freq,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                proj_drop=self.proj_drop,
                name="attn",
            )(x, pb.grid_coord, partition, train)
            x = DropPath(self.drop_path, name="drop_path1")(x, train)
            feat = shortcut + x
        shortcut = feat
        x = LayerNorm(name="norm2")(feat) if self.pre_norm else feat
        x = MLP(hidden_channels=int(c * self.mlp_ratio), out_channels=c, drop=self.proj_drop, name="mlp")(x, train)
        x = DropPath(self.drop_path, name="drop_path2")(x, train)
        feat = shortcut + x
        return pb.replace(feat=feat)


@MODELS.register_module("LitePT-v1")
class LitePT(nn.Module):
    in_channels: int = 4
    order: Sequence[str] = ("z", "z-trans", "hilbert", "hilbert-trans")
    stride: Sequence[int] = (2, 2, 2, 2)
    enc_depths: Sequence[int] = (2, 2, 2, 6, 2)
    enc_channels: Sequence[int] = (36, 72, 144, 252, 504)
    enc_num_head: Sequence[int] = (2, 4, 8, 14, 28)
    enc_patch_size: Sequence[int] = (1024, 1024, 1024, 1024, 1024)
    enc_conv: Sequence[bool] = (True, True, True, False, False)
    enc_attn: Sequence[bool] = (False, False, False, True, True)
    enc_rope_freq: Sequence[float] = (100.0,) * 5
    dec_depths: Sequence[int] = (0, 0, 0, 0)
    dec_channels: Sequence[int] = (72, 72, 144, 252)
    dec_num_head: Sequence[int] = (4, 4, 8, 14)
    dec_patch_size: Sequence[int] = (1024, 1024, 1024, 1024)
    dec_conv: Sequence[bool] = (False, False, False, False)
    dec_attn: Sequence[bool] = (False, False, False, False)
    dec_rope_freq: Sequence[float] = (100.0,) * 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.3
    pre_norm: bool = True
    shuffle_orders: bool = True
    enc_mode: bool = False
    serialize_depth: int = 12
    pool_capacity_factors: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    grid_size: float = 0.02

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        orders = tuple(self.order) if not isinstance(self.order, str) else (self.order,)
        s_orders = len(orders)
        num_stages = len(self.enc_depths)

        def rng_or_none():
            if self.shuffle_orders and self.has_rng("shuffle"):
                return self.make_rng("shuffle")
            return None

        pb = pb.with_grid_coord(self.grid_size)
        pb = pb.serialize(orders=orders, depth=self.serialize_depth, shuffle_key=rng_or_none())

        enc_dp = np.linspace(0, self.drop_path, max(sum(self.enc_depths), 1)).tolist()
        pb = Embedding(self.enc_channels[0], name="embedding")(
            pb,
            build_subm_neighbor_map(pb.grid_coord, pb.key_batch(), pb.mask, self.serialize_depth, 5),
            train,
        )

        skips = []
        stage_ctx = None

        def build_ctx(pb, stage, patch_size, need_conv, need_attn):
            depth_s = self.serialize_depth - stage
            nbr3 = (
                build_subm_neighbor_map(pb.grid_coord, pb.key_batch(), pb.mask, depth_s, 3)
                if need_conv
                else None
            )
            parts = [pb.patch_partition(oi, patch_size) for oi in range(s_orders)] if need_attn else None
            return dict(nbr3=nbr3, parts=parts)

        cap = pb.capacity
        for s in range(num_stages):
            if s > 0:
                cap = _round_up(max(int(math.ceil(cap * self.pool_capacity_factors[s - 1])), 128), 128)
                skip_pb = pb
                pb, cluster = SerializedPooling(
                    out_channels=self.enc_channels[s],
                    out_capacity=cap,
                    stride=self.stride[s - 1],
                    reduce="max",
                    shuffle_orders=self.shuffle_orders,
                    name=f"enc{s}_down",
                )(pb, train, rng_or_none())
                skips.append((skip_pb, cluster, stage_ctx))
            stage_ctx = build_ctx(pb, s, self.enc_patch_size[s], self.enc_conv[s], self.enc_attn[s])
            for i in range(self.enc_depths[s]):
                pb = LitePTBlock(
                    channels=self.enc_channels[s],
                    num_heads=self.enc_num_head[s],
                    patch_size=self.enc_patch_size[s],
                    rope_freq=self.enc_rope_freq[s],
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    proj_drop=self.proj_drop,
                    drop_path=enc_dp[sum(self.enc_depths[:s]) + i],
                    pre_norm=self.pre_norm,
                    order_index=i % s_orders,
                    enable_conv=self.enc_conv[s],
                    enable_attn=self.enc_attn[s],
                    name=f"enc{s}_block{i}",
                )(pb, stage_ctx["nbr3"], (stage_ctx["parts"] or [None])[i % s_orders] if stage_ctx["parts"] else None, train)

        if not self.enc_mode:
            dec_channels = list(self.dec_channels) + [self.enc_channels[-1]]
            for s in reversed(range(num_stages - 1)):
                skip_pb, cluster, skip_ctx = skips[s]
                pb, _ = SerializedUnpooling(out_channels=dec_channels[s], name=f"dec{s}_up")(
                    pb, skip_pb, cluster, train
                )
                for i in range(self.dec_depths[s]):
                    ctx = skip_ctx or build_ctx(pb, s, self.dec_patch_size[s], self.dec_conv[s], self.dec_attn[s])
                    pb = LitePTBlock(
                        channels=dec_channels[s],
                        num_heads=self.dec_num_head[s],
                        patch_size=self.dec_patch_size[s],
                        rope_freq=self.dec_rope_freq[s],
                        mlp_ratio=self.mlp_ratio,
                        qkv_bias=self.qkv_bias,
                        qk_scale=self.qk_scale,
                        proj_drop=self.proj_drop,
                        drop_path=0.0,
                        pre_norm=self.pre_norm,
                        order_index=i % s_orders,
                        enable_conv=self.dec_conv[s],
                        enable_attn=self.dec_attn[s],
                        name=f"dec{s}_block{i}",
                    )(pb, ctx["nbr3"], (ctx["parts"] or [None] * s_orders)[i % s_orders], train)
            return pb
        return pb, skips
