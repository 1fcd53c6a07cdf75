"""OctFormer — octree attention backbone, TPU-native rebuild.

Reference: `pointcept/models/octformer/octformer_v1m1_base.py` (OctreeT
:34-111, OctreeDWConvBn :143-160, RPE :163-193, OctreeAttention :196-272,
OctFormerBlock :275-316, OctFormerStage :318-378, OctFormerDecoder :380-427,
PatchEmbed :430-480, Downsample :482-505, OctFormer :508-629) built on the
ocnn/dwconv CUDA libraries.

TPU redesign: an octree over GridSample'd points IS a voxel hierarchy — level
``l`` octants are the unique values of ``grid_coord >> l``, and the octree's
shuffled-key order is exactly the Morton order of `ops/serialization.py`. So:
- octant tables per level come from `build_strided_maps` (parent/child maps =
  ocnn's octree pooling structure);
- OctreeAttention = sort octants by (batch, Morton), reshape into static
  patches of K (dilated variant = a [G, K, D] transpose — a relabeling, not a
  gather), mask cross-batch pairs, add the RPE table bias on relative octant
  coords — all dense bf16 MXU attention;
- OctreeDWConv CPE = `depthwise_gather_conv` over the level's k3 neighbor map;
- PatchEmbed / Downsample = gather-GEMM convs + k2-s2 strided convs;
- decoder FPN upsample "nearest" = `feat[parent_of]`; head deconvs =
  `inverse_conv` through the stem's child-slot maps.
Fixed per-level capacities (`level_capacity_factor`) replace dynamic nnum.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import DropPath, MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.sparse_conv import (
    build_strided_maps,
    build_subm_neighbor_map,
    depthwise_gather_conv,
    gather_conv,
    inverse_conv,
)


class Level:
    """One octree level: octant grid/batch/mask + links to the finer level."""

    def __init__(self, grid, batch, mask, depth, parent_of=None, child=None, child_slot=None):
        self.grid, self.batch, self.mask, self.depth = grid, batch, mask, depth
        self.parent_of, self.child, self.child_slot = parent_of, child, child_slot
        self.kb = jnp.where(mask, batch, ser.BATCH_SENTINEL)
        self._nbr = None

    def nbr(self):
        if self._nbr is None:
            self._nbr = build_subm_neighbor_map(self.grid, self.kb, self.mask, self.depth, 3)
        return self._nbr


def build_levels(pb: PointBatch, num_levels: int, depth0: int, capacity_factor: float):
    """Octree level chain from the full-resolution voxel grid."""
    levels = [Level(pb.grid_coord, pb.batch, pb.mask, depth0)]
    for l in range(1, num_levels):
        prev = levels[-1]
        cap = prev.grid.shape[0]
        new_cap = max(int(cap * capacity_factor) // 8 * 8, 8)
        out_grid, out_batch, child, parent_of, child_slot = build_strided_maps(
            prev.grid, prev.kb, prev.mask, prev.depth, new_cap
        )
        levels.append(
            Level(out_grid, out_batch, out_batch >= 0, prev.depth - 1,
                  parent_of=parent_of, child=child, child_slot=child_slot)
        )
    return levels


class ConvBnRelu(nn.Module):
    """ocnn OctreeConvBnRelu (k3 s1) equivalent."""

    out_channels: int

    @nn.compact
    def __call__(self, feat, level: Level, train: bool):
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (27, feat.shape[-1], self.out_channels),
        )
        x = gather_conv(feat, level.nbr(), w)
        x = MaskedBatchNorm(momentum=0.01, eps=1e-3, name="bn")(x, level.mask, train)
        return nn.relu(x)


class DownConv(nn.Module):
    """ocnn OctreeConv k2 s2 (+BN); children -> parent."""

    out_channels: int
    relu: bool = False

    @nn.compact
    def __call__(self, feat, coarse: Level, train: bool):
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (8, feat.shape[-1], self.out_channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        x = gather_conv(feat, coarse.child, w, b)
        x = MaskedBatchNorm(momentum=0.01, eps=1e-3, name="bn")(x, coarse.mask, train)
        return nn.relu(x) if self.relu else x


class UpConv(nn.Module):
    """ocnn OctreeDeconv k2 s2 (+BN+ReLU); parent -> children."""

    out_channels: int

    @nn.compact
    def __call__(self, feat_coarse, coarse: Level, fine: Level, train: bool):
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (8, feat_coarse.shape[-1], self.out_channels),
        )
        x = inverse_conv(feat_coarse, coarse.parent_of, coarse.child_slot, w)
        x = MaskedBatchNorm(momentum=0.01, eps=1e-3, name="bn")(x, fine.mask, train)
        return nn.relu(x)


class OctreeAttention(nn.Module):
    """Reference OctreeAttention :196-272 — patch attention over Morton-sorted
    octants with optional dilation regrouping and RPE bias."""

    channels: int
    num_heads: int
    patch_size: int
    dilation: int = 1
    use_rpe: bool = True
    qkv_bias: bool = True
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, feat, level: Level, train: bool):
        n = feat.shape[0]
        k = self.patch_size
        dil = self.dilation
        h = self.num_heads
        hd = self.channels // h
        block = k * dil
        n_pad = -(-n // block) * block

        keys = ser.encode(level.grid, level.kb, level.depth, "z")
        order = ser.argsort_keys(keys)

        qkv = nn.Dense(3 * self.channels, use_bias=self.qkv_bias, name="qkv")(feat)
        pad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((n_pad - n,) + a.shape[1:], fill, a.dtype)], 0
        ) if n_pad > n else a
        qkv_s = pad(qkv[order], 0.0)
        batch_s = pad(jnp.where(level.mask, level.batch, -1)[order], jnp.int32(-1))
        xyz_s = pad(level.grid[order], jnp.int32(0))

        def regroup(a):
            # [G*K*D, ...] -> dilated groups [G*D, K, ...] (pure transpose)
            if dil == 1:
                return a.reshape(n_pad // k, k, *a.shape[1:])
            g = a.reshape(n_pad // block, k, dil, *a.shape[1:])
            g = jnp.moveaxis(g, 2, 1)
            return g.reshape(n_pad // k, k, *a.shape[1:])

        qkv_g = regroup(qkv_s).reshape(n_pad // k, k, 3, h, hd)
        b_g = regroup(batch_s)
        xyz_g = regroup(xyz_s)

        q, kk, v = qkv_g[:, :, 0], qkv_g[:, :, 1], qkv_g[:, :, 2]
        scale = self.qk_scale or hd**-0.5
        attn = jnp.einsum("gihd,gjhd->ghij", q * scale, kk)

        if self.use_rpe:
            pos_bnd = int(0.8 * k * dil**0.5)
            rpe_num = 2 * pos_bnd + 1
            table = self.param(
                "rpe_table", nn.initializers.truncated_normal(0.02), (3 * rpe_num, h)
            )
            rel = xyz_g[:, :, None, :] - xyz_g[:, None, :, :]  # [G,K,K,3]
            idx = jnp.clip(rel, -pos_bnd, pos_bnd) + pos_bnd + jnp.arange(3) * rpe_num
            bias = jnp.take(table, idx.reshape(-1), axis=0).reshape(idx.shape + (h,)).sum(3)
            attn = attn + bias.transpose(0, 3, 1, 2)

        same = (b_g[:, :, None] == b_g[:, None, :]) & (b_g[:, :, None] >= 0)
        attn = jnp.where(same[:, None], attn, -1e3)
        probs = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("ghij,gjhd->gihd", probs, v).reshape(n_pad // k, k, self.channels)

        def ungroup(a):
            if dil == 1:
                return a.reshape(n_pad, *a.shape[2:])
            g = a.reshape(n_pad // block, dil, k, *a.shape[2:])
            g = jnp.moveaxis(g, 1, 2)
            return g.reshape(n_pad, *a.shape[2:])

        out = ungroup(out)[:n]
        inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        out = out[inv]
        return nn.Dense(self.channels, name="proj")(out)


class OctFormerBlock(nn.Module):
    """Reference :275-316 — CPE (depthwise conv) + attention + MLP."""

    channels: int
    num_heads: int
    patch_size: int
    dilation: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_rpe: bool = True

    @nn.compact
    def __call__(self, feat, level: Level, train: bool):
        wd = self.param(
            "cpe_weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (27, self.channels),
        )
        cpe = depthwise_gather_conv(feat, level.nbr(), wd)
        cpe = MaskedBatchNorm(momentum=0.01, eps=1e-3, name="cpe_bn")(cpe, level.mask, train)
        x = feat + cpe
        attn = OctreeAttention(
            self.channels, self.num_heads, self.patch_size, self.dilation,
            use_rpe=self.use_rpe, name="attention",
        )(nn.LayerNorm(name="norm1")(x), level, train)
        x = x + DropPath(self.drop_path)(attn, train)
        y = nn.Dense(int(self.channels * self.mlp_ratio), name="mlp_fc1")(nn.LayerNorm(name="norm2")(x))
        y = nn.Dense(self.channels, name="mlp_fc2")(nn.gelu(y))
        x = x + DropPath(self.drop_path)(y, train)
        return jnp.where(level.mask[:, None], x, 0.0)


@MODELS.register_module("OctFormer-v1m1")
class OctFormer(nn.Module):
    """Reference OctFormer :508-629 (semantic segmentation variant)."""

    in_channels: int = 6
    num_classes: int = 20
    fpn_channels: int = 168
    channels: Sequence[int] = (96, 192, 384, 384)
    num_blocks: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 24)
    patch_size: int = 26
    stem_down: int = 2
    head_up: int = 2
    dilation: int = 4
    drop_path: float = 0.5
    # TPU knobs
    serialize_depth: int = 11  # voxel grid depth == octree depth
    level_capacity_factor: float = 0.45

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        assert self.head_up == self.stem_down, "decoder returns to the input level"
        num_stages = len(self.num_blocks)
        num_levels = self.stem_down + num_stages
        levels = build_levels(pb, num_levels, self.serialize_depth, self.level_capacity_factor)

        feat = pb.feat
        ch = [int(self.channels[0] * 2**i) for i in range(-self.stem_down, 1)]
        for i in range(self.stem_down):
            feat = ConvBnRelu(ch[i], name=f"embed_conv{i}")(feat, levels[i], train)
            feat = DownConv(ch[i + 1], relu=True, name=f"embed_down{i}")(feat, levels[i + 1], train)
        feat = ConvBnRelu(self.channels[0], name="embed_proj")(feat, levels[self.stem_down], train)

        dpr = np.linspace(0, self.drop_path, sum(self.num_blocks)).tolist()
        features = {}
        for s in range(num_stages):
            lvl = levels[self.stem_down + s]
            for b in range(self.num_blocks[s]):
                feat = OctFormerBlock(
                    self.channels[s],
                    self.num_heads[s],
                    self.patch_size,
                    dilation=1 if b % 2 == 0 else self.dilation,
                    drop_path=dpr[sum(self.num_blocks[:s]) + b],
                    name=f"stage{s}_block{b}",
                )(feat, lvl, train)
            features[s] = feat
            if s < num_stages - 1:
                feat = DownConv(self.channels[s + 1], name=f"down{s}")(
                    feat, levels[self.stem_down + s + 1], train
                )

        # FPN decoder (reference OctFormerDecoder :380-427); stage s=0 is the
        # finest stage level, s=num_stages-1 the coarsest.
        def up_nearest(x, from_s, to_s):
            # coarse stage -> finer stage: copy parent features to children
            for s in range(from_s, to_s, -1):
                lvl = levels[self.stem_down + s]
                m = x.shape[0]
                p = jnp.minimum(lvl.parent_of, m - 1)
                x = jnp.where((lvl.parent_of < m)[:, None], x[p], 0.0)
            return x

        deepest = num_stages - 1
        feature = nn.Dense(self.fpn_channels, name="fpn_conv1x1_0")(features[deepest])
        conv_out = ConvBnRelu(self.fpn_channels, name="fpn_conv3x3_0")(
            feature, levels[self.stem_down + deepest], train
        )
        out = up_nearest(conv_out, deepest, 0)
        for i in range(1, num_stages):
            s = deepest - i
            feature = up_nearest(feature, s + 1, s)
            feature = nn.Dense(self.fpn_channels, name=f"fpn_conv1x1_{i}")(features[s]) + feature
            conv_out = ConvBnRelu(self.fpn_channels, name=f"fpn_conv3x3_{i}")(
                feature, levels[self.stem_down + s], train
            )
            out = out + up_nearest(conv_out, s, 0)

        # head deconvs back to the input (full-depth) level
        for i in range(self.head_up):
            li = self.stem_down - i  # coarse level index
            out = UpConv(self.fpn_channels, name=f"head_up{i}")(
                out, levels[li], levels[li - 1], train
            )

        x = nn.Dense(self.fpn_channels, name="seg_fc1")(out)
        x = MaskedBatchNorm(momentum=0.01, eps=1e-3, name="seg_bn")(x, pb.mask, train)
        x = nn.relu(x)
        logits = nn.Dense(self.num_classes, name="seg_fc2")(x)
        return pb.replace(feat=logits)
