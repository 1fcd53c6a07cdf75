"""OA-CNNs (Omni-Adaptive sparse CNNs) — TPU-native.

Reference: `pointcept/models/oacnns/oacnns_v1m1_base.py:213` (OACNNs):
SubM k3 stem x3 -> 4 down stages (SparseConv k2 s2 + BasicBlocks with
multi-scale adaptive cluster attention) -> 4 up stages (inverse conv +
fuse-MLP) -> SubM k1 head. The adaptive block pools features per voxel-grid
cluster at several scales with per-point softmax gates (`BasicBlock.forward`).

TPU reworks: voxel_grid clustering = sorted-run cluster ids (capacity = point
capacity, no overflow); scatter means/sums = masked segment reductions; SubM
convs = gather-GEMM rule maps shared per stage.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.segment_ops import masked_segment_reduce
from pointcept_tpu.ops.sparse_conv import (
    build_strided_maps,
    build_subm_neighbor_map,
    gather_conv,
    inverse_conv,
    strided_conv,
)

trunc_init = nn.initializers.truncated_normal(0.02)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def voxel_clusters(grid, kb, mask, size: int, depth: int):
    """Cluster ids by coarsened voxel grid (torch_geometric.voxel_grid equiv)."""
    coarse = jnp.clip(grid // size, 0, (1 << depth) - 1)
    keys = ser.encode(coarse, jnp.where(mask, kb, ser.BATCH_SENTINEL), depth, "z")
    order = ser.argsort_keys(keys)
    sk = keys[order]
    valid_sorted = mask[order]
    prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
    head = valid_sorted & ~prev_eq
    cluster_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    n = grid.shape[0]
    return jnp.full((n,), n, jnp.int32).at[order].set(jnp.where(valid_sorted, cluster_sorted, n))


class NLB(nn.Module):
    """Linear + BN + ReLU."""

    channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, train):
        x = nn.Dense(self.channels, use_bias=self.use_bias, kernel_init=trunc_init)(x)
        return nn.relu(MaskedBatchNorm(name="norm")(x, mask, train))


class SpConvK3(nn.Module):
    channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feat, nbr):
        cin = feat.shape[-1]
        w = self.param("weight", trunc_init, (27, cin, self.channels))
        b = self.param("bias", nn.initializers.zeros, (self.channels,)) if self.use_bias else None
        return gather_conv(feat, nbr, w, b)


class OABasicBlock(nn.Module):
    """Adaptive multi-scale cluster attention block (reference `BasicBlock:20`)."""

    embed_channels: int
    num_scales: int  # = len(point_grid_size)

    @nn.compact
    def __call__(self, feat, clusters, nbr3, mask, train):
        c = self.embed_channels
        n = feat.shape[0]
        feats = []
        for i, cluster in enumerate(clusters):
            pw = NLB(c, name=f"l_w{i}")(feat, mask, train)
            mean = masked_segment_reduce(pw, cluster, mask, n, "mean")
            pw = pw - mean[jnp.minimum(cluster, n - 1)]
            pw = nn.Dense(c, use_bias=False, kernel_init=trunc_init, name=f"weight{i}")(pw)
            pw = jnp.exp(pw - jnp.max(jnp.where(mask[:, None], pw, -jnp.inf)))
            denom = masked_segment_reduce(pw, cluster, mask, n, "sum")
            pw = pw / (denom[jnp.minimum(cluster, n - 1)] + 1e-6)
            pfeat = NLB(c, name=f"proj{i}")(feat, mask, train) * pw
            pooled = masked_segment_reduce(pfeat, cluster, mask, n, "sum")
            feats.append(pooled[jnp.minimum(cluster, n - 1)])
        adp = nn.Dense(self.num_scales, use_bias=False, kernel_init=trunc_init, name="adaptive")(feat)
        adp = jax.nn.softmax(adp.astype(jnp.float32), axis=1).astype(feat.dtype)
        stacked = jnp.stack(feats, axis=1)  # [N, S, C]
        mixed = jnp.einsum("ns,nsc->nc", adp, stacked)
        x = NLB(c, name=f"proj{self.num_scales}")(feat, mask, train)
        x = jnp.concatenate([x, mixed], axis=1)
        x = NLB(c, name="fuse")(x, mask, train)
        x = x + feat
        res = x
        y = SpConvK3(c, name="vb_conv1")(x, nbr3)
        y = nn.relu(MaskedBatchNorm(name="vb_norm1")(y, mask, train))
        y = SpConvK3(c, name="vb_conv2")(y, nbr3)
        y = MaskedBatchNorm(name="vb_norm2")(y, mask, train)
        return nn.relu(y + res)


@MODELS.register_module("OACNNs")
class OACNNs(nn.Module):
    in_channels: int = 6
    num_classes: int = 20
    embed_channels: int = 64
    enc_num_ref: Sequence[int] = (16, 16, 16, 16)
    enc_channels: Sequence[int] = (64, 64, 128, 256)
    groups: Sequence[int] = (2, 4, 8, 16)
    enc_depth: Sequence[int] = (2, 3, 6, 4)
    down_ratio: Sequence[int] = (2, 2, 2, 2)
    dec_channels: Sequence[int] = (96, 96, 128, 256)
    point_grid_size: Sequence[Sequence[int]] = ((16, 32, 64), (8, 16, 24), (4, 8, 12), (2, 4, 6))
    dec_depth: Sequence[int] = (2, 2, 2, 2)
    serialize_depth: int = 12
    pool_capacity_factor: float = 0.5
    grid_size: float = 0.02

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        num_stages = len(self.enc_channels)
        pb = pb.with_grid_coord(self.grid_size)
        grid = jnp.clip(pb.grid_coord, 0, (1 << self.serialize_depth) - 1)
        kb = pb.key_batch()
        mask = pb.mask
        levels = [dict(grid=grid, kb=kb, mask=mask, depth=self.serialize_depth)]

        nbr_stem = build_subm_neighbor_map(grid, kb, mask, self.serialize_depth, 3)
        feat = pb.feat
        for i in range(3):
            feat = SpConvK3(self.embed_channels, name=f"stem_conv{i}")(feat, nbr_stem)
            feat = nn.relu(MaskedBatchNorm(name=f"stem_norm{i}")(feat, mask, train))

        skips = [feat]
        strided = []
        cap = pb.capacity
        for s in range(num_stages):
            lv = levels[s]
            cap = _round_up(max(int(math.ceil(cap * self.pool_capacity_factor)), 128), 128)
            out_grid, out_batch, child, parent_of, child_slot = build_strided_maps(
                lv["grid"], lv["kb"], lv["mask"], lv["depth"], cap
            )
            out_mask = out_batch >= 0
            out_kb = jnp.where(out_mask, out_batch, ser.BATCH_SENTINEL)
            levels.append(dict(grid=out_grid, kb=out_kb, mask=out_mask, depth=lv["depth"] - 1))
            strided.append(dict(child=child, parent_of=parent_of, child_slot=child_slot))
            w = self.param(f"down{s}_weight", trunc_init, (8, feat.shape[-1], self.enc_channels[s]))
            feat = strided_conv(feat, child, w)
            feat = nn.relu(MaskedBatchNorm(name=f"down{s}_norm")(feat, out_mask, train))
            nbr3 = build_subm_neighbor_map(out_grid, out_kb, out_mask, lv["depth"] - 1, 3)
            levels[s + 1]["nbr3"] = nbr3
            clusters = [
                voxel_clusters(out_grid, out_kb, out_mask, g, lv["depth"] - 1)
                for g in self.point_grid_size[s]
            ]
            for d in range(self.enc_depth[s]):
                feat = OABasicBlock(
                    self.enc_channels[s], len(self.point_grid_size[s]), name=f"enc{s}_block{d}"
                )(feat, clusters, nbr3, out_mask, train)
            skips.append(feat)

        feat = skips.pop()
        for s in reversed(range(num_stages)):
            st = strided[s]
            w = self.param(f"up{s}_weight", trunc_init, (8, feat.shape[-1], self.dec_channels[s]))
            feat = inverse_conv(feat, st["parent_of"], st["child_slot"], w)
            lv_mask = levels[s]["mask"]
            feat = nn.relu(MaskedBatchNorm(name=f"up{s}_norm")(feat, lv_mask, train))
            skip = skips.pop()
            x = jnp.concatenate([feat, skip], axis=1)
            x = NLB(self.dec_channels[s], use_bias=True, name=f"fuse{s}a")(x, lv_mask, train)
            x = NLB(self.dec_channels[s], use_bias=True, name=f"fuse{s}b")(x, lv_mask, train)
            feat = x + feat

        w = self.param("final_weight", trunc_init, (1, feat.shape[-1], self.num_classes))
        b = self.param("final_bias", nn.initializers.zeros, (self.num_classes,))
        self_idx = jnp.where(mask, jnp.arange(feat.shape[0], dtype=jnp.int32), -1)[:, None]
        logits = gather_conv(feat, self_idx, w, b)
        return pb.replace(feat=logits)
