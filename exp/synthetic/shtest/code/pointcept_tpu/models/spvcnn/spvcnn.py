"""SPVCNN (sparse point-voxel CNN) — TPU-native.

Reference: `pointcept/models/spvcnn/ts_spvcnn.py:178` (torchsparse SPVCNN):
MinkUNet-style sparse U-Net with a parallel point branch — `voxel_to_point` /
`point_to_voxel` exchanges at stem, bottleneck and two decoder junctions, with
point-transform MLP residuals. torchsparse's hash voxelize/devoxelize becomes
this framework's strided parent maps: `voxel_to_point` = composed parent-chain
gather (nearest devoxelize; the reference uses trilinear — documented
deviation), `point_to_voxel` = the identity at full resolution (the data
contract is one point per voxel after GridSample).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.sparse_conv import (
    build_strided_maps,
    build_subm_neighbor_map,
    gather_conv,
    inverse_conv,
    strided_conv,
)

init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class ConvBNReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, feat, nbr, mask, train):
        w = self.param("weight", init, (nbr.shape[1], feat.shape[-1], self.channels))
        x = gather_conv(feat, nbr, w)
        return nn.relu(MaskedBatchNorm(name="norm")(x, mask, train))


class ResidualBlock(nn.Module):
    """SubM k3 residual block (reference `ts_spvcnn.py:152`)."""

    channels: int

    @nn.compact
    def __call__(self, feat, nbr3, mask, train):
        cin = feat.shape[-1]
        w1 = self.param("w1", init, (27, cin, self.channels))
        x = gather_conv(feat, nbr3, w1)
        x = nn.relu(MaskedBatchNorm(name="bn1")(x, mask, train))
        w2 = self.param("w2", init, (27, self.channels, self.channels))
        x = gather_conv(x, nbr3, w2)
        x = MaskedBatchNorm(name="bn2")(x, mask, train)
        if cin != self.channels:
            wd = self.param("wd", init, (1, cin, self.channels))
            self_idx = jnp.where(mask, jnp.arange(feat.shape[0], dtype=jnp.int32), -1)[:, None]
            res = gather_conv(feat, self_idx, wd)
            res = MaskedBatchNorm(name="bnd")(res, mask, train)
        else:
            res = feat
        return nn.relu(x + res)


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    in_channels: int = 4
    out_channels: int = 19
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    serialize_depth: int = 12
    pool_capacity_factor: float = 0.5
    grid_size: float = 0.05

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        ch = self.channels
        pb = pb.with_grid_coord(self.grid_size)
        grid = jnp.clip(pb.grid_coord, 0, (1 << self.serialize_depth) - 1)
        kb = pb.key_batch()
        mask = pb.mask
        levels = [dict(grid=grid, kb=kb, mask=mask, depth=self.serialize_depth)]
        nbr0 = build_subm_neighbor_map(grid, kb, mask, self.serialize_depth, 3)

        # stem (k3 conv x2)
        x = ConvBNReLU(self.base_channels, name="stem1")(pb.feat, nbr0, mask, train)
        x0 = ConvBNReLU(self.base_channels, name="stem2")(x, nbr0, mask, train)
        z0 = x0  # voxel_to_point at full res == identity under our data contract

        # encoder: 4 strided stages
        strided = []
        feats = [x0]
        cap = pb.capacity
        feat = x0
        for s in range(4):
            lv = levels[s]
            cap = _round_up(max(int(math.ceil(cap * self.pool_capacity_factor)), 128), 128)
            og, ob, child, parent_of, child_slot = build_strided_maps(
                lv["grid"], lv["kb"], lv["mask"], lv["depth"], cap
            )
            om = ob >= 0
            okb = jnp.where(om, ob, ser.BATCH_SENTINEL)
            levels.append(dict(grid=og, kb=okb, mask=om, depth=lv["depth"] - 1))
            strided.append(dict(child=child, parent_of=parent_of, child_slot=child_slot))
            wd = self.param(f"down{s}_weight", init, (8, feat.shape[-1], feat.shape[-1]))
            feat = strided_conv(feat, child, wd)
            feat = nn.relu(MaskedBatchNorm(name=f"down{s}_norm")(feat, om, train))
            nbr3 = build_subm_neighbor_map(og, okb, om, lv["depth"] - 1, 3)
            levels[s + 1]["nbr3"] = nbr3
            for i in range(self.layers[s]):
                cout = ch[s]
                feat = ResidualBlock(cout, name=f"enc{s}_block{i}")(feat, nbr3, om, train)
            feats.append(feat)

        # point branch at bottleneck: z1 = devoxelize(x4) + mlp(z0)
        def devoxelize(f, to_level):
            """gather features of level `to_level` down to full-res points."""
            idx = jnp.arange(pb.capacity, dtype=jnp.int32)
            ok = mask
            for s in range(to_level):
                p = strided[s]["parent_of"][idx]
                ok = ok & (p < strided[s]["child"].shape[0])
                idx = jnp.minimum(p, strided[s]["child"].shape[0] - 1)
            out = f[idx]
            return jnp.where(ok[:, None], out, 0)

        z1 = devoxelize(feat, 4)
        z1 = z1 + nn.relu(
            MaskedBatchNorm(name="pt0_norm")(nn.Dense(ch[3], name="pt0")(z0), mask, train)
        )

        # decoder with skip concat; voxel features re-seeded from points at junctions
        def revoxelize(zf, to_level):
            """scatter point features up to level voxels (mean over children chain
            is approximated by the head child == nearest; matches nearest devox)."""
            # point -> its voxel at to_level via parent chain; use segment mean
            idx = jnp.arange(pb.capacity, dtype=jnp.int32)
            ok = mask
            for s in range(to_level):
                p = strided[s]["parent_of"][idx]
                ok = ok & (p < strided[s]["child"].shape[0])
                idx = jnp.minimum(p, strided[s]["child"].shape[0] - 1)
            m = levels[to_level]["mask"].shape[0]
            from pointcept_tpu.ops.segment_ops import masked_segment_reduce

            return masked_segment_reduce(zf, idx, ok, m, "mean")

        y = revoxelize(z1, 4)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        zs = [z0, z1]
        for d in range(4):
            lvl = 4 - d - 1  # target level after deconv
            st = strided[lvl]
            wu = self.param(f"up{d}_weight", init, (8, y.shape[-1], ch[4 + d]))
            y = inverse_conv(y, st["parent_of"], st["child_slot"], wu)
            om = levels[lvl]["mask"]
            y = nn.relu(MaskedBatchNorm(name=f"up{d}_norm")(y, om, train))
            y = jnp.concatenate([y, feats[lvl]], axis=-1)
            nbr3 = levels[lvl].get("nbr3", nbr0)
            for i in range(self.layers[4 + d]):
                y = ResidualBlock(ch[4 + d], name=f"dec{d}_block{i}")(y, nbr3, om, train)
            if d == 1:
                z2 = devoxelize(y, lvl) + nn.relu(
                    MaskedBatchNorm(name="pt1_norm")(nn.Dense(ch[5], name="pt1")(z1), mask, train)
                )
                zs.append(z2)
                y = revoxelize(z2, lvl)
                y = nn.Dropout(0.3, deterministic=not train)(y)

        z3 = y + nn.relu(
            MaskedBatchNorm(name="pt2_norm")(nn.Dense(ch[7], name="pt2")(zs[-1]), mask, train)
        )
        logits = nn.Dense(self.out_channels, name="classifier")(z3)
        return pb.replace(feat=logits)
