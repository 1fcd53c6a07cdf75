"""SpUNet (MinkUNet-style sparse-conv U-Net) — TPU-native gather-GEMM build.

Reference: `pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:88` (SpUNet-v1m1):
SubM k5 stem -> 4x [SparseConv k2 s2 + BasicBlock xL] -> 4x [SparseInverseConv k2
+ skip-concat + BasicBlock xL] -> SubM k1 head. spconv's indice-key rule-map
reuse maps to one neighbor table per resolution level (k3) plus one
parent/child table per striding, all built once per forward and shared.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import MaskedBatchNorm, PDNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.block_conv import block_subm_conv, build_block_tables, default_block_capacity
from pointcept_tpu.ops.sparse_conv import (
    build_strided_maps,
    build_subm_neighbor_map,
    k3_columns_of_k5,
    gather_conv,
    inverse_conv,
    strided_conv,
)

trunc_init = nn.initializers.truncated_normal(0.02)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def apply_bn(name, pd, x, mask, train, condition, context, momentum=0.01, eps=1e-3):
    if pd is not None:
        return PDNorm(
            conditions=tuple(pd["conditions"]),
            decouple=pd["decouple"],
            adaptive=pd["adaptive"],
            norm_type="bn",
            name=name,
        )(x, mask, train, condition, context)
    return MaskedBatchNorm(momentum=momentum, eps=eps, name=name)(x, mask, train)


class SpSubMConv(nn.Module):
    out_channels: int
    num_offsets: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feat, nbr):
        cin = feat.shape[-1]
        w = self.param("weight", trunc_init, (self.num_offsets, cin, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        if isinstance(nbr, dict):  # block-dense engine tables (ops/block_conv.py)
            k = round(self.num_offsets ** (1.0 / 3.0))
            return block_subm_conv(feat, nbr, w, b, kernel_size=k)
        return gather_conv(feat, nbr, w, b, compute_dtype=jnp.bfloat16)


class BasicBlock(nn.Module):
    """Residual SubM k3 block (reference `spconv_unet_v1m1_base.py:23-85`).

    bn1/bn2 use `bn_momentum`; the projection norm uses `proj_bn_momentum`
    (the reference v1m2 variant pins proj/transition norms to 0.02,
    `spconv_unet_v1m2_bn_momentum.py:66`)."""

    embed_channels: int
    pd: Optional[dict] = None
    bn_momentum: float = 0.01
    proj_bn_momentum: float = 0.01
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, feat, nbr3, mask, train: bool, condition=None, context=None):
        cin = feat.shape[-1]
        residual = feat
        out = SpSubMConv(self.embed_channels, 27, name="conv1")(feat, nbr3)
        out = apply_bn("bn1", self.pd, out, mask, train, condition, context,
                       momentum=self.bn_momentum, eps=self.bn_eps)
        out = nn.relu(out)
        out = SpSubMConv(self.embed_channels, 27, name="conv2")(out, nbr3)
        out = apply_bn("bn2", self.pd, out, mask, train, condition, context,
                       momentum=self.bn_momentum, eps=self.bn_eps)
        if cin != self.embed_channels:
            residual = SpSubMConv(self.embed_channels, 1, name="proj_conv")(
                feat, jnp.where(mask, jnp.arange(feat.shape[0], dtype=jnp.int32), -1)[:, None]
            )
            residual = apply_bn("proj_norm", self.pd, residual, mask, train, condition, context,
                                momentum=self.proj_bn_momentum, eps=self.bn_eps)
        out = nn.relu(out + residual)
        return out


@MODELS.register_module("SpUNet-v1m1")
class SpUNetBase(nn.Module):
    in_channels: int = 6
    num_classes: int = 0
    base_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    enc_mode: bool = False
    serialize_depth: int = 12
    pool_capacity_factor: float = 0.5
    # sparse-conv engine for SubM k5/k3: "block" = dense z-order blocks
    conv_engine: str = "gather"
    block_capacity_factor: float = 1.0 / 16.0
    block_engine_min_points: int = 8192
    grid_size: float = 0.02  # used only when the input lacks grid_coord
    pdnorm_bn: bool = False
    pdnorm_decouple: bool = True
    pdnorm_adaptive: bool = False
    pdnorm_affine: bool = True
    pdnorm_conditions: Sequence[str] = ("ScanNet", "S3DIS", "Structured3D")
    zero_init: bool = False  # parity no-op (reference SpUNet-v1m3 flag)
    # BN numerics (v1m1: torch BatchNorm1d(momentum=0.01, eps=1e-3); the v1m2
    # variant raises block-norm momentum and pins transition norms to 0.02)
    bn_momentum: float = 0.01
    bn_eps: float = 1e-3
    transition_bn_momentum: Optional[float] = None  # stem/down/up/proj norms
    # reference SpUNet-v1m3 keyword aliases (configs use these names)
    conditions: Optional[Sequence[str]] = None
    norm_decouple: Optional[bool] = None
    norm_adaptive: Optional[bool] = None
    norm_affine: Optional[bool] = None  # parity no-op (norms always affine)
    context_channels: int = 256  # parity field (context arrives via pb.context)
    enc_mode: bool = False  # parity field (v1m3 enc-only option; decoder always runs)

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        assert len(self.layers) % 2 == 0 and len(self.layers) == len(self.channels)
        num_stages = len(self.layers) // 2
        pd = None
        if self.pdnorm_bn or self.conditions is not None:
            pd = dict(
                conditions=tuple(self.conditions if self.conditions is not None else self.pdnorm_conditions),
                decouple=self.norm_decouple if self.norm_decouple is not None else self.pdnorm_decouple,
                adaptive=self.norm_adaptive if self.norm_adaptive is not None else self.pdnorm_adaptive,
            )
        condition, context = pb.condition, pb.context
        tmom = self.transition_bn_momentum if self.transition_bn_momentum is not None else self.bn_momentum

        # level-0 structures
        pb = pb.with_grid_coord(self.grid_size)
        grid = jnp.clip(pb.grid_coord, 0, (1 << self.serialize_depth) - 1)
        kb = pb.key_batch()
        mask = pb.mask
        levels = [dict(grid=grid, kb=kb, mask=mask, depth=self.serialize_depth)]

        def block_tables_for(grid_l, kb_l, mask_l, depth_l, cap_l):
            keys0 = ser.encode(grid_l, kb_l, depth_l, "z")
            order0 = ser.argsort_keys(keys0, depth_l)
            return build_block_tables(
                keys0, order0, grid_l, mask_l, depth_l,
                default_block_capacity(cap_l, self.block_capacity_factor),
            )

        def use_block(cap_l):
            return self.conv_engine == "block" and cap_l >= self.block_engine_min_points

        if use_block(pb.capacity):
            nbr5 = block_tables_for(grid, kb, mask, self.serialize_depth, pb.capacity)
        else:
            nbr5 = build_subm_neighbor_map(grid, kb, mask, self.serialize_depth, 5)
        feat = SpSubMConv(self.base_channels, 125, name="conv_input")(pb.feat, nbr5)
        feat = apply_bn("stem_norm", pd, feat, mask, train, condition, context,
                        momentum=tmom, eps=self.bn_eps)
        feat = nn.relu(feat)

        # encoder
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

            # SparseConv3d k2 s2
            cin = feat.shape[-1]
            w = self.param(f"down{s}_weight", trunc_init, (8, cin, self.channels[s]))
            feat = strided_conv(feat, child, w)
            feat = apply_bn(f"down{s}_norm", pd, feat, out_mask, train, condition, context,
                            momentum=tmom, eps=self.bn_eps)
            feat = nn.relu(feat)

            if use_block(cap):
                nbr3 = block_tables_for(out_grid, out_kb, out_mask, lv["depth"] - 1, cap)
            else:
                nbr3 = build_subm_neighbor_map(out_grid, out_kb, out_mask, lv["depth"] - 1, 3)
            levels[s + 1]["nbr3"] = nbr3
            for i in range(self.layers[s]):
                feat = BasicBlock(self.channels[s], pd=pd, bn_momentum=self.bn_momentum, proj_bn_momentum=tmom, bn_eps=self.bn_eps, name=f"enc{s}_block{i}")(
                    feat, nbr3, out_mask, train, condition, context
                )
            skips.append(feat)

        if self.enc_mode:
            out_pb = PointBatch(
                coord=jnp.zeros((feat.shape[0], 3)),
                feat=feat,
                grid_coord=levels[-1]["grid"],
                batch=jnp.where(levels[-1]["mask"], levels[-1]["kb"], -1),
                num_scenes=pb.num_scenes,
            )
            return out_pb

        # decoder
        feat = skips.pop()
        for s in reversed(range(num_stages)):
            # decode from level s+1 back to level s; output channels follow the
            # reference's dec_channels bookkeeping: channels[4]=256, [5]=128, [6]=96, [7]=96
            dec_out = self.channels[num_stages + (num_stages - 1 - s)]
            cin = feat.shape[-1]
            w = self.param(f"up{s}_weight", trunc_init, (8, cin, dec_out))
            st = strided[s]
            feat = inverse_conv(feat, st["parent_of"], st["child_slot"], w)
            lv_mask = levels[s]["mask"]
            feat = apply_bn(f"up{s}_norm", pd, feat, lv_mask, train, condition, context,
                            momentum=tmom, eps=self.bn_eps)
            feat = nn.relu(feat)
            skip = skips.pop()
            feat = jnp.concatenate([feat, skip], axis=-1)
            if s > 0:
                nbr3 = levels[s]["nbr3"]
            elif isinstance(nbr5, dict):
                nbr3 = nbr5  # block tables serve every kernel size
            else:
                # the level-0 k3 map is a column subset of the k5 stem map
                nbr3 = nbr5[:, jnp.asarray(k3_columns_of_k5())]
            for i in range(self.layers[num_stages + (num_stages - 1 - s)]):
                feat = BasicBlock(dec_out, pd=pd, bn_momentum=self.bn_momentum, proj_bn_momentum=tmom, bn_eps=self.bn_eps, name=f"dec{s}_block{i}")(
                    feat, nbr3, lv_mask, train, condition, context
                )

        if self.num_classes > 0:
            w = self.param("final_weight", trunc_init, (1, feat.shape[-1], self.num_classes))
            b = self.param("final_bias", nn.initializers.zeros, (self.num_classes,))
            self_idx = jnp.where(mask, jnp.arange(feat.shape[0], dtype=jnp.int32), -1)[:, None]
            feat = gather_conv(feat, self_idx, w, b)
        return pb.replace(feat=feat)


@MODELS.register_module("SpUNet-v1m2")
class SpUNetBNMomentum(SpUNetBase):
    """bn-momentum variant (reference `spconv_unet_v1m2_bn_momentum.py`):
    block norms momentum=0.1 (configurable), stem/transition/proj norms
    momentum=0.02, eps=1e-5."""

    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    transition_bn_momentum: Optional[float] = 0.02


@MODELS.register_module("SpUNet-v1m3")
class SpUNetPDNorm(SpUNetBase):
    """SpUNet with Prompt-Driven Normalization for PPT multi-dataset training
    (reference `spconv_unet_v1m3_pdnorm.py`)."""

    pdnorm_bn: bool = True


# MinkUNet family: the reference's `sparse_unet/mink_unet.py:365-405` registers
# MinkUNet{14,18,34,50} variants over MinkowskiEngine; architecturally they are
# the same sparse residual U-Net this SpUNet implements, so the variants map to
# layer/channel presets of SpUNetBase.
_MINK_PRESETS = {
    "MinkUNet14": dict(layers=(1, 1, 1, 1, 1, 1, 1, 1)),
    "MinkUNet18": dict(layers=(2, 2, 2, 2, 2, 2, 2, 2)),
    "MinkUNet34": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2)),
    # 50/101 use ResNet bottleneck counts; the graph here keeps BasicBlocks
    # (the reference's own SpUNet rewrite makes the same simplification)
    "MinkUNet50": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet101": dict(layers=(2, 3, 4, 23, 2, 2, 2, 2)),
}
_MINK_CHANNELS = {
    "A": (32, 64, 128, 256, 128, 128, 96, 96),
    "B": (32, 64, 128, 256, 128, 128, 128, 128),
    "C": (32, 64, 128, 256, 256, 128, 96, 96),
    "D": (32, 64, 128, 256, 384, 384, 384, 384),
}
for _name, _preset in _MINK_PRESETS.items():
    for _var, _ch in _MINK_CHANNELS.items():
        # NOTE: overrides must carry annotations, or the flax dataclass
        # transform ignores them and the variant silently keeps base defaults
        MODELS.register_module(
            name=f"{_name}{_var}",
            module=type(
                f"{_name}{_var}",
                (SpUNetBase,),
                {
                    "__annotations__": {"layers": Sequence[int], "channels": Sequence[int]},
                    "layers": _preset["layers"],
                    "channels": _ch,
                },
            ),
        )
