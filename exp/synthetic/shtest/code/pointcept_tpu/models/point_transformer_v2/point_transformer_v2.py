"""Point Transformer V2 (PT-v2m2) — TPU-native (JAX/Flax).

Reference: `pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py`:
GroupedVectorAttention over k-NN neighborhoods (`:48-129`), partition-based
GridPool (`:229-269`, torch_geometric voxel_grid + segment_csr), UnpoolWithSkip
map/interp (`:272-316`), GVAPatchEmbed stem. TPU changes: ragged offsets ->
masked fixed-capacity stage buffers with static per-stage capacities; kNN is the
tiled-matmul scan from `ops/pointops`; voxel_grid clustering reuses the sorted
key-run machinery from serialization. BatchNorm uses torch defaults
(eps 1e-5, momentum 0.1) as in the reference's PointBatchNorm.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import DropPath, MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.pointops import interpolation, knn_query
from pointcept_tpu.ops.segment_ops import segment_reduce


def _round_up(x, m):
    return ((x + m - 1) // m) * m


conv_kernel_init_ptv2 = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class PointBN(nn.Module):
    """PointBatchNorm (reference `:28-45`): BN over channels; supports [N,C] and
    [N,S,C] (flattened)."""

    @nn.compact
    def __call__(self, x, mask, train: bool):
        bn = MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn")
        if x.ndim == 3:
            n, s, c = x.shape
            m = None if mask is None else jnp.broadcast_to(mask[:, None], (n, s)).reshape(-1)
            return bn(x.reshape(n * s, c), m, train).reshape(n, s, c)
        return bn(x, mask, train)


class GroupedVectorAttention(nn.Module):
    """Reference `GroupedVectorAttention` (`:48-129`)."""

    embed_channels: int
    groups: int
    attn_drop_rate: float = 0.0
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False  # v2m1 origin: GroupedLinear weight encoding

    @nn.compact
    def __call__(self, feat, coord, ref_idx, mask, train: bool):
        c = self.embed_channels
        g = self.groups
        q = nn.Dense(c, use_bias=self.qkv_bias, name="linear_q")(feat)
        q = nn.relu(PointBN(name="q_norm")(q, mask, train))
        k = nn.Dense(c, use_bias=self.qkv_bias, name="linear_k")(feat)
        k = nn.relu(PointBN(name="k_norm")(k, mask, train))
        v = nn.Dense(c, use_bias=self.qkv_bias, name="linear_v")(feat)

        key = k[ref_idx]  # [N, s, C]
        value = v[ref_idx]
        pos = coord[ref_idx] - coord[:, None, :]
        relation = key - q[:, None, :]
        if self.pe_multiplier:
            pem = nn.Dense(c, name="pem_fc1")(pos)
            pem = nn.relu(PointBN(name="pem_norm")(pem, mask, train))
            pem = nn.Dense(c, name="pem_fc2")(pem)
            relation = relation * pem
        if self.pe_bias:
            peb = nn.Dense(c, name="peb_fc1")(pos)
            peb = nn.relu(PointBN(name="peb_norm")(peb, mask, train))
            peb = nn.Dense(c, name="peb_fc2")(peb)
            relation = relation + peb
            value = value + peb

        if self.grouped_linear:
            # v2m1 GroupedLinear (reference v2m1_origin.py:24-62): per-channel
            # scale then per-group sum -> [.., groups]
            gw = self.param("we_grouped_weight", conv_kernel_init_ptv2, (1, c))
            w = (relation * gw).reshape(*relation.shape[:-1], g, c // g).sum(-1)
        else:
            w = nn.Dense(g, name="we_fc1")(relation)
        w = nn.relu(PointBN(name="we_norm")(w, mask, train))
        w = nn.Dense(g, name="we_fc2")(w)  # [N, s, g]
        w = jax.nn.softmax(w.astype(jnp.float32), axis=1).astype(feat.dtype)
        w = nn.Dropout(self.attn_drop_rate, deterministic=not train)(w)
        nbr_valid = (ref_idx >= 0).astype(feat.dtype)
        w = w * nbr_valid[..., None]

        n, s, _ = value.shape
        value = value.reshape(n, s, g, c // g)
        out = jnp.einsum("nsgi,nsg->ngi", value, w).reshape(n, c)
        return out




def _block_norm(name, pd, x, mask, train, condition=None, context=None):
    """Block/pool-level norm: plain PointBN, or PDNorm when a pd config is set
    (reference v2m3_pdnorm.py: only Block/GridPool/Unpool norms are prompted)."""
    if pd is not None:
        from pointcept_tpu.models.modules import PDNorm

        return PDNorm(
            conditions=tuple(pd["conditions"]),
            decouple=pd.get("decouple", True),
            adaptive=pd.get("adaptive", False),
            norm_type="bn",
            name=name,
        )(x, mask, train, condition, context)
    return PointBN(name=name)(x, mask, train)


class PTv2Block(nn.Module):
    embed_channels: int
    groups: int
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    pd: Optional[dict] = None

    @nn.compact
    def __call__(self, coord, feat, mask, ref_idx, train: bool, condition=None, context=None):
        identity = feat
        x = nn.Dense(self.embed_channels, use_bias=False, name="fc1")(feat)
        x = nn.relu(_block_norm("norm1", self.pd, x, mask, train, condition, context))
        x = GroupedVectorAttention(
            embed_channels=self.embed_channels,
            groups=self.groups,
            qkv_bias=self.qkv_bias,
            attn_drop_rate=self.attn_drop_rate,
            pe_multiplier=self.pe_multiplier,
            pe_bias=self.pe_bias,
            grouped_linear=self.grouped_linear,
            name="attn",
        )(x, coord, ref_idx, mask, train)
        x = nn.relu(_block_norm("norm2", self.pd, x, mask, train, condition, context))
        x = nn.Dense(self.embed_channels, use_bias=False, name="fc3")(x)
        x = _block_norm("norm3", self.pd, x, mask, train, condition, context)
        x = DropPath(self.drop_path_rate, name="drop_path")(x, train)
        return nn.relu(identity + x)


class BlockSequence(nn.Module):
    depth: int
    embed_channels: int
    groups: int
    neighbours: int = 16
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False
    attn_drop_rate: float = 0.0
    drop_path_rates: Sequence[float] = ()
    pd: Optional[dict] = None

    @nn.compact
    def __call__(self, coord, feat, batch, mask, train: bool, condition=None, context=None):
        ref_idx, _ = knn_query(self.neighbours, coord, jnp.where(mask, batch, -1))
        for i in range(self.depth):
            dp = self.drop_path_rates[i] if i < len(self.drop_path_rates) else 0.0
            feat = PTv2Block(
                embed_channels=self.embed_channels,
                groups=self.groups,
                qkv_bias=self.qkv_bias,
                pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias,
                grouped_linear=self.grouped_linear,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=dp,
                pd=self.pd,
                name=f"block{i}",
            )(coord, feat, mask, ref_idx, train, condition, context)
        return feat


class GridPool(nn.Module):
    """Reference `GridPool` (`:229-269`): voxel-grid partition pooling."""

    out_channels: int
    grid_size: float
    out_capacity: int
    num_scenes: int = 64
    pd: Optional[dict] = None

    @nn.compact
    def __call__(self, coord, feat, batch, mask, train: bool, condition=None, context=None):
        m = self.out_capacity
        n = coord.shape[0]
        feat = nn.Dense(self.out_channels, use_bias=False, name="fc")(feat)
        feat = nn.relu(_block_norm("norm", self.pd, feat, mask, train, condition, context))
        # per-batch min (start)
        b = jnp.where(mask, batch, 0)
        big = jnp.float32(1e9)
        start = segment_reduce(jnp.where(mask[:, None], coord, big), b, self.num_scenes, "min")
        grid = jnp.floor((coord - start[jnp.clip(b, 0, self.num_scenes - 1)]) / self.grid_size).astype(jnp.int32)
        grid = jnp.clip(grid, 0, (1 << 16) - 1)
        keys = ser.encode(grid, jnp.where(mask, batch, ser.BATCH_SENTINEL), 16, "z")
        order = ser.argsort_keys(keys)
        sk = keys[order]
        valid_sorted = mask[order]
        prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
        head = valid_sorted & ~prev_eq
        cluster_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
        cl_sorted = jnp.where(valid_sorted & (cluster_sorted < m), cluster_sorted, m)
        cluster_of_point = jnp.full((n,), m, jnp.int32).at[order].set(cl_sorted)

        new_coord = segment_reduce(coord, cluster_of_point, m, "mean")
        new_feat = segment_reduce(feat, cluster_of_point, m, "max")
        head_target = jnp.where(head & (cluster_sorted < m), cluster_sorted, m)
        new_batch = jnp.full((m + 1,), -1, jnp.int32).at[head_target].set(batch[order])[:m]
        return new_coord, new_feat, new_batch, new_batch >= 0, cluster_of_point


class UnpoolWithSkip(nn.Module):
    """Reference `UnpoolWithSkip` (`:272-316`)."""

    out_channels: int
    skip: bool = True
    backend: str = "map"
    pd: Optional[dict] = None

    @nn.compact
    def __call__(self, coord, feat, batch, mask, skip_coord, skip_feat, skip_batch, skip_mask, cluster, train: bool,
                 condition=None, context=None):
        x = nn.Dense(self.out_channels, name="proj_fc")(feat)
        x = nn.relu(_block_norm("proj_norm", self.pd, x, mask, train, condition, context))
        if self.backend == "map" and cluster is not None:
            mcap = feat.shape[0]
            up = x[jnp.minimum(cluster, mcap - 1)]
            up = jnp.where((cluster < mcap)[:, None], up, 0)
        else:
            up = interpolation(coord, jnp.where(mask, batch, -1), x, skip_coord, jnp.where(skip_mask, skip_batch, -1))
        if self.skip:
            s = nn.Dense(self.out_channels, name="skip_fc")(skip_feat)
            s = nn.relu(_block_norm("skip_norm", self.pd, s, skip_mask, train, condition, context))
            up = up + s
        return up


@MODELS.register_module("PT-v2m2")
class PointTransformerV2(nn.Module):
    in_channels: int = 6
    num_classes: int = 20
    patch_embed_depth: int = 1
    patch_embed_channels: int = 48
    patch_embed_groups: int = 6
    patch_embed_neighbours: int = 8
    enc_depths: Sequence[int] = (2, 2, 6, 2)
    enc_channels: Sequence[int] = (96, 192, 384, 512)
    enc_groups: Sequence[int] = (12, 24, 48, 64)
    enc_neighbours: Sequence[int] = (16, 16, 16, 16)
    dec_depths: Sequence[int] = (1, 1, 1, 1)
    dec_channels: Sequence[int] = (48, 96, 192, 384)
    dec_groups: Sequence[int] = (6, 12, 24, 48)
    dec_neighbours: Sequence[int] = (16, 16, 16, 16)
    grid_sizes: Sequence[float] = (0.06, 0.12, 0.24, 0.48)
    attn_qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    enable_checkpoint: bool = False  # parity no-op
    unpool_backend: str = "map"
    pool_capacity_factors: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    # v2m3 pdnorm options
    conditions: Sequence[str] = ()
    norm_decouple: bool = True
    norm_adaptive: bool = False
    norm_affine: bool = True  # parity no-op (norms are always affine here)
    context_channels: int = 256  # parity field (context arrives via pb.context)

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        num_stages = len(self.enc_depths)
        coord, feat, batch, mask = pb.coord, pb.feat, pb.batch, pb.mask
        pd = (
            dict(conditions=tuple(self.conditions), decouple=self.norm_decouple, adaptive=self.norm_adaptive)
            if len(self.conditions) > 0
            else None
        )
        condition, context = pb.condition, pb.context

        enc_dp = np.linspace(0, self.drop_path_rate, sum(self.enc_depths)).tolist()
        dec_dp = np.linspace(0, self.drop_path_rate, sum(self.dec_depths)).tolist()

        # patch embed
        x = nn.Dense(self.patch_embed_channels, use_bias=False, name="patch_proj")(feat)
        x = nn.relu(PointBN(name="patch_norm")(x, mask, train))
        x = BlockSequence(
            depth=self.patch_embed_depth,
            embed_channels=self.patch_embed_channels,
            groups=self.patch_embed_groups,
            neighbours=self.patch_embed_neighbours,
            qkv_bias=self.attn_qkv_bias,
            pe_multiplier=self.pe_multiplier,
            pe_bias=self.pe_bias,
            grouped_linear=self.grouped_linear,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rates=(0.0,) * self.patch_embed_depth,
            pd=pd,
            name="patch_embed",
        )(coord, x, batch, mask, train, condition, context)

        skips = []
        cap = pb.capacity
        state = (coord, x, batch, mask)
        for i in range(num_stages):
            skips.append(state)
            cap = _round_up(max(int(math.ceil(cap * self.pool_capacity_factors[i])), 128), 128)
            c0, f0, b0, m0 = state
            nc, nf, nb, nm, cluster = GridPool(
                out_channels=self.enc_channels[i],
                grid_size=self.grid_sizes[i],
                out_capacity=cap,
                num_scenes=pb.num_scenes,
                pd=pd,
                name=f"enc{i}_down",
            )(c0, f0, b0, m0, train, condition, context)
            skips[-1] = skips[-1] + (cluster,)
            nf = BlockSequence(
                depth=self.enc_depths[i],
                embed_channels=self.enc_channels[i],
                groups=self.enc_groups[i],
                neighbours=self.enc_neighbours[i],
                qkv_bias=self.attn_qkv_bias,
                pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias,
                grouped_linear=self.grouped_linear,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=enc_dp[sum(self.enc_depths[:i]) : sum(self.enc_depths[: i + 1])],
                pd=pd,
                name=f"enc{i}_blocks",
            )(nc, nf, nb, nm, train, condition, context)
            state = (nc, nf, nb, nm)

        for i in reversed(range(num_stages)):
            sc, sf, sb, sm, cluster = skips.pop()
            c1, f1, b1, m1 = state
            up = UnpoolWithSkip(
                out_channels=self.dec_channels[i],
                backend=self.unpool_backend,
                pd=pd,
                name=f"dec{i}_up",
            )(c1, f1, b1, m1, sc, sf, sb, sm, cluster, train, condition, context)
            up = BlockSequence(
                depth=self.dec_depths[i],
                embed_channels=self.dec_channels[i],
                groups=self.dec_groups[i],
                neighbours=self.dec_neighbours[i],
                qkv_bias=self.attn_qkv_bias,
                pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias,
                grouped_linear=self.grouped_linear,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=dec_dp[sum(self.dec_depths[:i]) : sum(self.dec_depths[: i + 1])],
                pd=pd,
                name=f"dec{i}_blocks",
            )(sc, up, sb, sm, train, condition, context)
            state = (sc, up, sb, sm)

        coord, feat, batch, mask = state
        if self.num_classes > 0:
            h = nn.Dense(self.dec_channels[0], name="seg_head_fc1")(feat)
            h = nn.relu(PointBN(name="seg_head_norm")(h, mask, train))
            feat = nn.Dense(self.num_classes, name="seg_head_fc2")(h)
        return pb.replace(feat=feat)


@MODELS.register_module("PT-v2m1")
class PointTransformerV2M1(PointTransformerV2):
    """v2m1 "origin" (reference point_transformer_v2m1_origin.py): identical to
    v2m2 except the vector-attention weight encoding starts with a
    GroupedLinear (per-channel scale + group sum) instead of a full Linear."""

    grouped_linear: bool = True


@MODELS.register_module("PT-v2m3")
class PointTransformerV2M3(PointTransformerV2):
    """v2m3 PDNorm variant (reference point_transformer_v2m3_pdnorm.py): the
    Block / GridPool / Unpool norms become prompt-driven (per-condition BN,
    optionally adaptive via pb.context); attention-internal norms stay plain
    like the reference."""

    conditions: Sequence[str] = ("ScanNet", "S3DIS", "Structured3D")
    norm_decouple: bool = True
    norm_adaptive: bool = False
