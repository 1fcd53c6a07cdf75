"""Point Transformer V1 (seg + cls) — TPU-native (JAX/Flax).

Reference: `pointcept/models/point_transformer/point_transformer_seg.py` /
`point_transformer_cls.py`: vector attention over k-NN neighborhoods
(`PointTransformerLayer:20`), FPS+kNN-group TransitionDown (`:82`),
interpolation TransitionUp (`:124`), Bottleneck residual blocks (`:170`).
TPU reworks: ragged offsets -> masked fixed-capacity stage buffers; FPS is the
batched masked iterative scan from `ops/pointops.fps_downsample`; neighborhood
grouping uses the tiled-matmul kNN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.modules import MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops.pointops import fps_downsample, interpolation, knn_query
from pointcept_tpu.ops.segment_ops import masked_segment_reduce


class LayerNorm1d(nn.Module):
    """LN over the channel dim (reference LayerNorm1d wrapper)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm()(x)


class PointTransformerLayer(nn.Module):
    """Vector attention with shared planes (reference `point_transformer_seg.py:20`)."""

    out_planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, coord, feat, batch, mask, train: bool):
        c = self.out_planes
        s = self.share_planes
        q = nn.Dense(c, name="linear_q")(feat)
        k = nn.Dense(c, name="linear_k")(feat)
        v = nn.Dense(c, name="linear_v")(feat)
        idx, _ = knn_query(self.nsample, coord, jnp.where(mask, batch, -1))
        pos = coord[idx] - coord[:, None, :]  # [N, ns, 3]
        xk = k[idx]
        xv = v[idx]
        # positional encoding MLP
        p = nn.Dense(3, name="linear_p1")(pos)
        p = LayerNorm1d(name="linear_p_norm")(p)
        p = nn.relu(p)
        p_r = nn.Dense(c, name="linear_p2")(p)  # [N, ns, C]
        # relation: k - q + positional term (reference reduces p_r
        # "n ns (i j) -> n ns j" with j = mid == out, i.e. identity here)
        r_qk = xk - q[:, None, :] + p_r
        w = LayerNorm1d(name="linear_w_norm1")(r_qk)
        w = nn.relu(w)
        w = nn.Dense(c // s, name="linear_w1")(w)
        w = LayerNorm1d(name="linear_w_norm2")(w)
        w = nn.relu(w)
        w = nn.Dense(c // s, name="linear_w2")(w)  # [N, ns, C/s]
        w = jax.nn.softmax(w.astype(jnp.float32), axis=1).astype(feat.dtype)
        val = (xv + p_r).reshape(pos.shape[0], self.nsample, s, c // s)
        out = jnp.einsum("nksi,nki->nsi", val, w).reshape(pos.shape[0], c)
        return out


class Bottleneck(nn.Module):
    """Residual vector-attention block (reference `:170`)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, coord, feat, batch, mask, train: bool):
        identity = feat
        x = nn.Dense(self.planes, use_bias=False, name="linear1")(feat)
        x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn1")(x, mask, train))
        x = PointTransformerLayer(self.planes, self.share_planes, self.nsample, name="transformer")(
            coord, x, batch, mask, train
        )
        x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn2")(x, mask, train))
        x = nn.Dense(self.planes, use_bias=False, name="linear3")(x)
        x = MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn3")(x, mask, train)
        return nn.relu(identity + x)


class TransitionDown(nn.Module):
    """FPS + kNN-group + max-pool downsample (reference `:82`)."""

    out_planes: int
    stride: int = 1
    nsample: int = 16

    @nn.compact
    def __call__(self, coord, feat, batch, mask, num_scenes: int, train: bool):
        if self.stride == 1:
            x = nn.Dense(self.out_planes, use_bias=False, name="linear")(feat)
            x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn")(x, mask, train))
            return coord, x, batch, mask
        m = feat.shape[0] // self.stride
        m = max((m // num_scenes) * num_scenes, num_scenes)
        idx, new_batch = fps_downsample(coord, batch, mask, num_scenes, m)
        new_coord = coord[idx]
        new_mask = new_batch >= 0
        nbr, _ = knn_query(
            self.nsample,
            coord,
            jnp.where(mask, batch, -1),
            new_coord,
            jnp.where(new_mask, new_batch, -2),
        )
        grouped = jnp.concatenate(
            [coord[nbr] - new_coord[:, None, :], feat[nbr]], axis=-1
        )  # [M, ns, 3+C]
        x = nn.Dense(self.out_planes, use_bias=False, name="linear")(grouped)
        mm, ns, c = x.shape
        x = MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn")(
            x.reshape(mm * ns, c), jnp.broadcast_to(new_mask[:, None], (mm, ns)).reshape(-1), train
        ).reshape(mm, ns, c)
        x = nn.relu(x)
        x = jnp.max(x, axis=1)
        return new_coord, x, new_batch, new_mask


class TransitionUp(nn.Module):
    """Interp upsample + skip (reference `:124`); is_head = global-context stage.

    PartSeg variant (reference point_transformer_partseg.py:122-158): the
    global head additionally concatenates a learned embedding of the shape's
    category one-hot (`num_shape_classes` -> 1024)."""

    out_planes: Optional[int] = None
    num_shape_classes: Optional[int] = None

    @nn.compact
    def __call__(self, coarse, fine=None, num_scenes: int = 1, train: bool = False, category=None):
        c_coord, c_feat, c_batch, c_mask = coarse
        if fine is None:
            # global-context head: concat per-scene mean (reference `:147-158`)
            pooled = masked_segment_reduce(
                c_feat, jnp.maximum(c_batch, 0), c_mask, num_scenes, "mean"
            )
            g = nn.Dense(c_feat.shape[-1], name="linear2")(pooled)
            g = nn.relu(g)
            parts = [c_feat, g[jnp.clip(c_batch, 0, num_scenes - 1)]]
            if self.num_shape_classes is not None:
                onehot = jax.nn.one_hot(jnp.maximum(category, 0), self.num_shape_classes)
                y = nn.relu(nn.Dense(1024, name="linear3")(onehot))  # [B, 1024]
                parts.append(y[jnp.clip(c_batch, 0, num_scenes - 1)])
            x = jnp.concatenate(parts, axis=-1)
            x = nn.Dense(c_feat.shape[-1], name="linear1")(x)
            x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn1")(x, c_mask, train))
            return x
        f_coord, f_feat, f_batch, f_mask = fine
        y = nn.Dense(self.out_planes, name="linear2")(c_feat)
        y = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn2")(y, c_mask, train))
        up = interpolation(
            c_coord, jnp.where(c_mask, c_batch, -1), y, f_coord, jnp.where(f_mask, f_batch, -2)
        )
        x = nn.Dense(self.out_planes, name="linear1")(f_feat)
        x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="bn1")(x, f_mask, train))
        return x + up


class PointTransformerSeg(nn.Module):
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    in_channels: int = 6
    num_classes: int = 13
    share_planes: int = 8
    num_shape_classes: Optional[int] = None  # PartSeg: category-conditioned head

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False, category=None):
        planes = (32, 64, 128, 256, 512)
        stride = (1, 4, 4, 4, 4)
        nsample = (8, 16, 16, 16, 16)
        num_scenes = pb.num_scenes
        state = (pb.coord, pb.feat, pb.batch, pb.mask)
        stages = []
        for s in range(5):
            coord, feat, batch, mask = state
            coord, feat, batch, mask = TransitionDown(
                planes[s], stride[s], nsample[s], name=f"enc{s + 1}_down"
            )(coord, feat, batch, mask, num_scenes, train)
            for i in range(self.blocks[s]):
                feat = Bottleneck(planes[s], self.share_planes, nsample[s], name=f"enc{s + 1}_block{i}")(
                    coord, feat, batch, mask, train
                )
            state = (coord, feat, batch, mask)
            stages.append(state)

        # decoder
        c5 = stages[4]
        x5 = TransitionUp(num_shape_classes=self.num_shape_classes, name="dec5_up")(
            c5, None, num_scenes, train, category=category
        )
        x5 = Bottleneck(planes[4], self.share_planes, nsample[4], name="dec5_block0")(
            c5[0], x5, c5[2], c5[3], train
        )
        feats = {4: x5}
        for s in reversed(range(4)):
            coarse = (stages[s + 1][0], feats[s + 1], stages[s + 1][2], stages[s + 1][3])
            x = TransitionUp(planes[s], name=f"dec{s + 1}_up")(coarse, stages[s], num_scenes, train)
            x = Bottleneck(planes[s], self.share_planes, nsample[s], name=f"dec{s + 1}_block0")(
                stages[s][0], x, stages[s][2], stages[s][3], train
            )
            feats[s] = x

        x = nn.Dense(planes[0], name="cls_fc1")(feats[0])
        x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="cls_bn")(x, stages[0][3], train))
        logits = nn.Dense(self.num_classes, name="cls_fc2")(x)
        return pb.replace(feat=logits)


class PointTransformerCls(nn.Module):
    blocks: Sequence[int] = (1, 1, 1, 1, 1)
    in_channels: int = 6
    num_classes: int = 40
    share_planes: int = 8

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        planes = (32, 64, 128, 256, 512)
        stride = (1, 4, 4, 4, 4)
        nsample = (8, 16, 16, 16, 16)
        num_scenes = pb.num_scenes
        state = (pb.coord, pb.feat, pb.batch, pb.mask)
        for s in range(5):
            coord, feat, batch, mask = state
            coord, feat, batch, mask = TransitionDown(
                planes[s], stride[s], nsample[s], name=f"enc{s + 1}_down"
            )(coord, feat, batch, mask, num_scenes, train)
            for i in range(1, self.blocks[s]):
                feat = Bottleneck(planes[s], self.share_planes, nsample[s], name=f"enc{s + 1}_block{i}")(
                    coord, feat, batch, mask, train
                )
            state = (coord, feat, batch, mask)
        coord, feat, batch, mask = state
        pooled = masked_segment_reduce(feat, jnp.maximum(batch, 0), mask, num_scenes, "mean")
        x = nn.Dense(256, name="cls_fc1")(pooled)
        x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="cls_bn1")(x, None, train))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(128, name="cls_fc2")(x)
        x = nn.relu(MaskedBatchNorm(momentum=0.1, eps=1e-5, name="cls_bn2")(x, None, train))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="cls_fc3")(x)
        return logits


def _make_variant(name, base, **overrides):
    """Subclass with proper dataclass annotations (plain class attrs are NOT
    picked up as flax dataclass field defaults)."""
    ns = {"__annotations__": {k: type(v) if not isinstance(v, tuple) else Sequence[int] for k, v in overrides.items()}}
    ns.update(overrides)
    return type(name.replace("-", ""), (base,), ns)


def _register_variants():
    seg_variants = {
        "PointTransformer-Seg26": (1, 1, 1, 1, 1),
        "PointTransformer-Seg38": (1, 2, 2, 2, 2),
        "PointTransformer-Seg50": (1, 2, 3, 5, 2),
    }
    for name, blocks in seg_variants.items():
        MODELS.register_module(name=name, module=_make_variant(name, PointTransformerSeg, blocks=blocks))
    part_variants = {
        "PointTransformer-PartSeg26": (1, 1, 1, 1, 1),
        "PointTransformer-PartSeg38": (1, 2, 2, 2, 2),
        "PointTransformer-PartSeg50": (1, 2, 3, 5, 2),
    }
    for name, blocks in part_variants.items():
        MODELS.register_module(
            name=name,
            module=_make_variant(name, PointTransformerSeg, blocks=blocks, num_shape_classes=16),
        )
    cls_variants = {
        "PointTransformer-Cls26": (1, 1, 1, 1, 1),
        "PointTransformer-Cls38": (1, 2, 2, 2, 2),
        "PointTransformer-Cls50": (1, 2, 3, 5, 2),
    }
    for name, blocks in cls_variants.items():
        MODELS.register_module(name=name, module=_make_variant(name, PointTransformerCls, blocks=blocks))


_register_variants()
