"""Task wrappers: segmentors / classifier heads over backbones.

Parity: reference `pointcept/models/default.py` (`DefaultSegmentor:15`,
`DefaultSegmentorV2:41`, `DefaultClassifier:290`). Train-time they return
``{"loss": ...}``, eval ``{"loss", "seg_logits"}``, test ``{"seg_logits"}`` —
here the dict always contains ``seg_logits`` and contains ``loss`` whenever
labels are present (padding points carry label -1 = ignore, so masking is
implicit in the criteria).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.losses import build_criteria
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops.segment_ops import masked_segment_reduce


@MODELS.register_module("DefaultSegmentor")
class DefaultSegmentor(nn.Module):
    """Backbone emits per-point logits directly (SpUNet-style)."""

    backbone: Any = None
    criteria: Any = None
    num_classes: int = 0  # unused; logits come from backbone

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)

    def __call__(self, pb: PointBatch, train: bool = False):
        out = self.backbone_module(pb, train)
        logits = out.feat if isinstance(out, PointBatch) else out
        result = {"seg_logits": logits}
        if pb.segment is not None:
            result["loss"] = self.criteria_fn(logits, pb.segment)
        return result


@MODELS.register_module("DefaultSegmentorV2")
class DefaultSegmentorV2(nn.Module):
    """Backbone returns a PointBatch; linear seg head on features.

    (The reference also unwinds leftover `pooling_parent` chains for enc-mode
    backbones — our decoder consumes skips explicitly, so the returned batch is
    already full-resolution.)
    """

    num_classes: int = 20
    backbone_out_channels: int = 64
    backbone: Any = None
    criteria: Any = None
    freeze_backbone: bool = False
    up_cast_level: int = 0  # enc-mode backbones: concat this many skip levels (0 = all)

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)
        self.seg_head = (
            nn.Dense(self.num_classes, name="seg_head") if self.num_classes > 0 else lambda x: x
        )

    def __call__(self, pb: PointBatch, train: bool = False, precomputed=None):
        # `precomputed`: shared forward geometry from backbone.build_geometry
        # (PT-v3 fragment-loop eval; all fragments of a scene reuse it)
        out = (
            self.backbone_module(pb, train)
            if precomputed is None
            else self.backbone_module(pb, train, precomputed=precomputed)
        )
        if isinstance(out, tuple):  # enc-mode backbone: up-cast skip concat
            out_pb, skips = out
            skips = list(skips)
            feat = out_pb.feat
            levels = self.up_cast_level if self.up_cast_level else len(skips)
            for _ in range(levels):
                if not skips:
                    break
                skip_pb, cluster, _ctx = skips.pop()
                m = feat.shape[0]
                up = feat[jnp.minimum(cluster, m - 1)]
                up = jnp.where((cluster < m)[:, None], up, 0)
                feat = jnp.concatenate([skip_pb.feat, up], axis=-1)
                out_pb = skip_pb.replace(feat=feat)
            out = out_pb
        feat = out.feat
        if self.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        logits = self.seg_head(feat)
        result = {"seg_logits": logits, "feat": feat}
        if pb.segment is not None:
            result["loss"] = self.criteria_fn(logits, pb.segment)
        return result


@MODELS.register_module("DefaultLORASegmentorV2")
class DefaultLORASegmentorV2(DefaultSegmentorV2):
    """PEFT fine-tuning of a frozen pretrained encoder with LoRA on qkv.

    Parity: reference `models/default.py:99` (`DefaultLORASegmentorV2`, PEFT
    LoRA on attention qkv, `:134-152`). Here the backbone gets `lora_rank`
    injected, and freezing is enacted through the optimizer:
    set ``optimizer.trainable_keywords = ("lora", "seg_head")`` in the config.
    """

    lora_rank: int = 16

    def setup(self):
        backbone = dict(self.backbone)
        backbone["lora_rank"] = self.lora_rank
        self.backbone_module = build_model(backbone)
        self.criteria_fn = build_criteria(self.criteria)
        self.seg_head = nn.Dense(self.num_classes, name="seg_head")


@MODELS.register_module("DefaultClassifier")
class DefaultClassifier(nn.Module):
    """Per-cloud classification: mean-pool valid points per scene + MLP head.

    Parity: reference `models/default.py:290` (segment_csr mean + cls head of
    Linear/BN/ReLU stacks).
    """

    num_classes: int = 40
    backbone_embed_dim: int = 256
    backbone: Any = None
    criteria: Any = None
    freeze_backbone: bool = False  # linear probing: stop-gradient on features

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)

    @nn.compact
    def _head(self, x, train: bool):
        from pointcept_tpu.models.modules import MaskedBatchNorm

        for i, ch in enumerate((256, 128)):
            x = nn.Dense(ch, name=f"cls_fc{i}")(x)
            x = MaskedBatchNorm(name=f"cls_bn{i}")(x, None, train)
            x = nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="cls_out")(x)

    def __call__(self, pb: PointBatch, train: bool = False, category: Optional[jnp.ndarray] = None):
        out = self.backbone_module(pb, train)
        if isinstance(out, tuple):  # enc-mode backbones return (pb, skips)
            out = out[0]
        feat = out.feat if isinstance(out, PointBatch) else out
        if self.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        mask = out.mask if isinstance(out, PointBatch) else pb.mask
        batch = out.batch if isinstance(out, PointBatch) else pb.batch
        pooled = masked_segment_reduce(
            feat, jnp.maximum(batch, 0), mask, pb.num_scenes, reduce="mean"
        )  # [B, C]
        logits = self._head(pooled, train)
        result = {"cls_logits": logits}
        if category is not None:
            result["loss"] = self.criteria_fn(logits, category)
        return result


@MODELS.register_module("DINOEnhancedSegmentor")
class DINOEnhancedSegmentor(nn.Module):
    """Segmentor that concatenates backbone point features with 1-NN-mapped 2D
    DINO features (reference models/default.py:207-290; torch_cluster.knn ->
    `ops/pointops.knn_query`). Used for Sonata linear probing with DINOv2
    distillation targets. Backbone may be absent (DINO-only probe), frozen
    (stop_gradient), or an enc-mode backbone whose skip chain is up-cast
    concatenated (`up_cast_level`)."""

    num_classes: int = 20
    backbone_out_channels: int = 96
    backbone: Any = None
    criteria: Any = None
    freeze_backbone: bool = False
    up_cast_level: int = 0

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone)) if self.backbone is not None else None
        self.criteria_fn = build_criteria(self.criteria)
        self.seg_head = nn.Dense(self.num_classes)

    def __call__(self, data, train: bool = False):
        from pointcept_tpu.ops.pointops import knn_query

        pb: PointBatch = data["point"] if isinstance(data, dict) else data
        feats = []
        if self.backbone_module is not None:
            out = self.backbone_module(pb, train)
            if isinstance(out, tuple):  # enc-mode: up-cast skip concat
                out_pb, skips = out
                feat = out_pb.feat
                for _ in range(self.up_cast_level):
                    skip_pb, cluster, _ctx = skips.pop()
                    m = feat.shape[0]
                    up = feat[jnp.minimum(cluster, m - 1)]
                    up = jnp.where((cluster < m)[:, None], up, 0)
                    feat = jnp.concatenate([skip_pb.feat, up], axis=-1)
                    out_pb = skip_pb.replace(feat=feat)
                out = out_pb
            feat = out.feat if isinstance(out, PointBatch) else out
            if self.freeze_backbone:
                feat = jax.lax.stop_gradient(feat)
            feats.append(feat)

        dino_coord = data["dino_coord"]
        dino_feat = data["dino_feat"]
        dino_batch = data["dino_batch"]
        idx, _ = knn_query(
            1,
            dino_coord,
            dino_batch,
            pb.origin_coord if pb.origin_coord is not None else pb.coord,
            jnp.where(pb.mask, pb.batch, -2),
        )
        feats.append(dino_feat[idx[:, 0]])
        feat = jnp.concatenate(feats, axis=-1)
        logits = self.seg_head(feat)
        result = {"seg_logits": logits}
        if pb.segment is not None:
            result["loss"] = self.criteria_fn(logits, pb.segment)
        return result
