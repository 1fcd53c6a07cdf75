"""Point Prompt Training — multi-dataset joint training wrappers.

Reference: `pointcept/models/point_prompt_training/`:
* PPT-v1m1 (`point_prompt_training_v1m1_language_guided.py:19`): per-dataset
  learned context embedding fed to a PDNorm-capable backbone; logits =
  logit_scale * cos-sim between projected features and frozen CLIP text
  embeddings of the merged class-name list, masked to the dataset's valid class
  indices.
* PPT-v1m2 (`point_prompt_training_v1m2_decoupled.py`): same context machinery
  with decoupled per-dataset linear seg heads.

This environment has no network egress / CLIP weights, so v1m1 loads the text
embeddings from `class_embedding_path` (an .npy exported offline with CLIP); if
absent it falls back to a trainable embedding table (documented deviation — the
language prior is then learned instead of frozen).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.losses import build_criteria
from pointcept_tpu.models.utils.structure import PointBatch

DEFAULT_CLASS_NAMES = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "bookcase", "picture", "counter", "desk", "shelves", "curtain",
    "dresser", "pillow", "mirror", "ceiling", "refrigerator", "television", "shower curtain", "nightstand",
    "toilet", "sink", "lamp", "bathtub", "garbagebin", "board", "beam", "column",
    "clutter", "otherstructure", "otherfurniture", "otherprop",
)
DEFAULT_VALID_INDEX = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 23, 25, 26, 33, 34, 35),
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 15, 20, 22, 24, 25, 27, 34),
    (0, 1, 4, 5, 6, 7, 8, 10, 19, 29, 30, 31, 32),
)


@MODELS.register_module("PPT-v1m1")
class PointPromptTraining(nn.Module):
    backbone: Any = None
    criteria: Any = None
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Sequence[str] = ("Structured3D", "ScanNet", "S3DIS")
    template: str = "[x]"
    clip_model: str = "ViT-B/16"
    class_name: Sequence[str] = DEFAULT_CLASS_NAMES
    valid_index: Sequence[Sequence[int]] = DEFAULT_VALID_INDEX
    backbone_mode: bool = False
    class_embedding_path: Optional[str] = None
    clip_embed_dim: int = 512

    def setup(self):
        assert len(self.conditions) == len(self.valid_index)
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)
        self.embedding_table = nn.Embed(len(self.conditions), self.context_channels)
        if not self.backbone_mode:
            if self.class_embedding_path and os.path.isfile(self.class_embedding_path):
                emb = np.load(self.class_embedding_path).astype(np.float32)
                emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
                self.class_embedding = lambda: jnp.asarray(emb)
                dim = emb.shape[1]
            else:
                dim = self.clip_embed_dim
                table = self.param(
                    "class_embedding",
                    nn.initializers.normal(0.02),
                    (len(self.class_name), dim),
                )
                self.class_embedding = lambda: table / jnp.linalg.norm(table, axis=-1, keepdims=True)
            self.proj_head = nn.Dense(dim)
            self.logit_scale = self.param(
                "logit_scale", lambda key: jnp.asarray(np.log(1.0 / 0.07), jnp.float32)
            )

    def __call__(self, pb: PointBatch, train: bool = False):
        condition = pb.condition
        assert condition in self.conditions, f"unknown condition {condition}"
        idx = self.conditions.index(condition)
        context = self.embedding_table(jnp.asarray([idx]))
        pb = pb.replace(context=context)
        point = self.backbone_module(pb, train)
        feat = point.feat if isinstance(point, PointBatch) else point
        if self.backbone_mode:
            return point
        feat = self.proj_head(feat)
        feat = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-8)
        emb = self.class_embedding()[jnp.asarray(self.valid_index[idx])]
        sim = feat @ emb.T
        seg_logits = jnp.exp(self.logit_scale) * sim
        result = {"seg_logits": seg_logits}
        if pb.segment is not None:
            result["loss"] = self.criteria_fn(seg_logits, pb.segment)
        return result


@MODELS.register_module("PPT-v1m2")
class PointPromptTrainingDecoupled(nn.Module):
    backbone: Any = None
    criteria: Any = None
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Sequence[str] = ("Structured3D", "ScanNet", "S3DIS")
    num_classes: Sequence[int] = (25, 20, 13)
    backbone_mode: bool = False

    def setup(self):
        assert len(self.conditions) == len(self.num_classes)
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)
        self.embedding_table = nn.Embed(len(self.conditions), self.context_channels)
        self.seg_heads = [
            nn.Dense(n, name=f"seg_head{i}") for i, n in enumerate(self.num_classes)
        ]

    def __call__(self, pb: PointBatch, train: bool = False):
        condition = pb.condition
        assert condition in self.conditions, f"unknown condition {condition}"
        idx = self.conditions.index(condition)
        context = self.embedding_table(jnp.asarray([idx]))
        pb = pb.replace(context=context)
        point = self.backbone_module(pb, train)
        feat = point.feat if isinstance(point, PointBatch) else point
        if self.backbone_mode:
            return point
        seg_logits = self.seg_heads[idx](feat)
        result = {"seg_logits": seg_logits}
        if pb.segment is not None:
            result["loss"] = self.criteria_fn(seg_logits, pb.segment)
        return result


DEFAULT_NEO_CLASS_NAMES = (
    ("wall", "floor", "cabinet", "bed", "chair",
     "sofa", "table", "door", "window", "picture",
     "desk", "shelves", "curtain", "dresser", "pillow",
     "mirror", "ceiling", "refrigerator", "television", "nightstand",
     "sink", "lamp", "otherstructure", "otherfurniture", "otherprop"),
    ("wall", "floor", "cabinet", "bed", "chair",
     "sofa", "table", "door", "window", "bookshelf",
     "picture", "counter", "desk", "curtain", "refridgerator",
     "shower curtain", "toilet", "sink", "bathtub", "otherfurniture"),
    ("ceiling", "floor", "wall", "beam", "column",
     "window", "door", "table", "chair", "sofa",
     "bookcase", "board", "clutter"),
)


@MODELS.register_module("PPT-v1m3")
class PointPromptTrainingNeo(nn.Module):
    """PPT-v1m3 "neo" (reference point_prompt_training_v1m3_neo.py:23): the
    class vocabulary is a PER-CONDITION list (no shared merged list /
    valid_index), with freeze_backbone, backbone_mode and up-cast concat for
    enc-mode backbones. CLIP text embeddings load from
    `class_embedding_path` (offline export); else a trainable table."""

    backbone: Any = None
    criteria: Any = None
    backbone_out_channels: int = 96
    conditions: Sequence[str] = ("Structured3D", "ScanNet", "S3DIS")
    template: str = "[x]"
    clip_model: str = "ViT-B/16"
    class_names: Sequence[Sequence[str]] = DEFAULT_NEO_CLASS_NAMES
    freeze_backbone: bool = False
    backbone_mode: bool = False
    class_embedding_path: Optional[str] = None
    text_dim: int = 512

    def setup(self):
        assert len(self.conditions) == len(self.class_names)
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)
        self.num_classes_per = [len(c) for c in self.class_names]
        total = sum(self.num_classes_per)
        if not self.backbone_mode:
            if self.class_embedding_path and os.path.isfile(self.class_embedding_path):
                emb = np.load(self.class_embedding_path).astype(np.float32)
                assert emb.shape[0] == total
                self.class_embedding = lambda: jnp.asarray(emb)
            else:
                table = self.param(
                    "class_embedding",
                    nn.initializers.normal(0.02),
                    (total, self.text_dim),
                )
                self.class_embedding = lambda: table / jnp.linalg.norm(table, axis=-1, keepdims=True)
            self.proj_head = nn.Dense(self.text_dim)
            self.logit_scale = self.param(
                "logit_scale", lambda key: jnp.asarray(np.log(1.0 / 0.07), jnp.float32)
            )

    def __call__(self, pb: PointBatch, train: bool = False):
        condition = pb.condition
        assert condition in self.conditions, f"unknown condition {condition}"
        idx = self.conditions.index(condition)
        point = self.backbone_module(pb, train)
        if isinstance(point, tuple):  # enc-mode: up-cast concat
            out_pb, skips = point
            feat = out_pb.feat
            for skip_pb, cluster, _ctx in reversed(list(skips)):
                m = feat.shape[0]
                up = feat[jnp.minimum(cluster, m - 1)]
                up = jnp.where((cluster < m)[:, None], up, 0)
                feat = jnp.concatenate([skip_pb.feat, up], axis=-1)
                out_pb = skip_pb.replace(feat=feat)
            point = out_pb
        feat = point.feat if isinstance(point, PointBatch) else point
        if self.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        if self.backbone_mode:
            return point
        feat = self.proj_head(feat)
        feat = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-8)
        start = sum(self.num_classes_per[:idx])
        emb = self.class_embedding()[start : start + self.num_classes_per[idx]]
        sim = feat @ emb.T
        seg_logits = jnp.exp(self.logit_scale) * sim
        result = {"seg_logits": seg_logits}
        if pb.segment is not None:
            result["loss"] = self.criteria_fn(seg_logits, pb.segment)
        return result
