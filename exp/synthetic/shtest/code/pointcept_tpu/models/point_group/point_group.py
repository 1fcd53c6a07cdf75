"""PointGroup instance segmentation — TPU-native.

Reference: `pointcept/models/point_group/point_group_v1m1_base.py:24`:
semantic head + center-offset (bias) head over any backbone; losses = CE +
masked L1 + cosine on the offsets (`:70-97`); inference shifts coords by the
predicted offsets and clusters with ballquery+BFS (`:101-179`).

The jit side produces `seg_logits` + `bias_pred`; the host-side clustering
(`pointcept_tpu/ops/clustering.bfs_cluster`, native C++) runs in the InsSeg
tester, mirroring the reference where BFS is also a CPU pass.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.modules import MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch


@MODELS.register_module("PG-v1m1")
class PointGroup(nn.Module):
    backbone: Any = None
    backbone_out_channels: int = 64
    semantic_num_classes: int = 20
    semantic_ignore_index: int = -1
    segment_ignore_index: Sequence[int] = (-1, 0, 1)
    instance_ignore_index: int = -1
    cluster_thresh: float = 1.5
    cluster_closed_points: int = 300
    cluster_propose_points: int = 100
    cluster_min_points: int = 50
    voxel_size: float = 0.02

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.bias_fc1 = nn.Dense(self.backbone_out_channels)
        self.bias_norm = MaskedBatchNorm()
        self.bias_fc2 = nn.Dense(3)
        self.seg_head = nn.Dense(self.semantic_num_classes)

    def __call__(self, pb: PointBatch, train: bool = False):
        out = self.backbone_module(pb, train)
        feat = out.feat if isinstance(out, PointBatch) else out
        x = self.bias_fc1(feat)
        x = nn.relu(self.bias_norm(x, pb.mask, train))
        bias_pred = self.bias_fc2(x)
        logit_pred = self.seg_head(feat)
        result = {"seg_logits": logit_pred, "bias_pred": bias_pred}

        if pb.segment is not None and pb.instance is not None and pb.instance_centroid is not None:
            seg = pb.segment
            valid = (seg != self.semantic_ignore_index) & pb.mask
            logp = jax.nn.log_softmax(logit_pred.astype(jnp.float32), axis=-1)
            ce = -jnp.take_along_axis(logp, jnp.maximum(seg, 0)[:, None], axis=1)[:, 0]
            seg_loss = jnp.sum(jnp.where(valid, ce, 0)) / jnp.maximum(jnp.sum(valid), 1)

            inst_mask = ((pb.instance != self.instance_ignore_index) & pb.mask).astype(jnp.float32)
            bias_gt = pb.instance_centroid - pb.coord
            bias_dist = jnp.sum(jnp.abs(bias_pred - bias_gt), axis=-1)
            bias_l1_loss = jnp.sum(bias_dist * inst_mask) / (jnp.sum(inst_mask) + 1e-8)

            pred_norm = bias_pred / (jnp.linalg.norm(bias_pred, axis=1, keepdims=True) + 1e-8)
            gt_norm = bias_gt / (jnp.linalg.norm(bias_gt, axis=1, keepdims=True) + 1e-8)
            cosine = -jnp.sum(pred_norm * gt_norm, axis=-1)
            bias_cosine_loss = jnp.sum(cosine * inst_mask) / (jnp.sum(inst_mask) + 1e-8)

            result.update(
                loss=seg_loss + bias_l1_loss + bias_cosine_loss,
                seg_loss=seg_loss,
                bias_l1_loss=bias_l1_loss,
                bias_cosine_loss=bias_cosine_loss,
            )
        return result

    # ------------------------------------------------------- host-side proposals
    def propose_instances(self, coord, bias_pred, seg_prob, batch, mask):
        """Host-side clustering (numpy): reference `:101-179`.

        Returns (pred_masks [P, N] bool, pred_classes [P], pred_scores [P]).
        """
        from pointcept_tpu.ops.clustering import bfs_cluster

        coord = np.asarray(coord)
        bias_pred = np.asarray(bias_pred)
        seg_prob = np.asarray(seg_prob)
        batch = np.asarray(batch)
        mask = np.asarray(mask)
        n = coord.shape[0]
        segment_pred = seg_prob.argmax(-1)
        center_pred = (coord + bias_pred) / self.voxel_size
        keep = mask & ~np.isin(segment_pred, np.asarray(self.segment_ignore_index))
        if keep.sum() == 0:
            return np.zeros((0, n), bool), np.zeros(0, np.int32), np.zeros(0, np.float32)
        idx = np.where(keep)[0]
        cluster, num = bfs_cluster(
            center_pred[idx],
            batch[idx],
            segment_pred[idx].astype(np.int32),
            radius=self.cluster_thresh,
            min_points=self.cluster_min_points,
            max_neighbors=self.cluster_closed_points,
        )
        masks, classes, scores = [], [], []
        for c in range(num):
            members = idx[cluster == c]
            if len(members) <= self.cluster_propose_points:
                continue
            m = np.zeros(n, bool)
            m[members] = True
            cls = segment_pred[members[0]]
            score = float(seg_prob[members, cls].mean())
            masks.append(m)
            classes.append(cls)
            scores.append(score)
        if not masks:
            return np.zeros((0, n), bool), np.zeros(0, np.int32), np.zeros(0, np.float32)
        return np.stack(masks), np.asarray(classes, np.int32), np.asarray(scores, np.float32)


@MODELS.register_module("PG-v1m2")
class PointGroupV1M2(PointGroup):
    """PG-v1m2 (reference point_group_v1m2_custom_criteria.py:25): PointGroup
    with a configurable semantic criteria list, optional frozen backbone, and
    up-cast concat for enc-mode backbones (Sonata-pretrained PG probing)."""

    criteria: Any = None
    freeze_backbone: bool = False
    up_cast_level: int = 0

    def setup(self):
        super().setup()
        from pointcept_tpu.models.losses import build_criteria

        self.seg_criteria = build_criteria(
            self.criteria
            if self.criteria is not None
            else [dict(type="CrossEntropyLoss", ignore_index=self.semantic_ignore_index)]
        )

    def __call__(self, pb: PointBatch, train: bool = False):
        out = self.backbone_module(pb, train)
        if isinstance(out, tuple):  # enc-mode backbone: up-cast skip concat
            out_pb, skips = out
            feat = out_pb.feat
            skips = list(skips)
            for _ in range(self.up_cast_level if self.up_cast_level else len(skips)):
                if not skips:
                    break
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
        x = self.bias_fc1(feat)
        x = nn.relu(self.bias_norm(x, pb.mask, train))
        bias_pred = self.bias_fc2(x)
        logit_pred = self.seg_head(feat)
        result = {"seg_logits": logit_pred, "bias_pred": bias_pred}

        if pb.segment is not None and pb.instance is not None and pb.instance_centroid is not None:
            seg_loss = self.seg_criteria(logit_pred, pb.segment)
            inst_mask = ((pb.instance != self.instance_ignore_index) & pb.mask).astype(jnp.float32)
            bias_gt = pb.instance_centroid - pb.coord
            bias_dist = jnp.sum(jnp.abs(bias_pred - bias_gt), axis=-1)
            bias_l1_loss = jnp.sum(bias_dist * inst_mask) / (jnp.sum(inst_mask) + 1e-8)
            pred_norm = bias_pred / (jnp.linalg.norm(bias_pred, axis=1, keepdims=True) + 1e-8)
            gt_norm = bias_gt / (jnp.linalg.norm(bias_gt, axis=1, keepdims=True) + 1e-8)
            cosine = -jnp.sum(pred_norm * gt_norm, axis=-1)
            bias_cosine_loss = jnp.sum(cosine * inst_mask) / (jnp.sum(inst_mask) + 1e-8)
            result.update(
                loss=seg_loss + bias_l1_loss + bias_cosine_loss,
                seg_loss=seg_loss,
                bias_l1_loss=bias_l1_loss,
                bias_cosine_loss=bias_cosine_loss,
            )
        return result
