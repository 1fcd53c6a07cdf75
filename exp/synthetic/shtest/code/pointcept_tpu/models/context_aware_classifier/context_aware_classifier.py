"""Context-Aware Classifier segmentor head (CAC) — TPU-native.

Reference: `pointcept/models/context_aware_classifier/context_aware_classifier_v1m1_base.py:17`.
Refines the linear classifier with per-scene predicted-class prototypes
(`post_refine_proto_batch`) and a ground-truth adaptive perspective branch
(`get_adaptive_perspective`), plus an entropy-weighted distillation loss.
The reference's per-scene python loop becomes batched einsums over a scene
one-hot; dynamic unique-class loops become masked class reductions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.losses import build_criteria
from pointcept_tpu.models.modules import MaskedBatchNorm
from pointcept_tpu.models.utils.structure import PointBatch


@MODELS.register_module("CAC-v1m1")
class CACSegmentor(nn.Module):
    num_classes: int = 20
    backbone_out_channels: int = 64
    backbone: Any = None
    criteria: Any = None
    cos_temp: float = 15.0
    main_weight: float = 1.0
    pre_weight: float = 1.0
    pre_self_weight: float = 1.0
    kl_weight: float = 1.0
    conf_thresh: float = 0.0
    detach_pre_logits: bool = False

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.criteria_fn = build_criteria(self.criteria)
        # explicit params (the prototype matrix doubles as the classifier kernel)
        self.seg_head_kernel = self.param(
            "seg_head_kernel", nn.initializers.lecun_normal(), (self.backbone_out_channels, self.num_classes)
        )
        self.seg_head_bias = self.param("seg_head_bias", nn.initializers.zeros, (self.num_classes,))
        c = self.backbone_out_channels
        self.proj_fc1 = nn.Dense(2 * c, use_bias=False)
        self.proj_fc2 = nn.Dense(c)
        self.apd_fc1 = nn.Dense(2 * c, use_bias=False)
        self.apd_fc2 = nn.Dense(c)
        self.featproj_fc1 = nn.Dense(c, use_bias=False)
        self.featproj_norm = MaskedBatchNorm()
        self.featproj_fc2 = nn.Dense(c)

    @staticmethod
    def _cos_pred(x, proto):
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        proto = proto / jnp.maximum(jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-12)
        return x @ proto.T

    def _proj(self, x):
        return self.proj_fc2(nn.relu(self.proj_fc1(x)))

    def _apd_proj(self, x):
        return self.apd_fc2(nn.relu(self.apd_fc1(x)))

    def _feat_proj(self, x, mask, train):
        x = self.featproj_fc1(x)
        x = nn.relu(self.featproj_norm(x, mask, train))
        return self.featproj_fc2(x)

    def post_refine_proto_batch(self, feat, pred, proto, pb, train):
        """Per-scene prototypes from predicted soft assignments (reference
        `post_refine_proto_batch:103`)."""
        if self.detach_pre_logits:
            pred = jax.lax.stop_gradient(pred)
        b = pb.num_scenes
        p = jax.nn.softmax(pred.astype(jnp.float32), axis=1)  # [N, cls]
        if self.conf_thresh > 0:
            p = p * (p.max(1, keepdims=True) >= self.conf_thresh)
        p = p * pb.mask[:, None]
        onehot_b = jax.nn.one_hot(jnp.clip(pb.batch, 0, b - 1), b, dtype=p.dtype) * pb.mask[:, None]
        denom = jnp.einsum("nb,nc->bc", onehot_b, p) + 1e-7  # [B, cls]
        proto_b = jnp.einsum("nb,nc,nd->bcd", onehot_b, p, feat.astype(p.dtype)) / denom[..., None]
        proto_b = jnp.concatenate(
            [proto_b, jnp.tile(proto[None], (b, 1, 1))], axis=-1
        )  # [B, cls, 2C]
        proto_b = self._proj(proto_b)
        x = self._feat_proj(feat, pb.mask, train)
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        pn = proto_b / jnp.maximum(jnp.linalg.norm(proto_b, axis=-1, keepdims=True), 1e-12)
        per_scene = jnp.einsum("nd,bcd->nbc", xn, pn)
        return jnp.take_along_axis(
            per_scene, jnp.clip(pb.batch, 0, b - 1)[:, None, None], axis=1
        )[:, 0, :]

    def get_adaptive_perspective(self, feat, target, new_proto, proto, pb, train):
        """GT class-mean prototypes replace present rows (reference `:76`)."""
        cls = self.num_classes
        valid = (target >= 0) & pb.mask
        t = jnp.clip(target, 0, cls - 1)
        onehot = jax.nn.one_hot(t, cls, dtype=feat.dtype) * valid[:, None].astype(feat.dtype)
        sums = onehot.T @ feat  # [cls, C]
        counts = onehot.sum(0)[:, None]  # [cls, 1]
        class_mean = sums / (counts + 1e-4)
        present = (counts > 0).astype(feat.dtype)
        new_proto = new_proto * (1 - present) + class_mean * present
        new_proto = jnp.concatenate([new_proto, proto], axis=-1)
        new_proto = self._apd_proj(new_proto)
        x = self._feat_proj(feat, pb.mask, train)
        return self._cos_pred(x, new_proto)

    def get_distill_loss(self, pred, soft, target, pb, smoothness=0.5, eps=0.0):
        n, c = soft.shape
        soft = jax.lax.stop_gradient(soft)
        valid = (target >= 0) & pb.mask
        t = jnp.clip(target, 0, c - 1)
        sm_soft = jax.nn.softmax(soft.astype(jnp.float32), axis=1)
        onehot = jax.nn.one_hot(t, c, dtype=jnp.float32) * valid[:, None]
        smoothed = smoothness * sm_soft + (1 - smoothness) * onehot
        if eps > 0:
            smoothed = smoothed * (1 - eps) + (1 - smoothed) * eps / (c - 1)
        loss = -jnp.sum(jax.nn.log_softmax(pred.astype(jnp.float32), axis=1) * smoothed, axis=1)
        entropy = -jnp.sum(sm_soft * jnp.log(sm_soft + 1e-4), axis=1) * valid
        # class-wise entropy-weighted means over present classes
        w_sum = jax.ops.segment_sum(entropy, t * valid + (1 - valid) * c, num_segments=c + 1)[:c]
        l_sum = jax.ops.segment_sum(loss * entropy, t * valid + (1 - valid) * c, num_segments=c + 1)[:c]
        present = (jax.ops.segment_sum(valid.astype(jnp.float32), t * valid + (1 - valid) * c, num_segments=c + 1)[:c] > 0)
        per_class = l_sum / (w_sum + 1e-4)
        return jnp.sum(per_class * present) / jnp.maximum(jnp.sum(present), 1e-4)

    def __call__(self, pb: PointBatch, train: bool = False):
        out = self.backbone_module(pb, train)
        feat = out.feat if isinstance(out, PointBatch) else out
        seg_logits = feat @ self.seg_head_kernel + self.seg_head_bias
        proto = self.seg_head_kernel.T  # [cls, C]

        refine_logits = self.post_refine_proto_batch(feat, seg_logits, proto, pb, train) * self.cos_temp
        result = {"seg_logits": refine_logits}
        if self.is_initializing() and pb.segment is not None and not train:
            # materialize the adaptive-perspective branch params at init
            _ = self.get_adaptive_perspective(
                feat, pb.segment, jax.lax.stop_gradient(proto), proto, pb, False
            )
        if pb.segment is not None:
            target = pb.segment
            if train:
                cac_pred = (
                    self.get_adaptive_perspective(
                        feat, target, jax.lax.stop_gradient(proto), proto, pb, train
                    )
                    * self.cos_temp
                )
                seg_loss = self.criteria_fn(refine_logits, target) * self.main_weight
                pre_loss = self.criteria_fn(cac_pred, target) * self.pre_weight
                pre_self_loss = self.criteria_fn(seg_logits, target) * self.pre_self_weight
                kl_loss = self.get_distill_loss(refine_logits, cac_pred, target, pb) * self.kl_weight
                result.update(
                    loss=seg_loss + pre_loss + pre_self_loss + kl_loss,
                    seg_loss=seg_loss,
                    pre_loss=pre_loss,
                    pre_self_loss=pre_self_loss,
                    kl_loss=kl_loss,
                )
            else:
                result["loss"] = self.criteria_fn(seg_logits, target)
        return result
