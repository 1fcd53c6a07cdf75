"""Concerto — joint 2D-3D self-supervised learning, TPU-native.

Reference: `pointcept/models/concerto/concerto_v1m1_base.py:82-872` — Sonata's
masked self-distillation PLUS an `enc2d` branch: per-point pixel
correspondences project point features into image-patch slots (scatter-mean),
a linear `patch_proj` maps them to the frozen 2D encoder's width, and a cosine
loss (`(1 - cos) * 10`, optionally mean-shifted) aligns the pooled 3D patch
features with the frozen image features (DINOv2 / SigLIPv2 / RADIO via HF
transformers, `load_enc2d:284`, `ENC2D_forward:309`).

TPU reworks:
- the frozen image encoder runs OUTSIDE the jitted train step (it is frozen —
  its outputs are data, not parameters). Provide `feature2d`
  [num_scenes * max_images, patch_h * patch_w, C2d] in the batch, produced by
  `concerto.enc2d.TorchImageEncoder` (HF transformers on host CPU/GPU) or any
  precompute pipeline;
- ragged per-scene image lists -> a static `max_images` budget per scene with
  correspondence == (-1, -1) padding;
- torch_scatter.scatter_mean into patch slots -> masked `segment_reduce`;
- the enc2d branch reads the FULL-RESOLUTION up-cast of the masked student
  (reference default enc2d_upcast_level == num_stages - 1; the partial
  `pool_corr` pooling path of coarser levels is not replicated).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.sonata.sonata import Sonata
from pointcept_tpu.ops.segment_ops import masked_segment_reduce

import flax.linen as nn


@MODELS.register_module("Concerto-v1m1")
class Concerto(Sonata):
    patch_h: int = 16
    patch_w: int = 16
    max_images: int = 1  # static per-scene image budget (ragged img_num -> padded)
    enc2d_in_channels: int = 384  # frozen 2D encoder width
    enc2d_loss_weight: float = 2 / 10
    enc2d_cos_shift: bool = True
    full_cast_channels: int = 0  # channel count of the full-resolution up-cast
    # number of up-casts from the bottleneck for the enc2d branch; None = the
    # full chain (full resolution). Utonia sets 3 (of 4): the branch then reads
    # stage-1 features with the correspondences POOLED through the remaining
    # cluster level (reference `utonia_v1m1_base.py:531-576` pool_corr)
    enc2d_upcast_level: Optional[int] = None

    ema_pairs = dict(Sonata.ema_pairs)

    def setup(self):
        super().setup()
        self.patch_proj = nn.Dense(self.enc2d_in_channels, name="patch_proj")

    def extra_losses(self, data, aux, result, losses, train):
        if self.enc2d_loss_weight <= 0:
            return
        assert aux is not None, "Concerto enc2d branch requires mask losses enabled"
        feature2d = data.get("feature2d")
        corr = data.get("global_correspondence")  # [Ng, max_images, 2] int32, -1 pad
        if feature2d is None or corr is None:
            return

        g_pb = aux["g_pb"]
        skips = list(aux["s_skips"])
        if self.enc2d_upcast_level is None or self.enc2d_upcast_level >= len(skips):
            # full-resolution up-cast of the masked student
            s_full = self.up_cast_full(aux["s_out"], skips)
            lvl_batch, lvl_mask = g_pb.batch, g_pb.mask
        else:
            # up-cast only enc2d_upcast_level levels from the bottleneck, then
            # pool the full-res correspondences through the remaining cluster
            # chain (reference pool_corr, utonia_v1m1_base.py:531-576)
            s_full = aux["s_out"]
            feat = s_full.feat
            for _ in range(self.enc2d_upcast_level):
                skip_pb, cluster, _ctx = skips.pop()
                m = feat.shape[0]
                up = feat[jnp.minimum(cluster, m - 1)]
                up = jnp.where((cluster < m)[:, None], up, 0)
                feat = jnp.concatenate([skip_pb.feat, up], axis=-1)
                s_full = skip_pb.replace(feat=feat)
            for i, (skip_pb, cluster, _ctx) in enumerate(skips):  # full-res first
                out_size = (
                    skips[i + 1][0].feat.shape[0] if i + 1 < len(skips)
                    else s_full.feat.shape[0]
                )
                corr = self._pool_corr_once(corr, cluster, out_size)
            lvl_batch, lvl_mask = s_full.batch, s_full.mask
        num_g_scenes = g_pb.num_scenes

        # principal global view only (reference enc2d_mask, :761-776)
        principal = (lvl_batch % self.num_global_view == 0) & lvl_mask
        n = s_full.feat.shape[0]
        ph, pw = self.patch_h, self.patch_w
        ppi = ph * pw
        scene = jnp.maximum(lvl_batch // self.num_global_view, 0)

        num_slots = num_g_scenes // self.num_global_view * self.max_images * ppi
        total_pairs_feat = []
        total_pairs_slot = []
        total_pairs_valid = []
        for v in range(self.max_images):
            cv = corr[:, v, :]  # [Ng, 2] = (patch row, patch col)
            valid = principal & (cv[:, 0] >= 0) & (cv[:, 1] >= 0)
            # pooled correspondences are float means: truncate to patch cells
            cv = jnp.floor(cv).astype(jnp.int32)
            slot = (
                (scene * self.max_images + v) * ppi
                + jnp.clip(cv[:, 0], 0, ph - 1) * pw
                + jnp.clip(cv[:, 1], 0, pw - 1)
            )
            total_pairs_feat.append(s_full.feat)
            total_pairs_slot.append(jnp.where(valid, slot, num_slots))
            total_pairs_valid.append(valid)
        pair_feat = jnp.concatenate(total_pairs_feat, axis=0)
        pair_slot = jnp.concatenate(total_pairs_slot, axis=0)
        pair_valid = jnp.concatenate(total_pairs_valid, axis=0)

        feat3d = masked_segment_reduce(pair_feat, pair_slot, pair_valid, num_slots, "mean")
        occupied = (
            masked_segment_reduce(
                jnp.ones((pair_feat.shape[0], 1)), pair_slot, pair_valid, num_slots, "sum"
            )[:, 0]
            > 0
        )
        feat3d = self.patch_proj(feat3d)  # [slots, C2d]
        feat2d = jax.lax.stop_gradient(feature2d.reshape(-1, feature2d.shape[-1]))
        if self.enc2d_cos_shift:
            feat2d = feat2d - feat2d.mean(axis=-1, keepdims=True)
            feat3d = feat3d - feat3d.mean(axis=-1, keepdims=True)
        # where-trick: empty slots are exactly 0 and norm' (0) = NaN; substitute
        # ones for masked slots so the backward stays finite
        feat3d = jnp.where(occupied[:, None], feat3d, 1.0)
        feat2d = jnp.where(occupied[:, None], feat2d, 1.0)
        cos = jnp.sum(feat2d * feat3d, axis=-1) / (
            jnp.linalg.norm(feat2d, axis=-1) * jnp.linalg.norm(feat3d, axis=-1) + 1e-6
        )
        of = occupied.astype(jnp.float32)
        enc2d_loss = jnp.sum((1.0 - cos) * of) / jnp.maximum(jnp.sum(of), 1.0) * 10.0
        result["enc2d_loss"] = enc2d_loss
        losses.append(enc2d_loss * self.enc2d_loss_weight)

    @staticmethod
    def _pool_corr_once(corr, cluster, out_size):
        """Pool [N, V, 2] patch correspondences one cluster level up: mean of
        the valid entries per cluster, -1 where none (reference pool_corr,
        `utonia_v1m1_base.py:548-573`)."""
        v = corr.shape[1]
        valid = (corr[..., 0] >= 0) & (corr[..., 1] >= 0)  # [N, V]
        seg = jnp.minimum(cluster, out_size - 1)
        ok = cluster < out_size
        cols = []
        for i in range(v):
            m_i = valid[:, i] & ok
            mean = masked_segment_reduce(corr[:, i, :], seg, m_i, out_size, "mean")
            cnt = masked_segment_reduce(
                jnp.ones((corr.shape[0], 1)), seg, m_i, out_size, "sum"
            )[:, 0]
            cols.append(jnp.where((cnt > 0)[:, None], mean, -1.0))
        return jnp.stack(cols, axis=1)

    def up_cast_full(self, pb, skips):
        """Up-cast concat through the ENTIRE skip chain (full resolution)."""
        feat = pb.feat
        while skips:
            skip_pb, cluster, _ctx = skips.pop()
            m = feat.shape[0]
            up = feat[jnp.minimum(cluster, m - 1)]
            up = jnp.where((cluster < m)[:, None], up, 0)
            feat = jnp.concatenate([skip_pb.feat, up], axis=-1)
            pb = skip_pb.replace(feat=feat)
        return pb


@MODELS.register_module("Concerto-v1m2_distill")
class ConcertoDistill(Concerto):
    """Reference concerto_v1m2_distill.py: Concerto with a FROZEN pretrained
    teacher of a (possibly different) architecture — separate backbone_s /
    backbone_t, no EMA (ema_pairs values of None freeze without updating)."""

    backbone_s: Any = None
    backbone_t: Any = None
    head_in_channels_s: int = 0  # parity fields; dims are inferred lazily
    head_in_channels_t: int = 0

    ema_pairs = {
        "teacher_backbone": None,
        "teacher_mask_head": None,
        "teacher_unmask_head": None,
    }

    def setup(self):
        from pointcept_tpu.models.builder import build_model
        from pointcept_tpu.models.sonata.sonata import OnlineCluster

        student_cfg = dict(self.backbone_s if self.backbone_s is not None else self.backbone)
        teacher_cfg = dict(self.backbone_t if self.backbone_t is not None else self.backbone)
        self.backbone_module = build_model(student_cfg)
        self.teacher_backbone = build_model(teacher_cfg)
        self.mask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="mask_head"
        )
        self.unmask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="unmask_head"
        )
        self.teacher_mask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="teacher_mask_head"
        )
        self.teacher_unmask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="teacher_unmask_head"
        )
        self.patch_proj = nn.Dense(self.enc2d_in_channels, name="patch_proj")
