"""Sonata — self-distillation pretraining (student/teacher EMA), TPU-native.

Reference: `pointcept/models/sonata/sonata_v1m1_base.py:72`:
* student/teacher pair of an enc-mode PTv3 + OnlineCluster heads (`:27`:
  MLP -> l2-normalize -> weight-normed prototype layer);
* grid-patch masking of the global views with scheduled mask size/ratio
  (`generate_mask:293`), scheduled via trainer hooks — here the `SonataHook`
  computes per-step hyperparameters host-side and the train step feeds them in
  as traced scalars;
* Sinkhorn-Knopp prototype assignment with cross-device reduction (`:267-291`,
  psum over the mesh axis);
* masked->unmasked, rolled-view and local->global kNN-matched CE losses
  (`forward:360-531`). The reference's roll_point physically swaps paired
  global views; here the same effect comes from XOR-ing the view id in the
  batch keys used for matching.
* teacher EMA after each optimizer step (`after_step:258-265`) — performed in
  the train step on the "__teacher__" state slot.

Static-shape reworks: matches carry validity flags instead of dynamic
filtering; Sinkhorn masks invalid sample columns to zero mass.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.pointops import knn_query
from pointcept_tpu.ops.segment_ops import masked_segment_reduce


class OnlineCluster(nn.Module):
    """MLP projector + weight-normed prototypes (reference `sonata_v1m1_base.py:27`)."""

    hidden_channels: int = 4096
    embed_channels: int = 512
    num_prototypes: int = 4096

    @nn.compact
    def __call__(self, feat):
        x = nn.Dense(self.hidden_channels, kernel_init=nn.initializers.truncated_normal(0.02))(feat)
        x = nn.gelu(x)
        x = nn.Dense(self.embed_channels, kernel_init=nn.initializers.truncated_normal(0.02))(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w = self.param(
            "prototypes", nn.initializers.truncated_normal(0.02), (self.embed_channels, self.num_prototypes)
        )
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return x @ w


def sinkhorn_knopp(feat, temp, valid, num_iter=3, sync_axis: Optional[str] = None):
    """Prototype assignment (reference `:267-291`); invalid samples carry zero mass."""

    def psum(x):
        return jax.lax.psum(x, sync_axis) if sync_axis is not None else x

    q = jnp.exp(feat.astype(jnp.float32) / temp).T  # [K, M]
    q = q * valid.astype(jnp.float32)[None, :]
    n = psum(jnp.sum(valid.astype(jnp.float32)))
    k = q.shape[0]
    q = q / jnp.maximum(psum(jnp.sum(q)), 1e-12)
    for _ in range(num_iter):
        row = psum(jnp.sum(q, axis=1, keepdims=True))
        q = q / jnp.maximum(row, 1e-12) / k
        col = jnp.sum(q, axis=0, keepdims=True)
        q = jnp.where(valid[None, :], q / jnp.maximum(col, 1e-12) / jnp.maximum(n, 1.0), 0.0)
    q = q * jnp.maximum(n, 1.0)
    return q.T  # [M, K]


@MODELS.register_module("Sonata-v1m1")
class Sonata(nn.Module):
    backbone: Any = None
    head_in_channels: int = 1088
    head_hidden_channels: int = 4096
    head_embed_channels: int = 512
    head_num_prototypes: int = 4096
    num_global_view: int = 2
    num_local_view: int = 4
    mask_size_start: float = 0.1
    mask_size_base: float = 0.4
    mask_size_warmup_ratio: float = 0.05
    mask_size_scale: float = 1.0  # Utonia masks in grid units: scale = grid_size
    mask_ratio_start: float = 0.3
    mask_ratio_base: float = 0.7
    mask_ratio_warmup_ratio: float = 0.05
    mask_jitter: Optional[float] = None
    teacher_temp_start: float = 0.04
    teacher_temp_base: float = 0.07
    teacher_temp_warmup_ratio: float = 0.05
    student_temp: float = 0.1
    mask_loss_weight: float = 2 / 8
    roll_mask_loss_weight: float = 2 / 8
    unmask_loss_weight: float = 4 / 8
    momentum_base: float = 0.996
    momentum_final: float = 1.0
    match_max_k: int = 8  # parity field (matching uses k=1 like the reference)
    match_max_r: float = 0.08
    up_cast_level: int = 2
    sync_axis: Optional[str] = None
    uni_teacher_head: bool = False  # v1m2: one shared teacher head for mask+unmask

    # teacher subtrees: EMA-tracked copies of student subtrees; the trainer
    # masks them out of the optimizer and EMA-updates them after each step
    # (reference keeps a separate teacher ModuleDict, `:180-186`)
    ema_pairs = {
        "teacher_backbone": "backbone_module",
        "teacher_mask_head": "mask_head",
        "teacher_unmask_head": "unmask_head",
    }

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.mask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="mask_head"
        )
        self.unmask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="unmask_head"
        )
        self.teacher_backbone = build_model(dict(self.backbone))
        self.teacher_mask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="teacher_mask_head"
        )
        self.teacher_unmask_head = OnlineCluster(
            self.head_hidden_channels, self.head_embed_channels, self.head_num_prototypes, name="teacher_unmask_head"
        )

    # -------------------------------------------------------------- utilities
    def generate_mask(self, pb: PointBatch, origin_coord, mask_size, mask_ratio, key):
        """Grid-patch random masking with traced size/ratio (reference `:293`)."""
        n = pb.capacity
        start = masked_segment_reduce(
            jnp.where(pb.mask[:, None], origin_coord, 1e9), jnp.maximum(pb.batch, 0), pb.mask,
            pb.num_scenes, "min",
        )
        rel = origin_coord - start[jnp.clip(pb.batch, 0, pb.num_scenes - 1)]
        grid = jnp.clip(jnp.floor(rel / mask_size).astype(jnp.int32), 0, (1 << 16) - 1)
        keys = ser.encode(grid, pb.key_batch(), 16, "z")
        order = ser.argsort_keys(keys)
        sk = keys[order]
        valid_sorted = pb.mask[order]
        prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
        head = valid_sorted & ~prev_eq
        cluster_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
        num_patches = jnp.sum(head.astype(jnp.int32))
        cluster = jnp.full((n,), n, jnp.int32).at[order].set(
            jnp.where(valid_sorted, cluster_sorted, n)
        )
        scores = jax.random.uniform(key, (n,))
        rank = jnp.argsort(jnp.argsort(scores))
        tag = (rank < mask_ratio * num_patches).astype(jnp.int32)
        tag = jnp.concatenate([tag, jnp.zeros((1,), jnp.int32)])
        return (tag[jnp.minimum(cluster, n)] == 1) & pb.mask, cluster

    def match_neighbour(self, q_coord, q_batch, q_mask, t_coord, t_batch, t_mask):
        """1-NN within radius; returns (index [Nq], valid [Nq])."""
        idx, dist = knn_query(
            1,
            t_coord,
            jnp.where(t_mask, t_batch, -1),
            q_coord,
            jnp.where(q_mask, q_batch, -2),
        )
        valid = (dist[:, 0] < self.match_max_r) & q_mask
        return idx[:, 0], valid

    def up_cast(self, pb: PointBatch, skips):
        """Concat up_cast_level levels of decoder-free features (reference `:349`)."""
        feat = pb.feat
        for _ in range(self.up_cast_level):
            skip_pb, cluster, _ctx = skips.pop()
            m = feat.shape[0]
            up = feat[jnp.minimum(cluster, m - 1)]
            up = jnp.where((cluster < m)[:, None], up, 0)
            feat = jnp.concatenate([skip_pb.feat, up], axis=-1)
            pb = skip_pb.replace(feat=feat)
        return pb

    def _ce(self, target_sim, pred_sim, sel, valid, batch, num_segments):
        logp = jax.nn.log_softmax(pred_sim[sel] / self.student_temp, axis=-1)
        per_point = -jnp.sum(target_sim * logp, axis=-1)
        seg = jnp.clip(batch[sel], 0, num_segments - 1)
        per_batch = masked_segment_reduce(per_point, seg, valid, num_segments, "mean")
        has = masked_segment_reduce(jnp.ones_like(per_point), seg, valid, num_segments, "sum") > 0
        return jnp.sum(per_batch * has) / jnp.maximum(jnp.sum(has), 1.0)

    # ----------------------------------------------------------------- forward
    def __call__(self, data: dict, train: bool = True, hyper: Optional[dict] = None):
        hyper = hyper or {}
        mask_size = hyper.get("mask_size", jnp.asarray(self.mask_size_base)) * self.mask_size_scale
        mask_ratio = hyper.get("mask_ratio", jnp.asarray(self.mask_ratio_base))
        teacher_temp = hyper.get("teacher_temp", jnp.asarray(self.teacher_temp_base))

        g_pb: PointBatch = data["global"]
        l_pb: PointBatch = data["local"]
        g_pb = g_pb.replace(num_scenes=g_pb.num_scenes * self.num_global_view)
        l_pb = l_pb.replace(num_scenes=l_pb.num_scenes * self.num_local_view)
        g_origin = data["global_origin_coord"]
        l_origin = data["local_origin_coord"]

        key = self.make_rng("mask") if self.has_rng("mask") else jax.random.PRNGKey(0)
        k_mask, k_jit, k_shuffle1, k_shuffle2, k_shuffle3 = jax.random.split(key, 5)

        global_mask, _ = self.generate_mask(g_pb, g_origin, mask_size, mask_ratio, k_mask)
        mask_coord = g_pb.coord
        if self.mask_jitter is not None:
            jit_noise = jnp.clip(
                jax.random.normal(k_jit, mask_coord.shape) * self.mask_jitter,
                a_max=self.mask_jitter * 2,
            )
            mask_coord = jnp.where(global_mask[:, None], mask_coord + jit_noise, mask_coord)

        result = {}
        losses = []

        # teacher global forward (no grad; EMA params, own BN stats)
        t_out, t_skips = self.teacher_backbone(g_pb.replace(origin_coord=g_origin), train)
        t_pb = self.up_cast(t_out, list(t_skips))
        t_pb = jax.lax.stop_gradient(t_pb)
        teacher_feat = t_pb.feat
        t_origin = t_pb.origin_coord
        num_g = g_pb.num_scenes

        if self.mask_loss_weight > 0 or self.roll_mask_loss_weight > 0:
            t_mask_sim = jax.lax.stop_gradient(self.teacher_mask_head(teacher_feat))

            if getattr(self.backbone_module, "mask_token", False):
                # v3m2 backbone: substitute a learned token inside the embedding
                # (reference Embedding:507-540) instead of zeroing inputs
                s_out, s_skips = self.backbone_module(
                    g_pb.replace(coord=mask_coord, origin_coord=g_origin),
                    train,
                    patch_mask=global_mask,
                )
            else:
                s_out, s_skips = self.backbone_module(
                    g_pb.replace(
                        coord=mask_coord,
                        feat=jnp.where(global_mask[:, None], 0.0, g_pb.feat),
                        origin_coord=g_origin,
                    ),
                    train,
                )
            s_pb = self.up_cast(s_out, list(s_skips))
            mask_pred_sim = self.mask_head(s_pb.feat)
            aux = dict(s_out=s_out, s_skips=s_skips, g_pb=g_pb, global_mask=global_mask)

            if self.mask_loss_weight > 0:
                sel_t, valid = self.match_neighbour(
                    s_pb.origin_coord, s_pb.batch, s_pb.mask, t_origin, t_pb.batch, t_pb.mask
                )
                target = sinkhorn_knopp(t_mask_sim[sel_t], teacher_temp, valid, sync_axis=self.sync_axis)
                target = jax.lax.stop_gradient(target)
                mask_loss = self._ce(
                    target, mask_pred_sim, jnp.arange(s_pb.capacity), valid, s_pb.batch, num_g
                )
                result["mask_loss"] = mask_loss
                losses.append(mask_loss * self.mask_loss_weight)

            if self.roll_mask_loss_weight > 0:
                # rolled teacher: swap paired global views by XOR on the view id
                rolled_batch = jnp.where(t_pb.mask, t_pb.batch ^ 1, t_pb.batch)
                sel_t, valid = self.match_neighbour(
                    s_pb.origin_coord, s_pb.batch, s_pb.mask, t_origin, rolled_batch, t_pb.mask
                )
                target = sinkhorn_knopp(t_mask_sim[sel_t], teacher_temp, valid, sync_axis=self.sync_axis)
                target = jax.lax.stop_gradient(target)
                roll_loss = self._ce(
                    target, mask_pred_sim, jnp.arange(s_pb.capacity), valid, s_pb.batch, num_g
                )
                result["roll_mask_loss"] = roll_loss
                losses.append(roll_loss * self.roll_mask_loss_weight)

        if self.unmask_loss_weight > 0:
            unmask_teacher = (
                self.teacher_mask_head
                if self.uni_teacher_head and (self.mask_loss_weight > 0 or self.roll_mask_loss_weight > 0)
                else self.teacher_unmask_head
            )
            t_unmask_sim = jax.lax.stop_gradient(unmask_teacher(teacher_feat))

            l_out, l_skips = self.backbone_module(l_pb.replace(origin_coord=l_origin), train)
            lp = self.up_cast(l_out, list(l_skips))
            unmask_pred_sim = self.unmask_head(lp.feat)

            # match local points to the PRINCIPAL global view of their scene:
            # local view v of scene b has batch b*num_local+v; principal global
            # view of scene b has batch b*num_global. Remap both to scene ids.
            l_scene = jnp.where(lp.mask, lp.batch // self.num_local_view, -2)
            principal = (t_pb.batch % self.num_global_view) == 0
            g_scene = jnp.where(t_pb.mask & principal, t_pb.batch // self.num_global_view, -1)
            sel_t, valid = self.match_neighbour(
                lp.origin_coord, l_scene, lp.mask, t_origin, g_scene, t_pb.mask & principal
            )
            target = sinkhorn_knopp(t_unmask_sim[sel_t], teacher_temp, valid, sync_axis=self.sync_axis)
            target = jax.lax.stop_gradient(target)
            unmask_loss = self._ce(
                target, unmask_pred_sim, jnp.arange(lp.capacity), valid, lp.batch, l_pb.num_scenes
            )
            result["unmask_loss"] = unmask_loss
            losses.append(unmask_loss * self.unmask_loss_weight)

        self.extra_losses(data, locals().get("aux"), result, losses, train)
        result["loss"] = sum(losses)
        return result

    def extra_losses(self, data, aux, result, losses, train):
        """Extension hook for subclasses (Concerto enc2d branch)."""
        return


@MODELS.register_module("Sonata-v1m2")
class SonataUniTeacherHead(Sonata):
    """Reference sonata_v1m2_uni_teacher_head.py: the teacher uses ONE shared
    head (the mask head) for both masked and unmasked targets; the unmask
    teacher head still exists and is EMA-updated (a dummy) for checkpoint
    compatibility."""

    uni_teacher_head: bool = True

    ema_pairs = dict(Sonata.ema_pairs)


@MODELS.register_module("Sonata-v1m3")
class SonataDistill(Sonata):
    """Reference sonata_v1m3_distill.py: distillation from a FROZEN pretrained
    teacher with a (possibly different) architecture — separate backbone_s /
    backbone_t configs, no EMA (reference after_step is a no-op, teacher
    requires_grad=False). Teacher weights come from the checkpoint loader.
    `ema_pairs` values of None mean: exclude from the optimizer but do NOT
    EMA-update or init-copy."""

    backbone_s: Any = None
    backbone_t: Any = None
    head_in_channels_s: int = 0  # parity fields; head input dims are inferred
    head_in_channels_t: int = 0

    ema_pairs = {
        "teacher_backbone": None,
        "teacher_mask_head": None,
        "teacher_unmask_head": None,
    }

    def setup(self):
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
