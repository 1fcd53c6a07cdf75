"""Masked Scene Contrast (MSC) — self-supervised pretraining, TPU-native.

Reference: `pointcept/models/masked_scene_contrast/masked_scene_contrast_v1m1_base.py:25`.
Two augmented views of each scene; cross-view complementary grid-patch masking
(`generate_cross_masks`, `:69-141`), kNN-matched InfoNCE contrast
(`match_contrastive_pair` + `compute_contrastive_loss`, `:143-203`) and masked
color/normal reconstruction.

Static-shape reworks:
* union grid-patch clustering reuses the sorted-run machinery (static patch
  capacity); the exact-count randperm mask becomes a rank threshold against the
  (traced) patch count — same 2*mask_rate coverage in expectation;
* "one random in-radius neighbor per query, capped at max_pair" becomes a
  gumbel-top-k selection over valid matches with validity-masked InfoNCE.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.pointops import knn_query


def grid_patch_clusters(origin_coord, batch, mask, grid_size, patch_capacity):
    """Cluster ids by (batch, floor(origin/grid)); returns (cluster_of_point [N]
    (=cap for padding/overflow), num_patches scalar)."""
    n = origin_coord.shape[0]
    grid = jnp.floor(origin_coord / grid_size).astype(jnp.int32)
    grid = grid - jnp.min(jnp.where(mask[:, None], grid, 1 << 20))
    grid = jnp.clip(grid, 0, (1 << 16) - 1)
    keys = ser.encode(grid, jnp.where(mask, batch, ser.BATCH_SENTINEL), 16, "z")
    order = ser.argsort_keys(keys)
    sk = keys[order]
    valid_sorted = mask[order]
    prev_eq = jnp.concatenate([jnp.array([False]), ser.keys_equal(sk[1:], sk[:-1])])
    head = valid_sorted & ~prev_eq
    cluster_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1
    num_patches = jnp.sum(head.astype(jnp.int32))
    cap = patch_capacity
    cl = jnp.where(valid_sorted & (cluster_sorted < cap), cluster_sorted, cap)
    cluster_of_point = jnp.full((n,), cap, jnp.int32).at[order].set(cl)
    return cluster_of_point, num_patches


@MODELS.register_module("MSC-v1m1")
class MaskedSceneContrast(nn.Module):
    backbone: Any = None
    backbone_in_channels: int = 6
    backbone_out_channels: int = 96
    mask_grid_size: float = 0.1
    mask_rate: float = 0.4
    view1_mix_prob: float = 0  # mixing handled in collate for static shapes
    view2_mix_prob: float = 0
    matching_max_k: int = 8
    matching_max_radius: float = 0.03
    matching_max_pair: int = 8192
    nce_t: float = 0.4
    contrast_weight: float = 1.0
    reconstruct_weight: float = 1.0
    reconstruct_color: bool = True
    reconstruct_normal: bool = True

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02), (1, self.backbone_in_channels)
        )
        if self.reconstruct_color:
            self.color_head = nn.Dense(3)
        if self.reconstruct_normal:
            self.normal_head = nn.Dense(3)

    def generate_cross_masks(self, v1_origin, pb1, v2_origin, pb2, key):
        n1 = pb1.capacity
        union_coord = jnp.concatenate([v1_origin, v2_origin])
        union_batch = jnp.concatenate([pb1.batch, pb2.batch])
        union_mask = jnp.concatenate([pb1.mask, pb2.mask])
        cap = union_coord.shape[0]  # patches <= points
        cluster, num_patches = grid_patch_clusters(
            union_coord, union_batch, union_mask, self.mask_grid_size, cap
        )
        scores = jax.random.uniform(key, (cap,))
        rank = jnp.argsort(jnp.argsort(scores))  # uniform random ranks over capacity
        # only the first num_patches ranks correspond to real patches in
        # expectation; tag by rank thresholds on the real patch count
        thresh1 = self.mask_rate * num_patches
        tags = jnp.where(rank < thresh1, 1, jnp.where(rank < 2 * thresh1, 2, 0)).astype(jnp.int32)
        tags = jnp.concatenate([tags, jnp.zeros((1,), jnp.int32)])  # padding bucket
        point_tag = tags[jnp.minimum(cluster, cap)]
        point_tag = jnp.where(union_mask, point_tag, 0)
        return (point_tag[:n1] == 1) & pb1.mask, (point_tag[n1:] == 2) & pb2.mask

    def match_contrastive_pair(self, v1_origin, pb1, v2_origin, pb2, key):
        idx, dist = knn_query(
            self.matching_max_k,
            v2_origin,
            jnp.where(pb2.mask, pb2.batch, -1),
            v1_origin,
            jnp.where(pb1.mask, pb1.batch, -2),
        )
        in_radius = (dist < self.matching_max_radius) & pb1.mask[:, None]
        k1, k2 = jax.random.split(key)
        # one random in-radius neighbor per query (gumbel argmax over valid)
        g = jax.random.gumbel(k1, idx.shape)
        g = jnp.where(in_radius, g, -jnp.inf)
        pick = jnp.argmax(g, axis=1)
        pair_j = jnp.take_along_axis(idx, pick[:, None], axis=1)[:, 0]
        pair_valid = jnp.any(in_radius, axis=1)
        # subsample max_pair queries uniformly among valid
        score = jax.random.uniform(k2, (pb1.capacity,)) + jnp.where(pair_valid, 0.0, -2.0)
        _, sel = jax.lax.top_k(score, min(self.matching_max_pair, pb1.capacity))
        return sel, pair_j[sel], pair_valid[sel]

    def compute_contrastive_loss(self, feat1, feat2, sel_i, sel_j, valid,
                                 coord1=None, coord2=None, batch=None):
        a = feat1[sel_i]
        b = feat2[sel_j]
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-7)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-7)
        sim = a @ b.T  # [P, P]
        p = sim.shape[0]
        # invalid columns must not act as negatives; invalid rows contribute 0
        col_ok = valid[None, :] | jnp.eye(p, dtype=bool)
        logits = jnp.where(col_ok, sim / self.nce_t, -jnp.inf)
        logp = jax.nn.log_softmax(logits, axis=-1)
        diag = jnp.diagonal(logp)
        vf = valid.astype(jnp.float32)
        loss = -jnp.sum(diag * vf) / jnp.maximum(jnp.sum(vf), 1.0)
        pos_sim = jnp.sum(jnp.diagonal(sim) * vf) / jnp.maximum(jnp.sum(vf), 1.0)
        neg_sim = jnp.sum(sim * vf[:, None] * vf[None, :]) / jnp.maximum(jnp.sum(vf) ** 2, 1.0)
        return loss, pos_sim, neg_sim

    def _backbone_feat(self, pb, train):
        out = self.backbone_module(pb, train)
        return out.feat if isinstance(out, PointBatch) else out

    def __call__(self, data: dict, train: bool = True):
        pb1: PointBatch = data["view1"]
        pb2: PointBatch = data["view2"]
        v1_origin = data["view1_origin_coord"]
        v2_origin = data["view2_origin_coord"]
        key = self.make_rng("mask") if self.has_rng("mask") else jax.random.PRNGKey(0)
        k_mask, k_match = jax.random.split(key)

        m1, m2 = self.generate_cross_masks(v1_origin, pb1, v2_origin, pb2, k_mask)
        tok = self.mask_token
        feat1 = jnp.where(m1[:, None], tok, pb1.feat)
        feat2 = jnp.where(m2[:, None], tok, pb2.feat)

        f1 = self._backbone_feat(pb1.replace(feat=feat1), train)
        f2 = self._backbone_feat(pb2.replace(feat=feat2), train)

        sel_i, sel_j, valid = self.match_contrastive_pair(v1_origin, pb1, v2_origin, pb2, k_match)
        nce_loss, pos_sim, neg_sim = self.compute_contrastive_loss(
            f1, f2, sel_i, sel_j, valid, v1_origin, v2_origin, jnp.where(pb1.mask, pb1.batch, -1)
        )
        loss = nce_loss * self.contrast_weight
        result = dict(nce_loss=nce_loss, pos_sim=pos_sim, neg_sim=neg_sim)

        if self.reconstruct_color:
            c1 = self.color_head(f1)
            c2 = self.color_head(f2)
            w1 = m1.astype(jnp.float32)[:, None]
            w2 = m2.astype(jnp.float32)[:, None]
            denom = jnp.maximum(jnp.sum(m1) + jnp.sum(m2), 1.0)
            color_loss = (
                jnp.sum(jnp.square(c1 - data["view1_color"]) * w1)
                + jnp.sum(jnp.square(c2 - data["view2_color"]) * w2)
            ) / denom
            loss = loss + color_loss * self.reconstruct_weight
            result["color_loss"] = color_loss
        if self.reconstruct_normal:
            n1p = self.normal_head(f1)
            n2p = self.normal_head(f2)
            n1p = n1p / (jnp.linalg.norm(n1p, axis=1, keepdims=True) + 1e-10)
            n2p = n2p / (jnp.linalg.norm(n2p, axis=1, keepdims=True) + 1e-10)
            w1 = m1.astype(jnp.float32)[:, None]
            w2 = m2.astype(jnp.float32)[:, None]
            denom = jnp.maximum(jnp.sum(m1) + jnp.sum(m2), 1.0)
            normal_loss = (
                jnp.sum(n1p * data["view1_normal"] * w1) + jnp.sum(n2p * data["view2_normal"] * w2)
            ) / denom
            loss = loss + normal_loss * self.reconstruct_weight
            result["normal_loss"] = normal_loss

        result["loss"] = loss
        return result


@MODELS.register_module("MSC-v1m2")
class MaskedSceneContrastCSC(MaskedSceneContrast):
    """CSC variant (reference masked_scene_contrast_v1m2_csc.py:25-377,
    "Contrastive Scene Contexts"): the InfoNCE negatives are restricted to
    spatial partitions around each anchor — (r1 < d <= r2) x (above/below) and
    (d > r2) x (above/below) — one softmax per partition, averaged over
    partitions and scenes. Pairs closer than r1 are never negatives."""

    partitions: int = 4
    r1: float = 0.125
    r2: float = 2.0

    def compute_contrastive_loss(self, feat1, feat2, sel_i, sel_j, valid,
                                 coord1=None, coord2=None, batch=None):
        a = feat1[sel_i]
        b = feat2[sel_j]
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-7)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-7)
        sim = a @ b.T  # [P, P]
        p = sim.shape[0]
        c1 = coord1[sel_i]
        c2 = coord2[sel_j]
        pb_batch = batch[sel_i]
        pb_batch = jnp.where(valid, pb_batch, -1)

        rel = c1[:, None, :] - c2[None, :, :]
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-7)
        up = rel[:, :, 2] > 0.0
        ring = (dist > self.r1) & (dist <= self.r2)
        far = dist > self.r2
        part = jnp.where(
            ring, jnp.where(up, 0, 1), jnp.where(far, jnp.where(up, 2, 3), -1)
        )

        eye = jnp.eye(p, dtype=bool)
        same_scene = (pb_batch[:, None] == pb_batch[None, :]) & (pb_batch[:, None] >= 0)
        base_ok = (same_scene & valid[None, :]) | eye

        vf = valid.astype(jnp.float32)
        num_scenes = jnp.maximum(jnp.max(pb_batch) + 1, 1)
        # per-row weight: 1 / (num_scenes * rows in that scene) — reproduces the
        # reference's per-scene CE mean averaged over scenes
        from pointcept_tpu.ops.segment_ops import segment_reduce

        counts = segment_reduce(vf[:, None], jnp.where(valid, pb_batch, p), p, "sum")[..., 0]
        row_cnt = jnp.where(valid, counts[jnp.clip(pb_batch, 0, p - 1)], 1.0)
        row_w = vf / (jnp.maximum(row_cnt, 1.0) * num_scenes.astype(jnp.float32))

        loss = 0.0
        for pid in range(self.partitions):
            ok = (base_ok & (part == pid)) | eye
            logits = jnp.where(ok, sim / self.nce_t, -jnp.inf)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = loss - jnp.sum(jnp.diagonal(logp) * row_w)
        loss = loss / self.partitions

        pos_sim = jnp.sum(jnp.diagonal(sim) * vf) / jnp.maximum(jnp.sum(vf), 1.0)
        neg_sim = jnp.sum(sim * vf[:, None] * vf[None, :]) / jnp.maximum(jnp.sum(vf) ** 2, 1.0)
        return loss, pos_sim, neg_sim
