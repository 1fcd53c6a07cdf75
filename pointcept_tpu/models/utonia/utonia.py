"""Utonia — "one encoder for all point clouds", TPU-native.

Reference: `pointcept/models/utonia/utonia_v1m1_base.py:85-875`. Concerto's
loss suite (masked / rolled / unmasked self-distillation + enc2d cosine
alignment against a frozen 2D encoder) with Utonia's specifics:

* **grid-unit masks**: mask sizes are expressed in grid units and multiplied
  by the voxel grid size (`generate_mask:460-462`) — `mask_size_scale` carries
  the grid size;
* **Sonata-initialized teacher** (`sonata_model_type`): "offline" keeps the
  teacher backbone FROZEN at its loaded (Sonata) weights — only the heads are
  EMA-tracked (`after_step:401-419`); "online" EMA-updates the backbone too.
  Loading Sonata weights into the teacher is the checkpoint loader's job
  (CheckpointLoader with keywords="backbone_module",
  replacement="teacher_backbone" — reference `load_sonata:291-309`);
* **teacher_custom**: teacher-only backbone overrides (drop_path=0 etc.,
  reference `:204-207`);
* **intermediate enc2d level** (`enc2d_upcast_level`, default 3 of 4): the 2D
  alignment reads stage-1 features with correspondences pooled through the
  remaining cluster level (reference `pool_corr:531-576`) — implemented in
  Concerto's enc2d branch;
* the backbone is the Utonia PTv3 variant (PT-v3m3: linear embedding, mask
  token, LayerScale, 3D RoPE with train-time coordinate jitter/rescale).

The staged multi-domain pretraining (stage v1 indoor -> stage v2 + objects
with PartialSampledTrainer, reference configs/utonia/pretrain-*-stagev{1,2})
is config-driven: stage 2 resumes from stage 1's weights. SonataHook drives
the mask/temp/momentum schedules.

The reference also constructs `enc2d_head_{student,teacher}` OnlineCluster
pairs that its loss never reads (dead parameters, `:226-248`); they are
accepted as parity fields but not built.
"""

from __future__ import annotations

from typing import Any, Optional

from pointcept_tpu.models.builder import MODELS, build_model
from pointcept_tpu.models.concerto.concerto import Concerto
from pointcept_tpu.models.sonata.sonata import OnlineCluster

import flax.linen as nn


@MODELS.register_module("Utonia-v1m1")
class Utonia(Concerto):
    # grid-unit mask schedule (reference defaults mask_size_start=5, base=20;
    # the stage configs use 10/40)
    mask_size_start: float = 5.0
    mask_size_base: float = 20.0
    mask_size_scale: float = 0.02  # grid units -> meters (the backbone grid size)
    sonata_model_type: str = "offline"
    teacher_custom: Optional[dict] = None
    enc2d_upcast_level: Optional[int] = 3
    # parity fields from the reference constructor (2D encoder runs outside
    # the jitted step; see Concerto's module docstring)
    image_weight_name: str = ""
    image_weight_path: str = ""
    embedding_channels: int = 0
    backbone_out_channels: int = 0
    patch_size: int = 14
    student_pretrained: bool = False
    student_pretrained_path: Optional[str] = None
    teacher_pretrained_path: Optional[str] = None
    enc2d_head_in_channels: int = 384
    enc2d_head_hidden_channels: int = 4096
    enc2d_head_embed_channels: int = 256
    enc2d_head_num_prototypes: int = 384
    enc2d_loss_weight: float = 2 / 10
    mask_loss_weight: float = 2 / 10
    roll_mask_loss_weight: float = 2 / 10
    unmask_loss_weight: float = 4 / 10

    @property
    def ema_pairs(self):
        pairs = {
            "teacher_mask_head": "mask_head",
            "teacher_unmask_head": "unmask_head",
        }
        if self.sonata_model_type == "online":
            pairs["teacher_backbone"] = "backbone_module"
        else:
            # offline: frozen Sonata-loaded teacher — excluded from the
            # optimizer, never EMA-updated or init-copied
            pairs["teacher_backbone"] = None
        return pairs

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        teacher_cfg = dict(self.backbone)
        if self.teacher_custom:
            # teacher-only overrides (drop_path=0 etc., reference `:204-207`)
            teacher_cfg.update(dict(self.teacher_custom))
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
