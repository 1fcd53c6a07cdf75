"""Utonia — "one encoder for all point clouds", TPU-native.

Reference: `pointcept/models/utonia/utonia_v1m1_base.py:85-875`. Structurally
Concerto's loss suite (masked / rolled / unmasked self-distillation + enc2d
cosine alignment) with the differences:
- mask sizes are expressed in GRID units (mask_size_start=5, base=20) and
  multiplied by the voxel grid size (`generate_mask:460` takes grid_size);
- the backbone is the Utonia PTv3 variant (ViT-ified PT-v3m3; here PT-v3m2's
  linear-embedding/LayerScale path serves as the TPU equivalent until m3 lands).
The staged multi-domain pretraining schedule lives in configs/hooks (SonataHook
drives mask/temp/momentum schedules), not in the model.
"""

from __future__ import annotations

from pointcept_tpu.models.builder import MODELS
from pointcept_tpu.models.concerto.concerto import Concerto


@MODELS.register_module("Utonia-v1m1")
class Utonia(Concerto):
    mask_size_start: float = 5.0
    mask_size_base: float = 20.0
    mask_size_scale: float = 0.02  # grid units -> meters (set to backbone grid size)

    ema_pairs = dict(Concerto.ema_pairs)
