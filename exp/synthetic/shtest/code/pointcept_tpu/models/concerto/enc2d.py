"""Host-side frozen image encoders for Concerto.

Reference: `concerto_v1m1_base.py` `load_enc2d:284` / `ENC2D_forward:309` runs
the frozen HF encoder inside the training forward. On TPU the encoder is
frozen, so its outputs are DATA: run it on host (torch CPU via HF transformers)
per batch and feed `feature2d` arrays into the jitted train step.
"""

from __future__ import annotations

import numpy as np


class TorchImageEncoder:
    """Frozen HF vision encoder -> patch features [B, patch_h*patch_w, C].

    Supports the reference's three families: RADIO (tuple output), SigLIPv2
    (`vision_model`), DINOv2-style (`last_hidden_state` with leading cls/reg
    tokens). Requires local weights (`model_weight` path); no network access.
    """

    def __init__(self, model_name: str, model_weight: str, patch_h: int, patch_w: int):
        import torch
        from transformers import AutoModel

        self.torch = torch
        self.model_name = model_name
        self.patch_h = patch_h
        self.patch_w = patch_w
        self.model = AutoModel.from_pretrained(model_weight, trust_remote_code=True).eval()
        for p in self.model.parameters():
            p.requires_grad_(False)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self.torch
        x = torch.from_numpy(np.asarray(images, np.float32))
        with torch.no_grad():
            if "radio" in self.model_name:
                _summary, features = self.model(x)
                features = features.reshape(-1, self.patch_h * self.patch_w, features.shape[-1])
            elif hasattr(self.model, "vision_model"):
                features = self.model.vision_model(x).last_hidden_state
            else:
                out = self.model(x).last_hidden_state
                features = out[:, -self.patch_h * self.patch_w :, :]
        return features.cpu().numpy()
