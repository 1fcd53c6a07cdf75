"""3D rotary position embedding (PointROPE) — pure jnp, fused into attention.

Reference: the CUDA `libs/pointrope` extension (`libs/pointrope/pointrope.cpp:13-40`)
and its torch fallback (`models/litept/litept_v1.py:66-125`): the head dim is
split into 3 subspaces and classic RoPE is applied per (x, y, z) integer grid
coordinate. Here it is a handful of elementwise ops that XLA fuses straight
into the attention matmuls — no custom kernel needed (backward = autodiff,
which equals the reference's negated-frequency trick).
"""

from __future__ import annotations

import jax.numpy as jnp


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rope1d(tokens, pos, base: float, f0: float):
    """tokens [..., K, D], pos [..., K] integer positions."""
    d = tokens.shape[-1]
    inv_freq = f0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = pos[..., None].astype(jnp.float32) * inv_freq  # [..., K, D/2]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)
    cos = jnp.cos(freqs).astype(tokens.dtype)
    sin = jnp.sin(freqs).astype(tokens.dtype)
    return tokens * cos + _rotate_half(tokens) * sin


def point_rope(tokens: jnp.ndarray, positions: jnp.ndarray, freq: float = 100.0, f0: float = 1.0):
    """Apply 3D RoPE.

    tokens: [..., H, K, D] with D % 3 == 0 (e.g. [num_patches, H, K, D]);
    positions: [..., K, 3] integer grid coordinates (broadcast over H).
    """
    d = tokens.shape[-1]
    assert d % 3 == 0, "head dim must be a multiple of 3 for PointROPE"
    x, y, z = jnp.split(tokens, 3, axis=-1)
    px = positions[..., None, :, 0]  # broadcast over heads
    py = positions[..., None, :, 1]
    pz = positions[..., None, :, 2]
    x = _rope1d(x, px, freq, f0)
    y = _rope1d(y, py, freq, f0)
    z = _rope1d(z, pz, freq, f0)
    return jnp.concatenate([x, y, z], axis=-1)
