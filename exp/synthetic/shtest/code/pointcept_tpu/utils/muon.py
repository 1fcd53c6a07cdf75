"""Muon optimizer (Newton-Schulz orthogonalized momentum) for optax.

Parity: reference `pointcept/utils/muon_kimi.py:38` (MuonKIMI): 2-D weight
matrices take orthogonalized momentum updates (5-step Newton-Schulz, `:8`),
everything else falls back to AdamW. The Moonlight/KIMI variant scales updates
by sqrt(max(m, n)) * lr_adjust.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def newton_schulz(g: jnp.ndarray, steps: int = 5, eps: float = 1e-7) -> jnp.ndarray:
    """Quintic Newton-Schulz iteration approximating UV^T of the SVD of g."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.bfloat16)
    transposed = g.shape[0] > g.shape[1]
    if transposed:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)
    for _ in range(steps):
        aa = x @ x.T
        bb = b * aa + c * (aa @ aa)
        x = a * x + bb @ x
    if transposed:
        x = x.T
    return x.astype(g.dtype)


class MuonState(NamedTuple):
    momentum: optax.Updates


def scale_by_muon(momentum: float = 0.95, nesterov: bool = True, ns_steps: int = 5):
    """Orthogonalize 2-D updates; pass non-2-D leaves through unchanged."""

    def init_fn(params):
        return MuonState(momentum=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        new_m = jax.tree_util.tree_map(lambda m, g: momentum * m + g, state.momentum, updates)

        def orth(m, g):
            u = momentum * m + g if nesterov else m
            if u.ndim == 2 and min(u.shape) > 1:
                o = newton_schulz(u, ns_steps)
                # Moonlight scaling: match AdamW RMS ~0.2
                return o * (0.2 * jnp.sqrt(jnp.maximum(u.shape[0], u.shape[1])))
            return u

        return jax.tree_util.tree_map(orth, new_m, updates), MuonState(momentum=new_m)

    return optax.GradientTransformation(init_fn, update_fn)


def muon(
    learning_rate,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    weight_decay: float = 0.0,
    adamw_lr_ratio: float = 1.0,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
):
    """Muon for 2-D weights + AdamW for the rest (reference MuonKIMI behavior)."""

    def is_matrix(p):
        return p.ndim == 2 and min(p.shape) > 1

    def matrix_mask(params):
        return jax.tree_util.tree_map(is_matrix, params)

    def other_mask(params):
        return jax.tree_util.tree_map(lambda p: not is_matrix(p), params)

    muon_branch = optax.chain(
        scale_by_muon(momentum, nesterov, ns_steps),
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )
    adamw_branch = optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
        optax.scale(adamw_lr_ratio),
    )
    return optax.chain(
        optax.masked(muon_branch, matrix_mask),
        optax.masked(adamw_branch, other_mask),
    )
