"""Lovász-softmax loss (JAX, static-shape with ignore masking).

Parity: reference `pointcept/models/losses/lovasz.py:211` (multiclass softmax
variant, classes="present"). The reference filters ignored points dynamically;
with static shapes ignored points are instead sorted to the tail (error = -inf
under descending sort) and excluded from the Jaccard cumsums by masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _lovasz_softmax_flat(prob: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray, class_seen=None):
    """prob [N, C] softmax probs; target [N] labels (garbage where ~valid)."""
    n, c = prob.shape
    vf = valid.astype(jnp.float32)
    losses = []
    present = []
    for cls in range(c):
        fg = ((target == cls) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - prob[:, cls])
        # ignored points: error -1 sorts last under descending order
        errors = jnp.where(valid, errors, -1.0)
        order = jnp.argsort(-errors)
        errors_s = jnp.where(errors[order] >= 0, errors[order], 0.0)
        fg_s = fg[order]
        valid_s = vf[order]
        gts = jnp.sum(fg_s)
        intersection = gts - jnp.cumsum(fg_s)
        union = gts + jnp.cumsum((1.0 - fg_s) * valid_s)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        losses.append(jnp.sum(errors_s * grad))
        present.append((gts > 0).astype(jnp.float32))
    losses = jnp.stack(losses)
    present = jnp.stack(present)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


@LOSSES.register_module()
class LovaszLoss:
    def __init__(self, mode: str = "multiclass", class_seen=None, per_image: bool = False, loss_weight: float = 1.0, ignore_index: int = -1):
        assert mode in ("multiclass", "binary", "multilabel")
        self.mode = mode
        self.per_image = per_image
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.class_seen = class_seen

    def __call__(self, pred, target):
        valid = target != self.ignore_index
        if self.mode == "multiclass":
            prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
            loss = _lovasz_softmax_flat(prob, jnp.where(valid, target, 0), valid, self.class_seen)
        elif self.mode == "binary":
            # hinge lovasz on logits [N]
            signs = 2.0 * jnp.where(valid, target, 0).astype(jnp.float32) - 1.0
            errors = 1.0 - pred.astype(jnp.float32).reshape(-1) * signs
            errors = jnp.where(valid, errors, -jnp.inf)
            order = jnp.argsort(-errors)
            errors_s = jnp.where(jnp.isfinite(errors[order]), errors[order], 0.0)
            fg_s = jnp.where(valid, target, 0).astype(jnp.float32)[order]
            valid_s = valid.astype(jnp.float32)[order]
            gts = jnp.sum(fg_s)
            intersection = gts - jnp.cumsum(fg_s)
            union = gts + jnp.cumsum((1.0 - fg_s) * valid_s)
            jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
            grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
            loss = jnp.sum(jax.nn.relu(errors_s) * grad)
        else:
            raise NotImplementedError(self.mode)
        return loss * self.loss_weight
