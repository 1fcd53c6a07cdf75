"""Classification/segmentation losses (JAX). Parity: reference
`pointcept/models/losses/misc.py:15,43,60,97,176`. All take (pred [N, C] logits,
target [N] int labels) and reduce to a scalar, ignoring ``ignore_index`` targets
(which is how padded points are excluded — collate sets their label to -1)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _one_hot(target, num_classes, ignore_index):
    valid = target != ignore_index
    t = jnp.where(valid, target, 0)
    return jax.nn.one_hot(t, num_classes, dtype=jnp.float32), valid


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(
        self,
        weight: Optional[Sequence[float]] = None,
        size_average=None,
        reduce=None,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        self.weight = None if weight is None else jnp.asarray(weight, jnp.float32)
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        n, c = pred.shape
        onehot, valid = _one_hot(target, c, self.ignore_index)
        if self.label_smoothing > 0:
            onehot = onehot * (1 - self.label_smoothing) + self.label_smoothing / c
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        ce = -jnp.sum(onehot * logp, axis=-1)
        w = valid.astype(jnp.float32)
        if self.weight is not None:
            w = w * self.weight[jnp.where(valid, target, 0)]
        if self.reduction == "mean":
            loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)
        elif self.reduction == "sum":
            loss = jnp.sum(ce * w)
        else:
            loss = ce * w
        return loss * self.loss_weight


@LOSSES.register_module()
class SmoothCELoss:
    """Reference `losses/misc.py:43`: CE with label smoothing via clipped targets."""

    def __init__(self, smoothing_ratio: float = 0.1, loss_weight: float = 1.0, ignore_index: int = -1):
        self.eps = smoothing_ratio
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        n, c = pred.shape
        onehot, valid = _one_hot(target, c, self.ignore_index)
        onehot = onehot * (1 - self.eps) + (1 - onehot) * self.eps / (c - 1)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        loss = -jnp.sum(onehot * logp, axis=-1)
        w = valid.astype(jnp.float32)
        return self.loss_weight * jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-12)


@LOSSES.register_module()
class BinaryFocalLoss:
    """Reference `losses/misc.py:60`: focal loss on binary logits [N]."""

    def __init__(self, gamma=2.0, alpha=0.5, logits=True, reduce=True, loss_weight=1.0):
        assert 0 < alpha < 1
        self.gamma = gamma
        self.alpha = alpha
        self.logits = logits
        self.reduce = reduce
        self.loss_weight = loss_weight

    def __call__(self, pred, target):
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.logits:
            p = jax.nn.sigmoid(pred)
        else:
            p = pred
        pt = p * target + (1 - p) * (1 - target)
        at = self.alpha * target + (1 - self.alpha) * (1 - target)
        bce = -(target * jnp.log(jnp.clip(p, 1e-12)) + (1 - target) * jnp.log(jnp.clip(1 - p, 1e-12)))
        focal = at * (1 - pt) ** self.gamma * bce
        if self.reduce:
            focal = jnp.mean(focal)
        return focal * self.loss_weight


@LOSSES.register_module()
class FocalLoss:
    """Reference `losses/misc.py:97`: multiclass focal loss with ignore_index."""

    def __init__(self, gamma=2.0, alpha=0.5, reduction="mean", loss_weight=1.0, ignore_index=-1):
        assert reduction in ("mean", "sum")
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        n, c = pred.shape
        valid = target != self.ignore_index
        t = jnp.where(valid, target, 0)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        logpt = jnp.take_along_axis(logp, t[:, None], axis=1)[:, 0]
        pt = jnp.exp(logpt)
        alpha = jnp.full((c,), self.alpha, jnp.float32)
        at = alpha[t]
        loss = -at * (1 - pt) ** self.gamma * logpt
        w = valid.astype(jnp.float32)
        if self.reduction == "mean":
            out = jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-12)
        else:
            out = jnp.sum(loss * w)
        return out * self.loss_weight


@LOSSES.register_module()
class DiceLoss:
    """Reference `losses/misc.py:176`: soft dice over classes with smoothing."""

    def __init__(self, smooth=1.0, exponent=2.0, loss_weight=1.0, ignore_index=-1):
        self.smooth = smooth
        self.exponent = exponent
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        n, c = pred.shape
        prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        onehot, valid = _one_hot(target, c, self.ignore_index)
        w = valid.astype(jnp.float32)[:, None]
        prob = prob * w
        onehot = onehot * w
        total = 0.0
        for i in range(c):
            num = 2 * jnp.sum(prob[:, i] * onehot[:, i]) + self.smooth
            den = jnp.sum(prob[:, i] ** self.exponent + onehot[:, i] ** self.exponent) + self.smooth
            total = total + (1 - num / den)
        return self.loss_weight * total / c
