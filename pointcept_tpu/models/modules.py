"""Shared NN building blocks: masked batch norm, layer norm, MLP, DropPath.

The reference relies on torch BatchNorm1d(momentum=0.01, eps=1e-3) over ragged
point batches and timm's DropPath (`point_transformer_v3m1_base.py:581,316`).
Here BatchNorm is mask-aware (padding points are excluded from batch statistics)
and follows torch semantics (running = (1-m)*running + m*batch; biased variance
for normalization, unbiased for the running update) so converted checkpoints
match numerically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# Global SyncBN default: the trainer sets this to the mesh axis name when
# cfg.sync_bn is enabled (reference convert_sync_batchnorm, train.py:257);
# individual MaskedBatchNorm instances can still override via sync_axis.
_DEFAULT_BN_SYNC_AXIS = [None]


def set_default_bn_sync_axis(axis):
    _DEFAULT_BN_SYNC_AXIS[0] = axis


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid points only (torch BatchNorm1d semantics)."""

    momentum: float = 0.01  # torch-style: new = (1-m)*old + m*batch
    eps: float = 1e-3
    affine: bool = True
    sync_axis: Optional[str] = None  # mesh axis name for cross-device stats (SyncBN)

    @property
    def _sync_axis(self):
        return self.sync_axis if self.sync_axis is not None else _DEFAULT_BN_SYNC_AXIS[0]

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray], train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                mf = jnp.ones((x.shape[0], 1), jnp.float32)
            else:
                mf = mask.astype(jnp.float32)[:, None]
            cnt = jnp.sum(mf)
            s1 = jnp.sum(xf * mf, axis=0)
            if self._sync_axis is not None:
                cnt = jax.lax.psum(cnt, self._sync_axis)
                s1 = jax.lax.psum(s1, self._sync_axis)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            # two-pass (shifted) variance: E[x^2]-E[x]^2 cancels catastrophically
            # in f32 when |mean| >> std (e.g. unnormalized stem conv outputs)
            sq = jnp.sum(jnp.square(xf - mean) * mf, axis=0)
            if self._sync_axis is not None:
                sq = jax.lax.psum(sq, self._sync_axis)
            var = jnp.maximum(sq / cnt, 0.0)  # biased
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            # keep the activation dtype (bf16 AMP stream): f32 params would
            # silently promote the whole residual stream back to f32
            y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """torch-compatible LayerNorm (eps 1e-5, affine)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class DropPath(nn.Module):
    """Per-row stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class PDNorm(nn.Module):
    """Prompt-Driven Normalization (reference
    `point_prompt_training/prompt_driven_normalization.py:8`): per-condition
    norm layers (decoupled) + optional adaptive scale-shift from a context
    embedding. `condition` is static (one dataset per batch), so the norm is
    selected at trace time; inactive condition norms are still constructed (so
    init/checkpoints cover all datasets) but their outputs are dead code.
    """

    conditions: tuple = ("ScanNet", "S3DIS", "Structured3D")
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256
    norm_type: str = "bn"  # "bn" (MaskedBatchNorm) or "ln" (LayerNorm)
    bn_momentum: float = 0.01
    bn_eps: float = 1e-3

    def _make_norm(self, name):
        if self.norm_type == "bn":
            return MaskedBatchNorm(momentum=self.bn_momentum, eps=self.bn_eps, name=name)
        return LayerNorm(name=name)

    def _apply_norm(self, norm, x, mask, train):
        if self.norm_type == "bn":
            return norm(x, mask, train)
        return norm(x)

    @nn.compact
    def __call__(self, x, mask, train: bool, condition: str, context=None):
        if self.decouple:
            assert condition in self.conditions, f"unknown condition {condition}"
            idx = self.conditions.index(condition)
            ys = [
                self._apply_norm(self._make_norm(f"norm{i}"), x, mask, train if i == idx else False)
                for i in range(len(self.conditions))
            ]
            y = ys[idx]
        else:
            y = self._apply_norm(self._make_norm("norm"), x, mask, train)
        if self.adaptive:
            assert context is not None, "adaptive PDNorm needs a context embedding"
            c = x.shape[-1]
            mod = nn.Dense(2 * c, name="modulation")(nn.silu(context))
            shift, scale = jnp.split(mod, 2, axis=-1)
            y = y * (1.0 + scale) + shift
        return y.astype(x.dtype)


class MLP(nn.Module):
    """fc1 -> act -> drop -> fc2 -> drop (reference `point_transformer_v3m1_base.py:225`)."""

    hidden_channels: int
    out_channels: int
    act: Callable = nn.gelu
    drop: float = 0.0
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Dense(self.hidden_channels, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x
