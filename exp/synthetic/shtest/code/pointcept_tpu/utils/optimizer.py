"""Optimizer builder on optax with keyword-matched param groups.

Parity: reference `pointcept/utils/optimizer.py:14-63` — `param_dicts` entries
like ``dict(keyword="block", lr=0.0006)`` route params whose flattened path
contains the keyword into a group with its own lr (PTv3's "block lr x 0.1").
Group lr is realized as a per-leaf multiplier applied after the base update, so
one shared schedule drives every group (exactly torch's per-group scaling for
OneCycle max_lr lists).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import optax

from pointcept_tpu.utils.logger import get_root_logger
from pointcept_tpu.utils.registry import Registry

OPTIMIZERS = Registry("optimizers")


@OPTIMIZERS.register_module(name="SGD")
def sgd(learning_rate, momentum=0.9, weight_decay=0.0, nesterov=False, dampening=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


@OPTIMIZERS.register_module(name="Adam")
def adam(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


@OPTIMIZERS.register_module(name="Muon_KIMI")
def muon_kimi(learning_rate, momentum=0.95, nesterov=True, ns_steps=5, weight_decay=0.0, adamw_lr_ratio=1.0, betas=(0.9, 0.999), eps=1e-8):
    from pointcept_tpu.utils.muon import muon

    return muon(learning_rate, momentum, nesterov, ns_steps, weight_decay, adamw_lr_ratio, betas, eps)


@OPTIMIZERS.register_module(name="AdamW")
def adamw(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01):
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _group_multiplier_transform(params, param_dicts, base_lr):
    """Per-leaf lr multipliers as a post-update scale, via path keyword match."""
    logger = get_root_logger()
    flat = jax.tree_util.tree_leaves_with_path(params)

    def leaf_multiplier(path):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for pd in param_dicts:
            if pd["keyword"] in path_str:
                return float(pd.get("lr", base_lr)) / float(base_lr)
        return 1.0

    groups = {}
    for path, _ in flat:
        m = leaf_multiplier(path)
        groups.setdefault(m, []).append("/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path))
    for m, names in sorted(groups.items()):
        logger.info(f"Param group x{m}: {len(names)} tensors")

    mult_tree = jax.tree_util.tree_map_with_path(lambda path, _: leaf_multiplier(path), params)

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, m: u * m, updates, mult_tree), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def build_optimizer(cfg, params, schedule: Callable, param_dicts: Optional[Sequence[dict]] = None):
    """Build the optax optimizer for a param pytree.

    `schedule(step) -> lr` is the absolute base-group schedule (already includes
    the config base lr); `param_dicts` keyword groups scale it per leaf.
    """
    cfg = dict(cfg)
    otype = cfg.pop("type")
    base_lr = cfg.pop("lr")
    cfg.pop("params", None)
    trainable_keywords = cfg.pop("trainable_keywords", None)
    tx = OPTIMIZERS.build(dict(type=otype, learning_rate=schedule, **cfg))
    if param_dicts:
        param_dicts = [dict(pd) for pd in param_dicts]
        tx = optax.chain(tx, _group_multiplier_transform(params, param_dicts, base_lr))
    if trainable_keywords:
        # freeze everything except params whose path contains a keyword
        # (LoRA / linear-probe fine-tuning, reference `models/default.py:99`)
        kws = tuple(trainable_keywords)

        def mask_fn(tree):
            def leaf_mask(path, _):
                s = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
                return any(k in s for k in kws)

            return jax.tree_util.tree_map_with_path(leaf_mask, tree)

        tx = optax.masked(tx, mask_fn)
    return tx
