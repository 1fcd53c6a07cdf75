"""Checkpoint save/load for TrainState pytrees (orbax).

Replaces torch .pth state dicts (reference `engines/hooks/misc.py:169-276`).
Layout: <dir>/state (orbax pytree) + <dir>/meta.json (epoch, best metric).
Weight-only loading supports keyword remapping for fine-tuning.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state, epoch: int = 0, best_metric_value: float = 0.0):
    ckpt_dir = os.path.abspath(ckpt_dir)
    cp = _checkpointer()
    state_np = jax.tree_util.tree_map(np.asarray, state)
    tmp = ckpt_dir + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    cp.save(tmp, state_np)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"epoch": epoch, "best_metric_value": float(best_metric_value)}, f)
    if os.path.exists(ckpt_dir):
        import shutil

        shutil.rmtree(ckpt_dir)
    os.rename(tmp, ckpt_dir)


def restore_state(ckpt_dir: str, target_state):
    cp = _checkpointer()
    state_np = jax.tree_util.tree_map(np.asarray, target_state)
    return cp.restore(os.path.abspath(ckpt_dir), item=state_np)


def restore_weights(ckpt_dir: str, state):
    """Weight-only restore (params + batch_stats), tolerant of opt_state/shape
    differences between the saved state and the target (e.g. a tester state with
    no optimizer)."""
    cp = _checkpointer()
    raw = cp.restore(os.path.abspath(ckpt_dir))

    def merge(dst, src):
        if isinstance(dst, dict):
            return {k: merge(v, src.get(k)) if isinstance(src, dict) else v for k, v in dst.items()}
        if src is not None and np.asarray(src).shape == np.asarray(dst).shape:
            return np.asarray(src)
        return dst

    params = merge(jax.tree_util.tree_map(np.asarray, state.params), raw.get("params", {}))
    bs = merge(jax.tree_util.tree_map(np.asarray, state.batch_stats), raw.get("batch_stats", {}))
    return state.replace(params=params, batch_stats=bs)


def load_checkpoint(ckpt_dir: str, trainer) -> dict:
    """Full resume: restore TrainState + meta into the trainer."""
    trainer.state = restore_state(ckpt_dir, trainer.state)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    trainer.logger.info(f"Loaded checkpoint {ckpt_dir} (epoch {meta.get('epoch')})")
    return meta


def load_weights(ckpt_dir: str, trainer, keywords="", replacement="", strict=False):
    """Weight-only load (params + batch_stats), with key remap support.

    Parity: reference CheckpointLoader keyword rename (`hooks/misc.py:249-258`).
    """
    cp = _checkpointer()
    restored = cp.restore(os.path.abspath(ckpt_dir))
    src_params = restored.get("params", restored)
    src_bs = restored.get("batch_stats", {})

    def remap(tree):
        if not keywords:
            return tree
        flat = {}

        def walk(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k.replace(keywords, replacement),))
            else:
                flat[path] = node

        walk(tree, ())
        out = {}
        for path, v in flat.items():
            d = out
            for k in path[:-1]:
                d = d.setdefault(k, {})
            d[path[-1]] = v
        return out

    src_params = remap(src_params)
    src_bs = remap(src_bs)

    def merge(dst, src, prefix=""):
        """Copy matching leaves from src into dst; report mismatches."""
        matched, missed = 0, []
        out = {}
        for k, v in dst.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                sub_src = src.get(k, {}) if isinstance(src, dict) else {}
                out[k], m, ms = merge(v, sub_src, key)
                matched += m
                missed += ms
            else:
                s = src.get(k) if isinstance(src, dict) else None
                if s is not None and np.asarray(s).shape == np.asarray(v).shape:
                    out[k] = np.asarray(s)
                    matched += 1
                else:
                    out[k] = v
                    missed.append(key)
        return out, matched, missed

    params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    bs = jax.tree_util.tree_map(np.asarray, trainer.state.batch_stats)
    new_params, m1, miss1 = merge(params, src_params)
    new_bs, m2, miss2 = merge(bs, src_bs)
    if strict and (miss1 or miss2):
        raise RuntimeError(f"Missing keys in checkpoint: {miss1 + miss2}")
    trainer.logger.info(f"Loaded weights: {m1} params, {m2} batch stats; missing {len(miss1) + len(miss2)}")
    trainer.state = trainer.state.replace(params=new_params, batch_stats=new_bs)
