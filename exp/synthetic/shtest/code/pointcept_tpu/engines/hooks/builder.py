"""HOOKS registry (parity: reference `pointcept/engines/hooks/builder.py:13`)."""

from pointcept_tpu.utils.registry import Registry

HOOKS = Registry("hooks")


def build_hooks(cfg):
    return [HOOKS.build(dict(h)) for h in cfg]
