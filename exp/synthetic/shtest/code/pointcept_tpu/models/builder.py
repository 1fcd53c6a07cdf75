"""Model registries (parity: reference `pointcept/models/builder.py:11-17`)."""

from pointcept_tpu.utils.registry import Registry

MODELS = Registry("models")
MODULES = Registry("modules")


def build_model(cfg):
    """Build models from dict(type=..., **kwargs)."""
    return MODELS.build(cfg)
