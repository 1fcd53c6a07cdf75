"""Model registries (parity: reference `pointcept/models/builder.py:11-17`)."""

from pointcept_tpu.utils.registry import Registry

MODELS = Registry("models")
MODULES = Registry("modules")


def build_model(cfg):
    """Build models from dict(type=..., **kwargs)."""
    return MODELS.build(cfg)


def apply_amp_policy(model_cfg: dict, enable_amp: bool) -> dict:
    """Fold the engine-level `enable_amp` flag (reference train.py:203
    torch.autocast) into backbones that support a bf16 activation stream.

    Returns a (shallow-copied) model cfg with `amp=True` injected into the
    backbone when the registered backbone class declares an `amp` field and
    the cfg doesn't already pin it. No-op otherwise — models without an amp
    path keep their per-model dtype policy.
    """
    model_cfg = dict(model_cfg)
    bb = model_cfg.get("backbone")
    if not enable_amp or not isinstance(bb, dict) or "type" not in dict(bb):
        return model_cfg
    bb = dict(bb)
    cls = MODELS.get(bb["type"])
    fields = getattr(cls, "__dataclass_fields__", {})
    if "amp" in fields and "amp" not in bb:
        bb["amp"] = True
        model_cfg["backbone"] = bb
    return model_cfg
