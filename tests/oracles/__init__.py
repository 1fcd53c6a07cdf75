"""Reference-code oracle: execute the UNMODIFIED reference model sources
(/root/reference/pointcept) on CPU as a numeric parity oracle.

The reference depends on CUDA-era packages absent here (spconv, torch_scatter,
timm, addict). `fake_deps` provides pure-torch CPU implementations of exactly
the API surface the reference models touch; `load_reference_module` injects
them into sys.modules and imports reference module files directly (bypassing
package __init__ chains that would pull every model family's native deps).

This lets tests assert END-TO-END logit parity: reference torch model with
random weights -> convert_state_dict -> our JAX model -> compare outputs.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _ensure_stub_package(name: str, path: str) -> types.ModuleType:
    """Register `name` as a package whose submodules load from `path`,
    WITHOUT executing the real package __init__ (which imports every model
    family and their native deps)."""
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def install_fake_deps() -> None:
    from . import fake_deps

    fake_deps.install()


def load_reference_module(dotted: str):
    """Import a reference module file, e.g.
    'pointcept.models.point_transformer_v3.point_transformer_v3m1_base'."""
    install_fake_deps()
    r = REFERENCE_ROOT
    _ensure_stub_package("pointcept", f"{r}/pointcept")
    _ensure_stub_package("pointcept.utils", f"{r}/pointcept/utils")
    _ensure_stub_package("pointcept.models", f"{r}/pointcept/models")
    _ensure_stub_package("pointcept.models.utils", f"{r}/pointcept/models/utils")
    _ensure_stub_package(
        "pointcept.models.utils.serialization", f"{r}/pointcept/models/utils/serialization"
    )
    _ensure_stub_package(
        "pointcept.models.point_transformer_v3", f"{r}/pointcept/models/point_transformer_v3"
    )
    _ensure_stub_package(
        "pointcept.models.point_transformer_v2", f"{r}/pointcept/models/point_transformer_v2"
    )
    _ensure_stub_package("pointcept.models.sparse_unet", f"{r}/pointcept/models/sparse_unet")

    # pointcept.models.utils re-exports from .misc/.checkpoint/.serialization;
    # load the real files into the stub package namespace
    utils_pkg = sys.modules["pointcept.models.utils"]
    for sub in ("misc", "checkpoint"):
        m = importlib.import_module(f"pointcept.models.utils.{sub}")
        for k in dir(m):
            if not k.startswith("_"):
                setattr(utils_pkg, k, getattr(m, k))
    ser_pkg = importlib.import_module("pointcept.models.utils.serialization.default")
    ser_ns = sys.modules["pointcept.models.utils.serialization"]
    for k in ("encode", "decode"):
        setattr(ser_ns, k, getattr(ser_pkg, k))

    # pointcept.engines.hooks.HookBase: modules.py only subclasses it
    if "pointcept.engines" not in sys.modules:
        eng = types.ModuleType("pointcept.engines")
        hooks = types.ModuleType("pointcept.engines.hooks")

        class HookBase:  # trivial stand-in; reference class is behavior-free
            pass

        hooks.HookBase = HookBase
        eng.hooks = hooks
        sys.modules["pointcept.engines"] = eng
        sys.modules["pointcept.engines.hooks"] = hooks

    # pointcept.models.point_prompt_training: PTv3 imports PDNorm from the
    # package; load only prompt_driven_normalization (the __init__ would pull
    # CLIP). Must be registered BEFORE the model module import.
    if "pointcept.models.point_prompt_training" not in sys.modules:
        ppt = types.ModuleType("pointcept.models.point_prompt_training")
        ppt.__path__ = [f"{r}/pointcept/models/point_prompt_training"]
        ppt.__package__ = "pointcept.models.point_prompt_training"
        sys.modules["pointcept.models.point_prompt_training"] = ppt
        pdn = importlib.import_module(
            "pointcept.models.point_prompt_training.prompt_driven_normalization"
        )
        ppt.PDNorm = pdn.PDNorm

    return importlib.import_module(dotted)
