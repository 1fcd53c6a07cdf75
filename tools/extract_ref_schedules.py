"""Extract training schedules from the reference configs for corpus parity.

Dev tool (needs the reference tree): for every config file that
`tools/gen_config_corpus.py` plans to emit AND that exists under the reference
`configs/` with the same relative path, resolve the reference config (through
this repo's own `Config.fromfile`, which handles `_base_` chains) and record
its training schedule: epoch / eval_epoch / optimizer / scheduler /
param_dicts. Output: `tools/ref_schedules.json`, committed, consumed by the
generator so the emitted probe configs carry the reference's actual schedules
instead of a uniform recipe (ADVICE r2 #1).

Usage: python tools/extract_ref_schedules.py [REFERENCE_ROOT]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plain(x):
    """addict/Config containers -> plain python for json round-trip."""
    if isinstance(x, dict):
        return {k: plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [plain(v) for v in x]
    return x


def main():
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    # some reference configs import class-name constants from the reference
    # package itself (e.g. scannet200_constants); make that importable, and
    # stub heavy deps its package __init__ pulls in
    sys.path.insert(0, ref_root)
    import types

    class _Stub(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Stub(f"{self.__name__}.{name}")

        def __call__(self, *a, **k):
            return None

    for mod in (
        "torchvision",
        "torchvision.transforms",
        "torchvision.transforms.transforms",
        "torch_cluster",
        "open3d",
        "wandb",
        "pointops",
    ):
        sys.modules.setdefault(mod, _Stub(mod))
    # the torch-only shims used by the oracle tests cover the rest
    sys.path.insert(0, os.path.join(REPO, "tests", "oracles"))
    import fake_deps

    fake_deps.install()
    # config loading only needs these importable, not functional
    import torch_scatter

    for name in ("scatter_min", "scatter_max", "scatter_mean", "scatter_add"):
        if not hasattr(torch_scatter, name):
            setattr(torch_scatter, name, lambda *a, **k: None)
    # importlib probes (find_spec) require stubs to carry a ModuleSpec
    import importlib.machinery

    for name, mod in list(sys.modules.items()):
        if mod is not None and getattr(mod, "__spec__", "missing") is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)

    from pointcept_tpu.utils.config import Config

    # every repo config whose relpath also exists in the reference
    rels = []
    for dirpath, _, files in os.walk(os.path.join(REPO, "configs")):
        for fn in files:
            if fn.endswith(".py"):
                rels.append(os.path.relpath(os.path.join(dirpath, fn), REPO))

    out, skipped = {}, []
    for rel in sorted(rels):
        ref_path = os.path.join(ref_root, rel)
        if not os.path.exists(ref_path):
            continue
        try:
            cfg = Config.fromfile(ref_path)
        except Exception as e:  # noqa: BLE001 — record and move on
            skipped.append((rel, repr(e)))
            continue
        entry = {}
        for key in ("epoch", "eval_epoch", "optimizer", "scheduler", "param_dicts"):
            if cfg.get(key, None) is not None or key == "param_dicts" and key in cfg:
                entry[key] = plain(cfg.get(key, None))
        if entry:
            out[rel] = entry
    dst = os.path.join(REPO, "tools", "ref_schedules.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} schedules to {dst}; {len(skipped)} skipped")
    for rel, err in skipped[:10]:
        print(f"  skipped {rel}: {err}")


if __name__ == "__main__":
    main()
