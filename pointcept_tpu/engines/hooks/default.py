"""Hook base + generic model-event routing (parity: reference
`pointcept/engines/hooks/default.py:13,40`)."""

from __future__ import annotations

from pointcept_tpu.engines.hooks.builder import HOOKS


class HookBase:
    """Base hook with before/after train/epoch/step events; `self.trainer` is
    injected by `TrainerBase.register_hooks`."""

    trainer = None

    def before_train(self):
        pass

    def before_epoch(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass

    def after_epoch(self):
        pass

    def after_train(self):
        pass


@HOOKS.register_module()
class ModelHook(HookBase):
    """Routes trainer hook events into the model (reference `ModelHook`,
    `engines/hooks/default.py:40`, where SSL `PointModel`s schedule their own
    hyperparameters).

    Functional JAX models cannot mutate parameters from hooks; instead a model
    may define `hook_<event>(trainer)` methods (before_train / before_epoch /
    before_step / after_step / after_epoch / after_train) that typically
    publish per-step values into ``trainer.comm_info["model_hyper"]`` — the
    train step feeds them in as traced scalars (the SonataHook pattern is the
    specialized version of this for Sonata/Concerto/Utonia).
    """

    def _route(self, event):
        fn = getattr(self.trainer.model, f"hook_{event}", None)
        if callable(fn):
            fn(self.trainer)

    def before_train(self):
        self._route("before_train")

    def before_epoch(self):
        self._route("before_epoch")

    def before_step(self):
        self._route("before_step")

    def after_step(self):
        self._route("after_step")

    def after_epoch(self):
        self._route("after_epoch")

    def after_train(self):
        self._route("after_train")
