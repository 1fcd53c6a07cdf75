"""Per-step LR schedules as pure functions (optax-compatible).

Parity: reference `pointcept/utils/scheduler.py` — MultiStepLR/:17,
MultiStepWithWarmupLR/:35, PolyLR/:71, ExpLR/:87, CosineAnnealingLR/:103,
OneCycleLR/:120 (torch semantics), CosineScheduler/:157 (plain value scheduler
for SSL hyperparameters). All are **per-step**; `total_steps` is injected by the
trainer (reference `engines/train.py:342`). Each registered class is a callable
``f(step) -> lr`` usable directly as an optax schedule.
"""

from __future__ import annotations

import math

import numpy as np

from pointcept_tpu.utils.registry import Registry

SCHEDULERS = Registry("schedulers")


def _as_scalar_max_lr(max_lr):
    """torch OneCycleLR takes per-group max_lr lists; group scaling is handled
    by optimizer multipliers, so the schedule itself uses the first entry."""
    if isinstance(max_lr, (list, tuple)):
        return float(max_lr[0])
    return float(max_lr)


@SCHEDULERS.register_module()
class MultiStepLR:
    def __init__(self, total_steps, milestones, gamma=0.1, base_lr=1.0):
        self.milestones = sorted(int(r * total_steps) for r in milestones)
        self.gamma = gamma
        self.base_lr = base_lr

    def __call__(self, step):
        import jax.numpy as jnp

        factor = 1.0
        lr = self.base_lr
        for m in self.milestones:
            lr = jnp.where(step >= m, lr * self.gamma, lr)
        return lr


@SCHEDULERS.register_module()
class MultiStepWithWarmupLR:
    def __init__(self, total_steps, milestones, gamma=0.1, warmup_rate=0.05, warmup_scale=1e-6, base_lr=1.0):
        self.total_steps = total_steps
        self.milestones = sorted(r * total_steps for r in milestones)
        self.gamma = gamma
        self.warmup_rate = warmup_rate
        self.warmup_scale = warmup_scale
        self.base_lr = base_lr

    def __call__(self, step):
        import jax.numpy as jnp

        s = step
        factor = 1.0
        for m in self.milestones:
            factor = jnp.where(s >= m, factor * self.gamma, factor)
        warm_end = self.warmup_rate * self.total_steps
        warm = 1 - (1 - s / warm_end) * (1 - self.warmup_scale)
        coeff = jnp.where(s <= warm_end, warm, 1.0)
        return self.base_lr * coeff * factor


@SCHEDULERS.register_module()
class PolyLR:
    def __init__(self, total_steps, power=0.9, base_lr=1.0):
        self.total_steps = total_steps
        self.power = power
        self.base_lr = base_lr

    def __call__(self, step):
        return self.base_lr * (1 - step / (self.total_steps + 1)) ** self.power


@SCHEDULERS.register_module()
class ExpLR:
    def __init__(self, total_steps, gamma=0.9, base_lr=1.0):
        self.total_steps = total_steps
        self.gamma = gamma
        self.base_lr = base_lr

    def __call__(self, step):
        return self.base_lr * self.gamma ** (step / self.total_steps)


@SCHEDULERS.register_module()
class CosineAnnealingLR:
    def __init__(self, total_steps, eta_min=0, base_lr=1.0):
        self.total_steps = total_steps
        self.eta_min = eta_min
        self.base_lr = base_lr

    def __call__(self, step):
        import jax.numpy as jnp

        return self.eta_min + (self.base_lr - self.eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * step / self.total_steps)
        )


@SCHEDULERS.register_module()
class OneCycleLR:
    """torch OneCycleLR (two-phase, cos anneal) as a pure schedule."""

    def __init__(
        self,
        total_steps,
        max_lr,
        pct_start=0.3,
        anneal_strategy="cos",
        cycle_momentum=True,  # accepted for parity; momentum cycling not applied
        base_momentum=0.85,
        max_momentum=0.95,
        div_factor=25.0,
        final_div_factor=1e4,
        three_phase=False,
        base_lr=None,  # ignored; max_lr defines the cycle
    ):
        assert not three_phase, "three_phase OneCycle not implemented"
        self.total_steps = total_steps
        self.max_lr = _as_scalar_max_lr(max_lr)
        self.initial_lr = self.max_lr / div_factor
        self.min_lr = self.initial_lr / final_div_factor
        self.pct_start = pct_start
        self.anneal = anneal_strategy

    def _interp(self, a, b, pct):
        import jax.numpy as jnp

        if self.anneal == "cos":
            return b + (a - b) / 2.0 * (1 + jnp.cos(jnp.pi * pct))
        return (b - a) * pct + a

    def __call__(self, step):
        import jax.numpy as jnp

        up_steps = float(self.pct_start * self.total_steps) - 1
        down_steps = float(self.total_steps - up_steps - 1)
        pct_up = jnp.clip(step / jnp.maximum(up_steps, 1), 0, 1)
        pct_down = jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1), 0, 1)
        lr_up = self._interp(self.initial_lr, self.max_lr, pct_up)
        lr_down = self._interp(self.max_lr, self.min_lr, pct_down)
        return jnp.where(step <= up_steps, lr_up, lr_down)


@SCHEDULERS.register_module()
class CosineScheduler:
    """Value scheduler for SSL hyperparams (reference `scheduler.py:157`)."""

    def __init__(self, base_value, final_value, total_steps, warmup_steps=0, start_warmup_value=0):
        warmup_schedule = np.array([])
        if warmup_steps > 0:
            warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_steps)
        iters = np.arange(total_steps - warmup_steps)
        schedule = final_value + 0.5 * (base_value - final_value) * (
            1 + np.cos(np.pi * iters / len(iters))
        )
        self.schedule = np.concatenate((warmup_schedule, schedule))
        self.total_steps = total_steps
        self.iter = 0

    def __getitem__(self, it):
        return self.schedule[min(it, self.total_steps - 1)]

    def step(self):
        value = self[self.iter]
        self.iter += 1
        return value


def build_scheduler(cfg, total_steps):
    cfg = dict(cfg)
    cfg["total_steps"] = total_steps
    return SCHEDULERS.build(cfg)
