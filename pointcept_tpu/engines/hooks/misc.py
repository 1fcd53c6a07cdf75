"""Core hooks: timing, logging, checkpointing.

Parity: reference `pointcept/engines/hooks/misc.py` — IterationTimer/:34,
InformationWriter/:81, CheckpointSaver/:169, CheckpointLoader/:230,
PreciseEvaluator/:278, GarbageHandler/:528. Checkpoints are orbax PyTree
saves of {params, batch_stats, opt_state, step} + scalar metadata, replacing
torch .pth state dicts (atomicity comes from orbax's tmp+rename protocol).
"""

from __future__ import annotations

import gc
import os
import shutil
import sys
import time
from collections import OrderedDict

import numpy as np

from pointcept_tpu.engines.hooks.builder import HOOKS
from pointcept_tpu.engines.hooks.default import HookBase
from pointcept_tpu.utils import comm
from pointcept_tpu.utils.timer import Timer


@HOOKS.register_module()
class IterationTimer(HookBase):
    def __init__(self, warmup_iter=2):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._iter_timer = Timer()
        self._remain_iter = 0

    def before_train(self):
        self._start_time = time.perf_counter()
        self._remain_iter = self.trainer.max_epoch * len(self.trainer.train_loader)

    def before_epoch(self):
        self._iter_timer.reset()

    def before_step(self):
        data_time = self._iter_timer.seconds()
        self.trainer.storage.put_scalar("data_time", data_time)

    def after_step(self):
        batch_time = self._iter_timer.seconds()
        self._iter_timer.reset()
        self.trainer.storage.put_scalar("batch_time", batch_time)
        self._remain_iter -= 1
        remain_time = self._remain_iter * self.trainer.storage.history("batch_time").avg(50)
        t_m, t_s = divmod(remain_time, 60)
        t_h, t_m = divmod(t_m, 60)
        remain_time = "{:02d}:{:02d}:{:02d}".format(int(t_h), int(t_m), int(t_s))
        if "iter_info" in self.trainer.comm_info:
            info = (
                "Data {data_time_val:.3f} ({data_time_avg:.3f}) "
                "Batch {batch_time_val:.3f} ({batch_time_avg:.3f}) "
                "Remain {remain_time} ".format(
                    data_time_val=self.trainer.storage.history("data_time").latest(),
                    data_time_avg=self.trainer.storage.history("data_time").avg(50),
                    batch_time_val=self.trainer.storage.history("batch_time").latest(),
                    batch_time_avg=self.trainer.storage.history("batch_time").avg(50),
                    remain_time=remain_time,
                )
            )
            self.trainer.comm_info["iter_info"] += info


@HOOKS.register_module()
class InformationWriter(HookBase):
    def __init__(self):
        self.curr_iter = 0
        self.model_output_keys = []

    def before_train(self):
        # rank-0 TensorBoard + optional wandb writers (reference
        # train.py:269-282). wandb is opt-in (cfg.enable_wandb) and degrades
        # to a no-op when the package or network is unavailable.
        self.trainer.writer = None
        self.trainer.wandb_run = None
        if not comm.is_main_process():
            return
        if self.trainer.cfg.get("enable_tensorboard", True):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.trainer.writer = SummaryWriter(self.trainer.cfg.save_path)
            except Exception:
                self.trainer.writer = None
        if self.trainer.cfg.get("enable_wandb", False):
            try:
                import wandb

                cfg = self.trainer.cfg
                self.trainer.wandb_run = wandb.init(
                    project=cfg.get("wandb_project", "pointcept_tpu"),
                    name=os.path.basename(cfg.save_path.rstrip("/")),
                    dir=cfg.save_path,
                    config=dict(cfg),
                    resume="allow",
                    id=cfg.get("wandb_id"),
                )
            except Exception as e:
                self.trainer.logger.warning(f"wandb disabled: {e}")
                self.trainer.wandb_run = None

    def before_step(self):
        self.curr_iter += 1
        info = "Train: [{epoch}/{max_epoch}][{iter}/{max_iter}] ".format(
            epoch=self.trainer.epoch + 1,
            max_epoch=self.trainer.max_epoch,
            iter=self.trainer.comm_info["iter"] + 1,
            max_iter=len(self.trainer.train_loader),
        )
        self.trainer.comm_info["iter_info"] = info

    def after_step(self):
        metrics = self.trainer.comm_info.get("metrics", {})
        info = ""
        for key, value in metrics.items():
            info += "{} {:.4f} ".format(key.capitalize(), float(value))
        lr = self.trainer.comm_info.get("lr", 0.0)
        info += "Lr: {:.5f}".format(lr)
        self.trainer.comm_info["iter_info"] += info
        self.trainer.logger.info(self.trainer.comm_info["iter_info"])
        self.trainer.comm_info["iter_info"] = ""
        if self.trainer.writer is not None:
            self.trainer.writer.add_scalar("lr", lr, self.curr_iter)
            for key, value in metrics.items():
                self.trainer.writer.add_scalar(f"train_batch/{key}", float(value), self.curr_iter)
        if getattr(self.trainer, "wandb_run", None) is not None:
            log = {"lr": lr}
            log.update({f"train_batch/{k}": float(v) for k, v in metrics.items()})
            self.trainer.wandb_run.log(log, step=self.curr_iter)
        self.trainer.storage.step()


@HOOKS.register_module()
class CheckpointSaver(HookBase):
    """Save model_last + best copy on metric improvement (reference `:169`)."""

    def __init__(self, save_freq=None):
        self.save_freq = save_freq

    def after_epoch(self):
        if not comm.is_main_process():
            return
        from pointcept_tpu.models.utils.checkpoint import save_checkpoint

        is_best = False
        current_metric_value = self.trainer.comm_info.get("current_metric_value", 0)
        current_metric_name = self.trainer.comm_info.get("current_metric_name", "n/a")
        if current_metric_value > self.trainer.best_metric_value:
            self.trainer.best_metric_value = current_metric_value
            is_best = True
            self.trainer.logger.info(
                f"Best validation {current_metric_name} updated to: {current_metric_value:.4f}"
            )
        self.trainer.logger.info(
            f"Currently Best {current_metric_name}: {self.trainer.best_metric_value:.4f}"
        )
        save_path = self.trainer.cfg.save_path
        ckpt_dir = os.path.join(save_path, "model", "model_last")
        save_checkpoint(
            ckpt_dir,
            self.trainer.state,
            epoch=self.trainer.epoch + 1,
            best_metric_value=self.trainer.best_metric_value,
        )
        if is_best:
            best_dir = os.path.join(save_path, "model", "model_best")
            if os.path.exists(best_dir):
                shutil.rmtree(best_dir)
            shutil.copytree(ckpt_dir, best_dir)
        if self.save_freq and (self.trainer.epoch + 1) % self.save_freq == 0:
            epoch_dir = os.path.join(save_path, "model", f"epoch_{self.trainer.epoch + 1}")
            if os.path.exists(epoch_dir):
                shutil.rmtree(epoch_dir)
            shutil.copytree(ckpt_dir, epoch_dir)


@HOOKS.register_module()
class CheckpointLoader(HookBase):
    """Load weights / resume training state (reference `:230`)."""

    def __init__(self, keywords="", replacement=None, strict=False):
        self.keywords = keywords
        self.replacement = replacement if replacement is not None else keywords
        self.strict = strict

    def before_train(self):
        from pointcept_tpu.models.utils.checkpoint import load_checkpoint, load_weights

        cfg = self.trainer.cfg
        self.trainer.logger.info("=> Loading checkpoint & weight ...")
        if cfg.get("weight") and os.path.exists(cfg.weight):
            if cfg.get("resume"):
                meta = load_checkpoint(cfg.weight, self.trainer)
                self.trainer.start_epoch = int(meta.get("epoch", 0))
                self.trainer.best_metric_value = float(meta.get("best_metric_value", -np.inf))
                self.trainer.logger.info(f"Resuming train at epoch: {self.trainer.start_epoch}")
            else:
                load_weights(
                    cfg.weight,
                    self.trainer,
                    keywords=self.keywords,
                    replacement=self.replacement,
                    strict=self.strict,
                )
        else:
            self.trainer.logger.info("No weight found at: %s" % cfg.get("weight"))


@HOOKS.register_module()
class GarbageHandler(HookBase):
    """Deterministic GC (reference `:528`): disable auto GC, collect periodically."""

    def __init__(self, collect_freq=200):
        self.collect_freq = collect_freq

    def before_train(self):
        gc.disable()
        gc.collect()

    def after_step(self):
        if (int(self.trainer.state.step) % self.collect_freq) == 0:
            gc.collect()

    def after_train(self):
        gc.enable()


@HOOKS.register_module()
class PreciseEvaluator(HookBase):
    """Run the full TESTER after training (reference `:278`)."""

    def __init__(self, test_last=False):
        self.test_last = test_last

    def after_train(self):
        self.trainer.logger.info(">>>>>>>>>>>>>>>> Start Precise Evaluation >>>>>>>>>>>>>>>>")
        from pointcept_tpu.engines.test import TESTERS

        cfg = self.trainer.cfg
        tester = TESTERS.build(dict(type=cfg.test.type, cfg=cfg, model=self.trainer.model, state=self.trainer.state))
        if self.test_last:
            self.trainer.logger.info("=> Testing on model_last ...")
        else:
            self.trainer.logger.info("=> Testing on model_best ...")
            from pointcept_tpu.models.utils.checkpoint import restore_state

            best_dir = os.path.join(cfg.save_path, "model", "model_best")
            if os.path.exists(best_dir):
                tester.state = restore_state(best_dir, self.trainer.state)
        tester.test()


@HOOKS.register_module()
class RuntimeProfiler(HookBase):
    """jax.profiler trace of a few training steps (reference `:348` used torch.profiler)."""

    def __init__(self, forward=True, backward=True, interrupt=False, warm_up=2, steps=3):
        self.warm_up = warm_up
        self.steps = steps
        self.interrupt = interrupt
        self._active = False

    def before_step(self):
        import jax

        it = self.trainer.comm_info["iter"]
        if it == self.warm_up and self.trainer.epoch == 0:
            trace_dir = os.path.join(self.trainer.cfg.save_path, "profile")
            self.trainer.logger.info(f"Profiler trace -> {trace_dir}")
            jax.profiler.start_trace(trace_dir)
            self._active = True

    def after_step(self):
        import jax

        it = self.trainer.comm_info["iter"]
        if self._active and it >= self.warm_up + self.steps and self.trainer.epoch == 0:
            jax.block_until_ready(self.trainer.state.params)
            jax.profiler.stop_trace()
            self._active = False
            self.trainer.logger.info("Profiler trace complete.")
            if self.interrupt:
                sys.exit(0)


@HOOKS.register_module()
class RuntimeProfilerV2(HookBase):
    """Schedule-based profiler (reference `:427-497`: torch.profiler schedule
    wait/warmup/active/repeat -> tensorboard). Here: repeated jax.profiler
    trace windows, one trace dir per cycle, viewable in tensorboard/xprof."""

    def __init__(self, wait=1, warmup=1, active=2, repeat=1):
        self.wait = wait
        self.warmup = warmup
        self.active = active
        self.repeat = repeat
        self._cycle_len = wait + warmup + active
        self._active = False

    def before_step(self):
        import jax

        if self.trainer.epoch != 0:
            return
        it = self.trainer.comm_info["iter"]
        cycle, pos = divmod(it, self._cycle_len)
        if cycle >= self.repeat:
            return
        if pos == self.wait + self.warmup and not self._active:
            trace_dir = os.path.join(self.trainer.cfg.save_path, "profile", f"cycle{cycle}")
            self.trainer.logger.info(f"ProfilerV2 trace (cycle {cycle}) -> {trace_dir}")
            jax.profiler.start_trace(trace_dir)
            self._active = True

    def after_step(self):
        import jax

        if not self._active:
            return
        it = self.trainer.comm_info["iter"]
        _, pos = divmod(it, self._cycle_len)
        if pos == self._cycle_len - 1:
            jax.block_until_ready(self.trainer.state.params)
            jax.profiler.stop_trace()
            self._active = False
            self.trainer.logger.info("ProfilerV2 trace cycle complete.")


@HOOKS.register_module()
class SonataHook(HookBase):
    """Schedules SSL hyperparameters (mask size/ratio, teacher temp, EMA
    momentum) per step and feeds them into the train step.

    Reference mechanism: `ModelHook` routes hook events into the model
    (`engines/hooks/default.py:40`), and Sonata schedules in before_step
    (`sonata_v1m1_base.py:187-256`). With a functional train step the values
    travel as traced scalars instead.
    """

    def before_train(self):
        from pointcept_tpu.utils.scheduler import CosineScheduler

        model = self.trainer.model
        total_steps = len(self.trainer.train_loader) * self.trainer.max_epoch
        curr = self.trainer.start_epoch * len(self.trainer.train_loader)

        def sched(start, base, warmup_ratio=0.0, final=None):
            s = CosineScheduler(
                base_value=base,
                final_value=base if final is None else final,
                total_steps=total_steps,
                warmup_steps=int(total_steps * warmup_ratio),
                start_warmup_value=start,
            )
            s.iter = curr
            return s

        self._mask_size = sched(model.mask_size_start, model.mask_size_base, model.mask_size_warmup_ratio)
        self._mask_ratio = sched(model.mask_ratio_start, model.mask_ratio_base, model.mask_ratio_warmup_ratio)
        self._teacher_temp = sched(model.teacher_temp_start, model.teacher_temp_base, model.teacher_temp_warmup_ratio)
        self._momentum = sched(model.momentum_base, model.momentum_base, 0.0, final=model.momentum_final)

    def before_step(self):
        hyper = dict(
            mask_size=self._mask_size.step(),
            mask_ratio=self._mask_ratio.step(),
            teacher_temp=self._teacher_temp.step(),
            momentum=self._momentum.step(),
        )
        self.trainer.comm_info["model_hyper"] = hyper
        if self.trainer.storage is not None:
            for k, v in hyper.items():
                self.trainer.storage.put_scalar(f"params/{k}", float(v), smoothing_hint=False)


@HOOKS.register_module()
class WeightDecaySchedular(HookBase):
    """Cosine weight-decay schedule (reference `hooks/misc.py:500`).

    Implemented by swapping the optimizer's decayed-weights coefficient is not
    possible on a compiled optax chain, so the hook recompiles the train step
    when wd changes by more than `rebuild_tol` (epoch granularity in practice).
    """

    def __init__(self, base_value=0.05, final_value=0.05, rebuild_tol=1e-4):
        self.base_value = base_value
        self.final_value = final_value
        self.rebuild_tol = rebuild_tol
        self._applied = None

    def before_epoch(self):
        import numpy as np

        total = self.trainer.max_epoch
        t = self.trainer.epoch / max(total, 1)
        wd = self.final_value + 0.5 * (self.base_value - self.final_value) * (1 + np.cos(np.pi * t))
        if self._applied is None or abs(wd - self._applied) > self.rebuild_tol:
            self._applied = wd
            cfg = dict(self.trainer.cfg.optimizer)
            cfg["weight_decay"] = float(wd)
            self.trainer.cfg.optimizer = cfg
            # rebuild optimizer + train step with the new wd, preserving opt state
            from pointcept_tpu.utils.optimizer import build_optimizer

            self.trainer.tx = build_optimizer(
                cfg, self.trainer.state.params, self.trainer.scheduler, self.trainer.cfg.get("param_dicts")
            )
            self.trainer._train_step_fn = None
            self.trainer.logger.info(f"WeightDecaySchedular: wd -> {wd:.5f}")


@HOOKS.register_module()
class DataCacheOperator(HookBase):
    """Pre-populate the /dev/shm dataset cache (reference `hooks/misc.py:313`)."""

    def __init__(self, data_root=None, split=None):
        self.data_root = data_root
        self.split = split

    def before_train(self):
        from pointcept_tpu.utils import cache as shm

        self.trainer.logger.info("=> Preloading dataset into shared memory ...")
        dataset = self.trainer.train_loader.dataset
        if not hasattr(dataset, "get_data"):
            return
        count = 0
        for i in range(len(getattr(dataset, "data_list", []))):
            data = dataset.get_data(i)
            arrays = {k: v for k, v in data.items() if isinstance(v, __import__("numpy").ndarray)}
            name = f"pointcept-{dataset.__class__.__name__}-{dataset.get_data_name(i)}"
            if not shm.exists(name):
                shm.shared_dict(name, arrays)
                count += 1
        self.trainer.logger.info(f"Cached {count} scenes to /dev/shm")
