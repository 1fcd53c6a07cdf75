"""Hook-driven trainer with a single-controller SPMD train step.

Parity: reference `pointcept/engines/train.py:38-357` (`TRAINERS`, `TrainerBase`,
`Trainer`). The torch stack's launch/mp.spawn/DDP/GradScaler machinery collapses
into one jitted `shard_map` train step over a 1-D device mesh ("data"): each
device holds a shard of scenes as one fixed-capacity PointBatch; gradients and
metrics are `pmean`-ed by XLA over ICI. Host-side structure (hooks, EventStorage,
epoch loop, comm_info) mirrors the reference so hooks port 1:1.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointcept_tpu.datasets import build_dataset, point_collate_fn
from pointcept_tpu.datasets.loader import DataLoader
from pointcept_tpu.engines.hooks.builder import build_hooks
from pointcept_tpu.models import build_model
from pointcept_tpu.models.utils.structure import PointBatch
from pointcept_tpu.utils import comm
from pointcept_tpu.utils.config import Config
from pointcept_tpu.utils.events import EventStorage, ExceptionWriter
from pointcept_tpu.utils.logger import get_root_logger
from pointcept_tpu.utils.optimizer import build_optimizer
from pointcept_tpu.utils.registry import Registry
from pointcept_tpu.utils.scheduler import build_scheduler

TRAINERS = Registry("trainers")


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_point_batch(arrays: Dict[str, np.ndarray], num_scenes: int, condition: Optional[str] = None) -> PointBatch:
    """Device-shard arrays (leading dim already stripped) -> PointBatch."""
    geometry = {k[len("geo_"):]: v for k, v in arrays.items() if k.startswith("geo_")}
    return PointBatch(
        coord=arrays["coord"],
        feat=arrays.get("feat"),
        grid_coord=arrays.get("grid_coord"),
        batch=arrays["batch"],
        origin_coord=arrays.get("origin_coord"),
        segment=arrays.get("segment"),
        instance=arrays.get("instance"),
        instance_centroid=arrays.get("instance_centroid"),
        condition=condition,
        num_scenes=num_scenes,
        geometry=geometry or None,
    )


def make_view_inputs(arrays: Dict[str, jnp.ndarray], num_scenes: int, condition=None) -> dict:
    """Multi-view SSL inputs: per-view PointBatch + passthrough arrays (MSC/Sonata).

    PointBatch.num_scenes is set to the scene count per device; SSL models with
    multiple views per scene rescale it by their view counts.
    """
    data = {}
    for prefix in ("view1", "view2", "global", "local"):
        if f"{prefix}_coord" not in arrays:
            continue
        data[prefix] = PointBatch(
            coord=arrays[f"{prefix}_coord"],
            feat=arrays.get(f"{prefix}_feat"),
            grid_coord=arrays.get(f"{prefix}_grid_coord"),
            batch=arrays[f"{prefix}_batch"],
            origin_coord=arrays.get(f"{prefix}_origin_coord"),
            condition=condition,
            num_scenes=num_scenes,
        )
    for k, v in arrays.items():
        data.setdefault(k, v)
    return data


def device_collate(samples, num_devices: int, capacity_per_device: int, mix_prob: float = 0.0,
                   geometry_plan: Optional[dict] = None):
    """Split a global batch of scenes into per-device PointBatch arrays with a
    leading device axis: {key: [D, N_dev, ...]}.

    With `geometry_plan` (ops/host_geometry.ptv3_plan), each shard additionally
    carries host-precomputed ``geo_*`` index arrays so the device step skips all
    in-graph sort/map building."""
    assert len(samples) % num_devices == 0, (
        f"global batch {len(samples)} must divide across {num_devices} devices"
    )
    per = len(samples) // num_devices
    shards = []
    for d in range(num_devices):
        group = samples[d * per : (d + 1) * per]
        shard = point_collate_fn(group, mix_prob=mix_prob, capacity=capacity_per_device)
        if geometry_plan is not None and "coord" in shard:
            from pointcept_tpu.ops import host_geometry as hg

            plan = dict(geometry_plan, num_scenes=per)
            # np.random here is deterministic: the DataLoader seeds every
            # batch (worker or serial) with cfg.seed + epoch*7919 + batch_idx
            # before invoking the collate (datasets/loader.py), so shuffle
            # seeds are reproducible and distinct across workers/batches
            seed = int(np.random.randint(0, 2**62)) if geometry_plan.get("shuffle", True) else 0
            shard.update(hg.geometry_arrays(plan, shard, shuffle_seed=seed))
        shards.append(shard)
    out = {}
    for key in shards[0]:
        if key == "num_scenes":
            continue
        if key == "condition":
            conds = {s["condition"] for s in shards}
            assert len(conds) == 1, f"mixed conditions in one step: {conds}"
            out["condition"] = conds.pop()
            continue
        out[key] = np.stack([s[key] for s in shards])
    out["num_scenes"] = per
    return out


def build_train_step(model, tx, num_scenes: int, mesh: Mesh, condition: Optional[str] = None):
    """The SPMD train step: shard_map over the "data" axis, grads pmean'd.

    Shared by Trainer and the driver's multichip dry-run entry. `condition` is
    the static dataset tag for PPT multi-dataset training (one jit
    specialization per dataset).
    """

    def step_fn(state: TrainState, arrays: Dict[str, jnp.ndarray], key: jax.Array):
        # each shard keeps a leading size-1 device axis: strip it
        arrays = {k: v[0] for k, v in arrays.items()}
        didx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, didx)
        key = jax.random.fold_in(key, state.step)
        ks, kd, km = jax.random.split(key, 3)
        hyper = {k[len("hyper_"):]: v[0] for k, v in arrays.items() if k.startswith("hyper_")}
        arrays = {k: v for k, v in arrays.items() if not k.startswith("hyper_")}
        if "view1_coord" in arrays or "global_coord" in arrays:
            inputs = make_view_inputs(arrays, num_scenes, condition)
        else:
            inputs = make_point_batch(arrays, num_scenes, condition)
        extra = {}
        if "category" in arrays:
            extra["category"] = arrays["category"]

        ema_pairs = getattr(model, "ema_pairs", None)
        if ema_pairs is not None and hyper:
            extra["hyper"] = hyper

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs,
                train=True,
                rngs={"shuffle": ks, "dropout": kd, "mask": km},
                mutable=["batch_stats", "diagnostics"],
                **extra,
            )
            return out["loss"], (updates["batch_stats"], updates.get("diagnostics", {}))

        (loss, (new_bs, diag)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, "data")
        loss_m = jax.lax.pmean(loss, "data")
        new_bs = jax.lax.pmean(new_bs, "data")
        # overflow observability: static-capacity drops (pool clusters / conv
        # blocks beyond capacity) summed over all sites and devices
        overflow = {}
        for name in ("pool_overflow", "block_overflow"):
            leaves = [
                v for path, v in jax.tree_util.tree_leaves_with_path(diag)
                if name in jax.tree_util.keystr(path)
            ]
            if leaves:
                overflow[name] = jax.lax.psum(
                    sum(jnp.sum(l) for l in leaves), "data"
                )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ema_pairs is not None:
            # teacher EMA with the post-update student params (reference
            # Sonata.after_step, sonata_v1m1_base.py:258-265)
            m = hyper.get("momentum", jnp.asarray(0.996))
            new_params = dict(new_params)
            for tk, sk in ema_pairs.items():
                if sk is None:  # frozen (non-EMA) teacher, e.g. Sonata-v1m3 distill
                    continue
                new_params[tk] = jax.tree_util.tree_map(
                    lambda t, s: m * t + (1 - m) * s, new_params[tk], new_params[sk]
                )
        new_state = TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        return new_state, {"loss": loss_m, **overflow}

    smapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


class TrainerBase:
    def __init__(self):
        self.hooks = []
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0
        self.comm_info: Dict[str, Any] = dict()
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks_cfg) -> None:
        hooks = build_hooks(hooks_cfg) if hooks_cfg else []
        for h in hooks:
            h.trainer = self
        self.hooks = hooks

    def _call_hooks(self, name):
        for h in self.hooks:
            getattr(h, name)()

    def before_train(self):
        self._call_hooks("before_train")

    def before_epoch(self):
        self._call_hooks("before_epoch")

    def before_step(self):
        self._call_hooks("before_step")

    def run_step(self):
        raise NotImplementedError

    def after_step(self):
        self._call_hooks("after_step")

    def after_epoch(self):
        self._call_hooks("after_epoch")
        self.storage.reset_histories()

    def after_train(self):
        if self.comm_info.get("terminate", False):
            return
        self._call_hooks("after_train")

    def train(self):
        with EventStorage() as self.storage, ExceptionWriter():
            self.before_train()
            self.logger.info(">>>>>>>>>>>>>>>> Start Training >>>>>>>>>>>>>>>>")
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.train_loader.set_epoch(self.epoch)
                for i, input_dict in enumerate(self.iter_loader()):
                    self.comm_info["iter"] = i
                    self.comm_info["input_dict"] = input_dict
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.after_epoch()
            self.after_train()

    def iter_loader(self):
        return iter(self.train_loader)


@TRAINERS.register_module("DefaultTrainer")
class Trainer(TrainerBase):
    def __init__(self, cfg: Config):
        super().__init__()
        self.cfg = cfg
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = cfg.eval_epoch
        self.best_metric_value = -float("inf")
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "train.log"),
            file_mode="a" if cfg.get("resume") else "w",
        )
        self.logger.info("=> Loading config ...")
        self.logger.info(f"Save path: {cfg.save_path}")
        self.logger.info("=> Building model ...")
        self.model = self.build_model()
        self.logger.info("=> Building train dataset & dataloader ...")
        self.train_loader = self.build_train_loader()
        self.logger.info("=> Building val dataset & dataloader ...")
        self.val_loader = self.build_val_loader()
        self.logger.info("=> Setting up device mesh & train state ...")
        self.mesh = self.build_mesh()
        self.scheduler = self.build_scheduler()
        self.tx = None  # built in init_state (needs params)
        self.state = None
        self.writer = None  # set by writer hooks if enabled
        self._train_step_fn = None
        self._eval_step_fn = None
        # shared across hosts: the step key is a replicated input to the
        # shard_map'd train step (per-device variation comes from folding in
        # the device's axis index, build_train_step), so every host must feed
        # the same key or the replicated argument would disagree
        self._rng = jax.random.PRNGKey(int(cfg.get("shared_seed", cfg.seed)))
        self.init_state()
        self.logger.info("=> Building hooks ...")
        self.register_hooks(cfg.hooks)

    # ------------------------------------------------------------------ builders
    def build_model(self):
        from pointcept_tpu.models.builder import apply_amp_policy

        model = build_model(
            apply_amp_policy(dict(self.cfg.model), self.cfg.get("enable_amp", False))
        )
        return model

    def build_mesh(self):
        devices = np.array(jax.devices())
        return Mesh(devices, ("data",))

    @property
    def num_devices(self):
        return len(jax.devices())

    @property
    def num_local_devices(self):
        return jax.local_device_count()

    @property
    def process_count(self):
        return jax.process_count()

    @property
    def process_index(self):
        return jax.process_index()

    def _to_global(self, batch: dict) -> Dict[str, jnp.ndarray]:
        """Per-host local shard arrays [D_local, ...] -> global jax.Arrays
        [D_global, ...] sharded over the mesh's data axis (multi-host)."""
        items = {k: v for k, v in batch.items() if k not in ("num_scenes", "condition")}
        if self.process_count == 1:
            return {k: jnp.asarray(v) for k, v in items.items()}
        sh = NamedSharding(self.mesh, P("data"))
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in items.items()
        }

    @property
    def capacity_per_device(self):
        return int(self.cfg.get("point_capacity", 131072))

    def geometry_plan(self, capacity: int, train: bool = True) -> Optional[dict]:
        """Host-geometry plan (ops/host_geometry) when the backbone supports it.

        Enabled by default for PT-v3 backbones (cfg.host_geometry=False opts
        out): the data workers precompute curve orders / neighbor maps / patch
        partitions / pooling clusters so the device step is pure gather/GEMM."""
        bb = dict(self.cfg.model).get("backbone")
        if not bb or not str(dict(bb).get("type", "")).startswith("PT-v3"):
            return None
        host_geo = self.cfg.get("host_geometry")
        if host_geo is None:
            # a backbone explicitly configured for the on-device block engine
            # opts out of host geometry (which would silently disable it)
            host_geo = dict(bb).get("conv_engine") != "block"
        if not host_geo:
            self.logger.info(
                "host_geometry off: geometry built on-device "
                f"(conv_engine={dict(bb).get('conv_engine', 'gather')})"
            )
            return None
        self.logger.info("host_geometry on: PTv3 geometry precomputed by data workers")
        from pointcept_tpu.ops import host_geometry as hg

        try:
            plan = hg.ptv3_plan(dict(bb), capacity, num_scenes=1)  # num_scenes set per batch
            hg._load()  # compile/load the native library up-front
        except Exception as e:  # pragma: no cover - fallback to in-graph geometry
            self.logger.warning(f"host geometry disabled: {e}")
            return None
        if not train:
            plan = dict(plan, shuffle=False)
        return plan

    def build_train_loader(self):
        dataset = build_dataset(dict(self.cfg.data.train))
        collate = partial(
            device_collate,
            num_devices=self.num_local_devices,
            capacity_per_device=self.capacity_per_device,
            mix_prob=self.cfg.get("mix_prob", 0.0),
            geometry_plan=self.geometry_plan(self.capacity_per_device, train=True),
        )
        assert self.cfg.batch_size % self.process_count == 0, (
            f"batch_size {self.cfg.batch_size} must divide across {self.process_count} hosts"
        )
        return DataLoader(
            dataset,
            batch_size=self.cfg.batch_size // self.process_count,
            shuffle=True,
            num_workers=self.cfg.get("num_worker", 0),
            collate_fn=collate,
            drop_last=True,
            # SHARED seed: the pre-shard permutation (and any sampler cap
            # selection) must be identical on every host or per-host
            # shards overlap (reference DistributedSampler uses one seed)
            seed=int(self.cfg.get("shared_seed", self.cfg.seed)),
            process_index=self.process_index,
            process_count=self.process_count,
        )

    def build_val_loader(self):
        if not self.cfg.get("evaluate", True) or "val" not in self.cfg.data:
            return None
        dataset = build_dataset(dict(self.cfg.data.val))
        val_capacity = int(self.cfg.get("point_capacity_val", self.capacity_per_device))
        collate = partial(
            device_collate,
            num_devices=self.num_local_devices,
            capacity_per_device=val_capacity,
            mix_prob=0.0,
            geometry_plan=self.geometry_plan(val_capacity, train=False),
        )
        bs = self.cfg.get("batch_size_val") or self.num_devices
        return DataLoader(
            dataset,
            batch_size=bs // self.process_count,
            shuffle=False,
            num_workers=self.cfg.get("num_worker", 0),
            collate_fn=collate,
            drop_last=False,
            # SHARED seed: the pre-shard permutation (and any sampler cap
            # selection) must be identical on every host or per-host
            # shards overlap (reference DistributedSampler uses one seed)
            seed=int(self.cfg.get("shared_seed", self.cfg.seed)),
            process_index=self.process_index,
            process_count=self.process_count,
        )

    def build_scheduler(self):
        assert self.train_loader is not None
        total_steps = len(self.train_loader) * self.max_epoch
        self.logger.info(f"Scheduler total steps: {total_steps}")
        cfg = dict(self.cfg.scheduler)
        if "max_lr" not in cfg and cfg.get("type") == "OneCycleLR":
            cfg["max_lr"] = self.cfg.optimizer.lr
        if cfg.get("type") != "OneCycleLR":
            cfg["base_lr"] = self.cfg.optimizer.lr
        return build_scheduler(cfg, total_steps)

    # --------------------------------------------------------------------- state
    def _example_batch(self):
        samples = [self.train_loader.dataset[i] for i in range(self.cfg.batch_size)]
        return device_collate(samples, self.num_local_devices, self.capacity_per_device)

    def init_state(self):
        batch = self._example_batch()
        arrays = {k: jnp.asarray(v[0]) for k, v in batch.items() if k not in ("num_scenes", "condition")}
        condition = batch.get("condition")
        if "view1_coord" in arrays or "global_coord" in arrays:
            inputs = make_view_inputs(arrays, batch["num_scenes"], condition)
        else:
            inputs = make_point_batch(arrays, batch["num_scenes"], condition)
        # the SHARED seed, not the per-rank one: init must produce identical
        # params on every host (reference DDP broadcasts rank-0 weights)
        init_seed = int(self.cfg.get("shared_seed", self.cfg.seed))
        rngs = {
            "params": jax.random.PRNGKey(init_seed),
            "shuffle": jax.random.PRNGKey(init_seed + 1),
            "dropout": jax.random.PRNGKey(init_seed + 2),
            "mask": jax.random.PRNGKey(init_seed + 3),
        }
        # jitted: eager init dispatches thousands of tiny ops (slow, and has
        # wedged remote-device client sessions); one graph, persistently cached
        variables = jax.jit(lambda r, x: self.model.init(r, x, train=False))(rngs, inputs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
        self.logger.info(f"Num params: {n_params}")
        if self.cfg.get("sync_bn"):
            # SyncBN: all MaskedBatchNorms psum their batch stats over the data
            # axis (reference convert_sync_batchnorm)
            from pointcept_tpu.models.modules import set_default_bn_sync_axis

            set_default_bn_sync_axis("data")
        ema_pairs = getattr(self.model, "ema_pairs", None)
        if ema_pairs is not None:
            # copy student weights into the teacher (reference `:182-184`)
            params = dict(params)
            for tk, sk in ema_pairs.items():
                if sk is None:  # frozen teacher keeps its own (loaded) weights
                    continue
                # materialized copies, not aliases: the train step donates the
                # state (donate_argnums=(0,)) and an aliased teacher/student
                # leaf would be the same buffer donated twice
                params[tk] = jax.tree_util.tree_map(
                    lambda x: jnp.array(x), params[sk]
                )
        tx = build_optimizer(
            dict(self.cfg.optimizer), params, self.scheduler, self.cfg.get("param_dicts")
        )
        if ema_pairs is not None:
            # teacher params never receive optimizer updates (EMA only)
            def not_teacher(params_tree):
                return {
                    k: jax.tree_util.tree_map(lambda _: k not in ema_pairs, v)
                    for k, v in params_tree.items()
                }

            tx = optax.masked(tx, not_teacher)
        if self.cfg.get("clip_grad") is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.cfg.clip_grad), tx)
        accum = int(self.cfg.get("grad_accum_steps", 1) or 1)
        if accum > 1:
            # gradient accumulation (reference train.py:198-242's micro-batch
            # loop) — optax.MultiSteps applies the update every `accum` steps
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        self.tx = tx
        opt_state = tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats, opt_state=opt_state)
        # replicate across mesh
        rep = NamedSharding(self.mesh, P())
        self.state = jax.device_put(state, rep)

    # ---------------------------------------------------------------- train step
    def _build_train_step(self, condition=None):
        return build_train_step(
            self.model, self.tx, self.cfg.batch_size // self.num_devices, self.mesh, condition
        )

    @property
    def train_step(self):
        if self._train_step_fn is None:
            self._train_step_fn = {}
        return self._train_step_fn

    def run_step(self):
        batch = self.comm_info["input_dict"]
        condition = batch.get("condition")
        local = {k: v for k, v in batch.items() if k not in ("num_scenes", "condition")}
        for name, value in self.comm_info.get("model_hyper", {}).items():
            local[f"hyper_{name}"] = np.full((self.num_local_devices, 1), value, np.float32)
        arrays = self._to_global(local)
        steps = self.train_step
        if condition not in steps:
            steps[condition] = self._build_train_step(condition)
        self._rng, key = jax.random.split(self._rng)
        self.state, metrics = steps[condition](self.state, arrays, key)
        lr = float(self.scheduler(int(self.state.step) - 1))
        self.comm_info["metrics"] = {"loss": metrics["loss"]}
        self.comm_info["lr"] = lr
        if self.storage:
            self.storage.put_scalar("loss", float(metrics["loss"]))
            self.storage.put_scalar("lr", lr, smoothing_hint=False)
            for k in ("pool_overflow", "block_overflow"):
                if k in metrics:
                    v = float(metrics[k])
                    self.storage.put_scalar(k, v, smoothing_hint=False)
                    if v > 0:
                        self.logger.warning(
                            f"{k}={int(v)} points dropped by static capacity this step "
                            "— increase pool_capacity_factors/block_capacity_factor"
                        )

    # ---------------------------------------------------------------- eval step
    def _build_eval_step(self, condition=None):
        model = self.model
        num_scenes_val = (self.cfg.get("batch_size_val") or self.num_devices) // self.num_devices
        num_classes = self.cfg.data.num_classes
        ignore_index = self.cfg.data.get("ignore_index", -1)
        mesh = self.mesh

        def step_fn(state: TrainState, arrays: Dict[str, jnp.ndarray]):
            arrays = {k: v[0] for k, v in arrays.items()}
            pb = make_point_batch(arrays, num_scenes_val, condition)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, pb, train=False
            )
            logits = out["seg_logits"]
            loss = out.get("loss", jnp.zeros(()))
            pred = jnp.argmax(logits, axis=-1)
            seg = pb.segment
            valid = (seg != ignore_index) & pb.mask
            pred = jnp.where(valid, pred, num_classes)
            seg_c = jnp.where(valid, seg, num_classes)
            inter = jnp.zeros(num_classes + 1).at[jnp.where(pred == seg_c, pred, num_classes)].add(valid)
            target = jnp.zeros(num_classes + 1).at[seg_c].add(valid)
            output = jnp.zeros(num_classes + 1).at[pred].add(valid)
            union = output + target - inter
            res = {
                "loss": jax.lax.pmean(loss, "data"),
                "intersection": jax.lax.psum(inter[:num_classes], "data"),
                "union": jax.lax.psum(union[:num_classes], "data"),
                "target": jax.lax.psum(target[:num_classes], "data"),
            }
            return res

        smapped = jax.shard_map(
            step_fn, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(), check_vma=False
        )
        return jax.jit(smapped)

    @property
    def eval_step(self):
        # per-condition cache (PPT multi-dataset validation)
        if self._eval_step_fn is None:
            self._eval_step_fn = {}

        def dispatch(state, arrays, condition=None):
            if condition not in self._eval_step_fn:
                self._eval_step_fn[condition] = self._build_eval_step(condition)
            return self._eval_step_fn[condition](state, arrays)

        return dispatch

    # ------------------------------------------------------- classification eval
    def _build_cls_eval_step(self):
        model = self.model
        bs_val = self.cfg.get("batch_size_val") or self.num_devices
        num_scenes_val = bs_val // self.num_devices
        num_classes = self.cfg.data.num_classes
        mesh = self.mesh

        def step_fn(state: TrainState, arrays):
            arrays = {k: v[0] for k, v in arrays.items()}
            pb = make_point_batch(arrays, num_scenes_val)
            cat = arrays["category"]
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pb,
                train=False,
                category=cat,
            )
            pred = jnp.argmax(out["cls_logits"], axis=-1)
            valid = cat >= 0
            pred_c = jnp.where(valid, pred, num_classes)
            cat_c = jnp.where(valid, cat, num_classes)
            inter = jnp.zeros(num_classes + 1).at[jnp.where(pred_c == cat_c, pred_c, num_classes)].add(valid)
            target = jnp.zeros(num_classes + 1).at[cat_c].add(valid)
            output = jnp.zeros(num_classes + 1).at[pred_c].add(valid)
            return {
                "loss": jax.lax.pmean(out.get("loss", jnp.zeros(())), "data"),
                "intersection": jax.lax.psum(inter[:num_classes], "data"),
                "union": jax.lax.psum((output + target - inter)[:num_classes], "data"),
                "target": jax.lax.psum(target[:num_classes], "data"),
            }

        smapped = jax.shard_map(
            step_fn, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(), check_vma=False
        )
        return jax.jit(smapped)

    _cls_eval_step_fn = None

    @property
    def cls_eval_step(self):
        if self._cls_eval_step_fn is None:
            self._cls_eval_step_fn = self._build_cls_eval_step()
        return self._cls_eval_step_fn


@TRAINERS.register_module("MultiDatasetTrainer")
class MultiDatasetTrainer(Trainer):
    def build_train_loader(self):
        from pointcept_tpu.datasets.dataloader import MultiDatasetDataloader

        dataset = build_dataset(dict(self.cfg.data.train))
        collate = partial(
            device_collate,
            num_devices=self.num_local_devices,
            capacity_per_device=self.capacity_per_device,
            mix_prob=self.cfg.get("mix_prob", 0.0),
            geometry_plan=self.geometry_plan(self.capacity_per_device, train=True),
        )
        return MultiDatasetDataloader(
            dataset,
            batch_size_per_gpu=self.cfg.batch_size // comm.get_world_size(),
            num_worker_per_gpu=self.cfg.get("num_worker", 0),
            collate_fn=collate,
            # SHARED seed: the pre-shard permutation (and any sampler cap
            # selection) must be identical on every host or per-host
            # shards overlap (reference DistributedSampler uses one seed)
            seed=int(self.cfg.get("shared_seed", self.cfg.seed)),
        )


@TRAINERS.register_module("PartialSampledTrainer")
class PartialSampledTrainer(Trainer):
    """Trainer with a per-epoch cap on one sub-dataset (reference
    `engines/train.py:359`): swaps in DistributedImbalancedSampler."""

    def build_train_loader(self):
        from pointcept_tpu.datasets.loader import DistributedImbalancedSampler

        dataset = build_dataset(dict(self.cfg.data.train))
        sampler = DistributedImbalancedSampler(
            dataset,
            sampled_dataset_id=self.cfg.get("sampled_dataset_id", 0),
            sampled_dataset_limit=self.cfg.get("sampled_dataset_limit", 1000),
            # SHARED seed: the pre-shard permutation (and any sampler cap
            # selection) must be identical on every host or per-host
            # shards overlap (reference DistributedSampler uses one seed)
            seed=int(self.cfg.get("shared_seed", self.cfg.seed)),
        )
        collate = partial(
            device_collate,
            num_devices=self.num_local_devices,
            capacity_per_device=self.capacity_per_device,
            mix_prob=self.cfg.get("mix_prob", 0.0),
            geometry_plan=self.geometry_plan(self.capacity_per_device, train=True),
        )
        return DataLoader(
            dataset,
            batch_size=self.cfg.batch_size,
            num_workers=self.cfg.get("num_worker", 0),
            collate_fn=collate,
            drop_last=True,
            # SHARED seed: the pre-shard permutation (and any sampler cap
            # selection) must be identical on every host or per-host
            # shards overlap (reference DistributedSampler uses one seed)
            seed=int(self.cfg.get("shared_seed", self.cfg.seed)),
            sampler=sampler,
        )
