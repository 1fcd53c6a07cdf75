"""Testers: precise fragment-wise inference + metrics/submissions.

Parity: reference `pointcept/engines/test.py` — `TESTERS:37`, `TesterBase:40`,
`SemSegTester:122` (per-scene fragment loop, softmax accumulation at full
resolution, inverse mapping, per-scene .npy cache, distributed gather of
I/U/T, submission writers), `ClsTester:606`, `ClsVotingTester:724`.

TPU shape discipline: each fragment is padded to a static test capacity and run
through one jitted eval forward; the ragged accumulation happens host-side in
numpy exactly like the reference.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_tpu.datasets import build_dataset
from pointcept_tpu.datasets.utils import collate_fn, pad_to_point_batch
from pointcept_tpu.engines.train import TrainState, make_point_batch
from pointcept_tpu.models import build_model
from pointcept_tpu.utils import comm
from pointcept_tpu.utils.logger import get_root_logger
from pointcept_tpu.utils.misc import AverageMeter, intersection_and_union, make_dirs
from pointcept_tpu.utils.registry import Registry

TESTERS = Registry("testers")


class TesterBase:
    def __init__(self, cfg, model=None, state=None, verbose=False):
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "test.log"), file_mode="a"
        )
        self.logger.info("=> Loading config ...")
        self.cfg = cfg
        self.verbose = verbose
        if self.verbose:
            self.logger.info(f"Save path: {cfg.save_path}")
        self.logger.info("=> Building model ...")
        from pointcept_tpu.models.builder import apply_amp_policy

        self.model = model if model is not None else build_model(
            apply_amp_policy(dict(cfg.model), cfg.get("enable_amp", False))
        )
        self.logger.info("=> Building test dataset & loader ...")
        self.test_dataset = build_dataset(dict(cfg.data.test))
        self.state = state if state is not None else self.init_state()
        self._infer_fn = None

    @property
    def test_capacity(self) -> int:
        return int(self.cfg.get("point_capacity_test", self.cfg.get("point_capacity", 131072)))

    @property
    def geometry_plan(self):
        """Host-geometry plan for PT-v3 backbones (see Trainer.geometry_plan)."""
        if not hasattr(self, "_geometry_plan"):
            self._geometry_plan = None
            bb = dict(self.cfg.model).get("backbone")
            host_geo = self.cfg.get("host_geometry")
            if host_geo is None:
                # mirror Trainer.geometry_plan: an explicit block-engine
                # backbone builds geometry on-device instead
                host_geo = not (bb and dict(bb).get("conv_engine") == "block")
            if host_geo and bb and str(dict(bb).get("type", "")).startswith("PT-v3"):
                try:
                    from pointcept_tpu.ops import host_geometry as hg

                    self._geometry_plan = dict(
                        hg.ptv3_plan(dict(bb), self.test_capacity, num_scenes=1), shuffle=False
                    )
                    hg._load()
                except Exception as e:  # pragma: no cover
                    self.logger.warning(f"host geometry disabled: {e}")
        return self._geometry_plan

    def fragment_batch(self, fragment) -> dict:
        """Pad one ragged fragment to the static test capacity (+ geometry)."""
        batch = pad_to_point_batch(collate_fn([fragment]), self.test_capacity, num_scenes=1)
        plan = self.geometry_plan
        if plan is not None and "coord" in batch:
            from pointcept_tpu.ops import host_geometry as hg

            batch.update(hg.geometry_arrays(plan, batch, shuffle_seed=0))
        return batch

    def init_state(self):
        # init params from an example fragment, then load weights
        self.logger.info("=> Initializing model state ...")
        sample = self.test_dataset[0]
        frag = sample["fragment_list"][0] if "fragment_list" in sample else sample
        batch = self.fragment_batch(frag)
        pb = make_point_batch(
            {k: jnp.asarray(v) for k, v in batch.items() if k != "num_scenes"}, 1
        )
        variables = jax.jit(lambda r, x: self.model.init(r, x, train=False))(
            {"params": jax.random.PRNGKey(0)}, pb
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=(),
        )
        if self.cfg.get("weight") and os.path.exists(self.cfg.weight):
            from pointcept_tpu.models.utils.checkpoint import restore_weights

            self.logger.info(f"Loading weight at: {self.cfg.weight}")
            state = restore_weights(self.cfg.weight, state)
        else:
            self.logger.info(f"No weight found at: {self.cfg.get('weight')}")
        return state

    @property
    def infer(self):
        if self._infer_fn is None:
            model = self.model

            @jax.jit
            def infer_fn(state, arrays):
                pb = make_point_batch(arrays, 1)
                out = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats}, pb, train=False
                )
                return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)

            self._infer_fn = infer_fn
        return self._infer_fn

    @property
    def infer_diag(self):
        """infer + total static-capacity overflow (pool/block drop counters).

        The reference drops nothing at eval (torch_scatter pooling is exact,
        spconv_unet/point_transformer_v3m1_base.py:341-444); our static
        capacities can, so precise eval surfaces the counters and
        `check_dropped` raises instead of silently zeroing clusters."""
        if getattr(self, "_infer_diag_fn", None) is None:
            model = self.model

            @jax.jit
            def infer_fn(state, arrays):
                pb = make_point_batch(arrays, 1)
                out, st = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    pb,
                    train=False,
                    mutable=["diagnostics"],
                )
                leaves = jax.tree_util.tree_leaves(st.get("diagnostics", {}))
                dropped = (
                    sum(jnp.sum(l).astype(jnp.int32) for l in leaves)
                    if leaves
                    else jnp.int32(0)
                )
                probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)
                return probs, dropped

            self._infer_diag_fn = infer_fn
        return self._infer_diag_fn

    def frag_accumulate(self, manifest, num_classes: int):
        """jit: wire words -> eval forward -> scatter-add probs into the
        resident device prediction buffer.

        The reference fragment loop (`test.py:122-353`) round-trips every
        fragment's [N, C] softmax to the host and `np.add.at`s it; on a
        network-attached TPU that is ~520 ms/fragment of RPC + transfer
        against ~117 ms of compute (measured, exp/tester_phase_timing.py).
        Instead the [2*capacity, C] accumulator LIVES on device (rows >=
        n_vox are a trash region fed by the pad sentinels), fragments arrive
        as ONE packed int32 buffer (`ops/wire.pack_raw`), and only the final
        per-scene buffer is fetched. Math identical: same softmax, same
        per-row add order.
        """
        key = (manifest, num_classes)
        cache = getattr(self, "_frag_acc_cache", None)
        if cache is None:
            cache = self._frag_acc_cache = {}
        if key not in cache:
            from pointcept_tpu.ops.wire import unpack_raw

            model = self.model

            @partial(jax.jit, donate_argnums=(2, 3))
            def fn(state, words, pred, dropped):
                arrays = unpack_raw(words, manifest)
                idx = arrays.pop("pred_index")
                pb = make_point_batch(arrays, 1)
                out, st = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    pb,
                    train=False,
                    mutable=["diagnostics"],
                )
                leaves = jax.tree_util.tree_leaves(st.get("diagnostics", {}))
                d = (
                    sum(jnp.sum(l).astype(jnp.int32) for l in leaves)
                    if leaves
                    else jnp.int32(0)
                )
                probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)
                pred = pred.at[idx].add(probs, unique_indices=True)
                return pred, dropped + d

            cache[key] = fn
        return cache[key]

    def _fragment_geometry_ok(self) -> bool:
        """Gate for the shared-geometry fragment path: PT-v3 backbone with
        in-graph geometry (fragments of one voxelization share their grid, so
        serialization/block tables/partitions/pool clusters are built once
        per scene instead of once per fragment)."""
        if not self.cfg.get("fragment_geometry_reuse", True):
            return False
        if self.geometry_plan is not None:  # host-geometry path has its own reuse
            return False
        model_cfg = dict(self.cfg.model)
        if model_cfg.get("type") not in ("DefaultSegmentorV2", "DefaultLORASegmentorV2"):
            return False
        bb = model_cfg.get("backbone")
        return bool(bb) and str(dict(bb).get("type", "")).startswith("PT-v3")

    def _coord_from_grid_ok(self) -> bool:
        """Per-fragment float coords can be dropped from the wire when the
        backbone's logits are coord-insensitive (PT-v3 consumes coord only via
        RoPE/RPE; grid_coord drives everything else — the headline bench's
        wire format relies on the same property, ops/wire.py docstring)."""
        bb = dict(dict(self.cfg.model).get("backbone") or {})
        return not bb.get("enable_rpe", False) and bb.get("rope_base") is None

    def scene_accumulate(self, num_classes: int, n_slots: int, cap: int,
                         grid_packed: bool, with_coord: bool):
        """jit: one dispatch per fragment GROUP sharing one voxel grid.

        Builds the forward geometry ONCE (PT-v3 build_geometry) from the
        group's shared grid, then scans B=4-batched forwards over it,
        scatter-adding each fragment's softmax into the device-resident
        accumulator. The wire is slim: the grid rides ONCE per group (all
        fragments of a GridSample test voxelization share it — that is what
        makes the geometry shareable at all), fragments carry only their
        [cap, F] float features + pred_index (+ coord for RoPE/RPE models);
        batch/mask derive from the scalar fragment length.
        """
        key = (num_classes, n_slots, cap, grid_packed, with_coord)
        cache = getattr(self, "_scene_acc_cache", None)
        if cache is None:
            cache = self._scene_acc_cache = {}
        if key in cache:
            return cache[key]
        from pointcept_tpu.ops.wire import _GRID_BITS

        model = self.model
        bb = build_model(dict(dict(self.cfg.model)["backbone"]))
        B = min(self._fragment_batch(), n_slots)
        assert n_slots % B == 0
        G = n_slots // B
        grid_size = float(dict(dict(self.cfg.model)["backbone"]).get("grid_size", 0.02))

        @partial(jax.jit, donate_argnums=(3, 4), static_argnums=(5,))
        def fn(state, shared, words, pred, dropped, n_feat):
            # shared: {"grid": [cap] packed or [cap,3], "n_frag": scalar}
            vars_ = {"params": state.params, "batch_stats": state.batch_stats}
            if grid_packed:
                w = shared["grid"].astype(jnp.int32)
                m = (1 << _GRID_BITS) - 1
                grid1 = jnp.stack(
                    [w & m, (w >> _GRID_BITS) & m, (w >> (2 * _GRID_BITS)) & m], axis=1
                )
            else:
                grid1 = shared["grid"].astype(jnp.int32)
            n_frag = shared["n_frag"]
            valid1 = jnp.arange(cap, dtype=jnp.int32) < n_frag
            grid1 = jnp.where(valid1[:, None], grid1, 0)
            gridB = jnp.tile(grid1, (B, 1))
            batchB = jnp.concatenate(
                [jnp.where(valid1, b, -1) for b in range(B)]
            ).astype(jnp.int32)
            coordB_default = gridB.astype(jnp.float32) * grid_size

            def arrays_of(wb):  # [B, W] -> (arrays dict at B*cap, idx [B, cap])
                nf = n_feat
                nfloat = nf + (3 if with_coord else 0)
                f32 = jax.lax.bitcast_convert_type(wb[:, : nfloat * cap], jnp.float32)
                feat = f32[:, : nf * cap].reshape(B, cap, nf).reshape(-1, nf)
                if with_coord:
                    coord = f32[:, nf * cap :].reshape(B, cap, 3).reshape(-1, 3)
                else:
                    coord = coordB_default
                idx = wb[:, nfloat * cap :]
                arrays = dict(feat=feat, coord=coord, grid_coord=gridB, batch=batchB)
                return arrays, idx

            a0, _ = arrays_of(words[:B])
            pb0 = make_point_batch(a0, B)
            geom = bb.build_geometry(pb0.replace(feat=None))

            def body(carry, wb):
                pred, dropped = carry
                arrays, idx = arrays_of(wb)
                pb = make_point_batch(arrays, B)
                out, st = model.apply(
                    vars_, pb, train=False, precomputed=geom, mutable=["diagnostics"]
                )
                leaves = jax.tree_util.tree_leaves(st.get("diagnostics", {}))
                d = (
                    sum(jnp.sum(l).astype(jnp.int32) for l in leaves)
                    if leaves
                    else jnp.int32(0)
                )
                probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)
                for b in range(B):
                    pb_slice = jax.lax.dynamic_slice_in_dim(probs, b * cap, cap, axis=0)
                    pred = pred.at[idx[b]].add(pb_slice, unique_indices=True)
                return (pred, dropped + d), None

            (pred, dropped), _ = jax.lax.scan(
                body, (pred, dropped), words.reshape(G, B, words.shape[-1])
            )
            return pred, dropped

        cache[key] = fn
        return cache[key]

    def _fragment_batch(self) -> int:
        """Fragments per scanned forward in the grouped path. B=4 matches the
        headline bench's measured optimum at 102k-point capacity; larger test
        capacities can A/B via cfg.tester_fragment_batch (pool/block capacity
        padding scales with B*cap and can flip the trade)."""
        return int(self.cfg.get("tester_fragment_batch", 4))

    def _slot_bucket(self, n: int) -> int:
        """Fragment-group padding bucket: exact at 1/2, else multiples of the
        fragment batch (bounds dummy-forward waste at <=B-1 per group)."""
        b = self._fragment_batch()
        if n <= 2:
            return n
        return ((n + b - 1) // b) * b

    def check_dropped(self, dropped: int, n_valid: int, context: str):
        """Fail loudly when static capacities dropped points at eval.

        >0.1% of the fragment is an error (mis-sized `pool_capacity_factors` /
        `block_capacity_factor` corrupt the prediction); any nonzero count is
        logged so capacity sizing stays observable."""
        if dropped <= 0:
            return
        frac = dropped / max(n_valid, 1)
        tol = float(self.cfg.get("eval_overflow_tolerance", 1e-3))
        if frac > tol:
            raise RuntimeError(
                f"{context}: static capacity dropped {dropped}/{n_valid} points "
                f"({frac:.2%} > {tol:.2%}); raise pool_capacity_factors / "
                "block_capacity_factor (or eval_overflow_tolerance to accept)"
            )
        self.logger.warning(
            f"{context}: static capacity dropped {dropped}/{n_valid} points ({frac:.3%})"
        )

    def scene_indices(self):
        """Shard scenes across hosts (reference DistributedSampler of scenes)."""
        n = len(self.test_dataset)
        return list(range(comm.get_rank(), n, comm.get_world_size()))

    def test(self):
        raise NotImplementedError


@TESTERS.register_module()
class SemSegTester(TesterBase):
    # subclasses whose forward takes extra per-scene inputs (DINO) keep the
    # host-side accumulation loop
    supports_device_accumulate = True

    def _pack_fragment(self, fragment, n_vox: int):
        """Host side of one fragment -> wire record dict.

        Grouped path (`_fragment_geometry_ok`): slim wire — per-fragment
        [cap, F] f32 features (+ coord for RoPE/RPE) + pred_index, and the
        SHARED group payload (packed voxel grid + fragment length) attached
        once; fragments of one GridSample voxelization share their grid
        bit-for-bit, which is also what keys the geometry groups. Fallback:
        the generic pack_raw buffer for the per-fragment loop."""
        from pointcept_tpu.ops.wire import _GRID_BITS, pack_raw, raw_manifest

        cap = self.test_capacity
        index = np.asarray(fragment.pop("index"))
        n_frag = fragment["coord"].shape[0]
        if n_frag > cap:
            raise ValueError(
                f"fragment has {n_frag} points > point_capacity_test {cap}"
            )
        batch = self.fragment_batch(fragment)
        arrays = {
            k: np.asarray(v)
            for k, v in batch.items()
            if k != "num_scenes" and isinstance(v, (np.ndarray, jnp.ndarray))
        }
        # pad rows (and forward rows beyond n_frag) land in the trash region
        # [n_vox, n_vox + cap) of the accumulator — unique rows, so the
        # scatter stays in its fast unique-indices mode
        pred_index = np.concatenate(
            [index.astype(np.int64), n_vox + np.arange(cap - n_frag)]
        ).astype(np.int32)
        if not self._fragment_geometry_ok() or "grid_coord" not in arrays:
            arrays["pred_index"] = pred_index
            return dict(
                kind="raw", words=pack_raw(arrays), manifest=raw_manifest(arrays),
                n_frag=n_frag, gk=None,
            )
        import hashlib

        grid = np.ascontiguousarray(arrays["grid_coord"], np.int64)
        gk = (hashlib.blake2b(grid.tobytes(), digest_size=16).hexdigest(), n_frag)
        with_coord = not self._coord_from_grid_ok()
        feat = np.ascontiguousarray(arrays["feat"], np.float32)
        nf = feat.shape[1]
        nfloat = nf + (3 if with_coord else 0)
        words = np.empty((nfloat + 1) * cap, np.int32)
        words[: nf * cap] = feat.view(np.int32).ravel()
        if with_coord:
            words[nf * cap : nfloat * cap] = (
                np.ascontiguousarray(arrays["coord"], np.float32).view(np.int32).ravel()
            )
        words[nfloat * cap :] = pred_index
        grid_packed = grid.min() >= 0 and grid.max() < (1 << _GRID_BITS)
        if grid_packed:
            gw = (
                grid[:, 0] | (grid[:, 1] << _GRID_BITS) | (grid[:, 2] << (2 * _GRID_BITS))
            ).astype(np.int32)
        else:
            gw = grid.astype(np.int32)
        return dict(
            kind="slim", words=words, n_frag=n_frag, gk=gk, n_feat=nf,
            with_coord=with_coord, grid_packed=grid_packed,
            shared=dict(grid=gw, n_frag=np.int32(n_frag)),
        )

    def _prepare_scene(self, idx: int, fast: bool, save_path: str):
        """Prefetch-thread scene loader: dataset fragments + wire packing."""
        data_dict = self.test_dataset[idx]
        fragment_list = data_dict.pop("fragment_list")
        segment = data_dict.pop("segment")
        data_name = data_dict.pop("name")
        packed = None
        resumed = os.path.isfile(os.path.join(save_path, f"{data_name}_pred.npy"))
        if fast and not resumed:
            packed = [self._pack_fragment(f, segment.size) for f in fragment_list]
        return dict(
            data_dict=data_dict, segment=segment, data_name=data_name,
            fragment_list=fragment_list, packed=packed,
        )

    def _test_scene_device(
        self, packed, n_vox: int, num_classes: int, data_name, logger, pos, n_scenes
    ):
        """Dispatch + collect in one call (kept for subclasses/tests; the main
        `test()` loop uses the split pair below to pipeline across scenes)."""
        h = self._dispatch_scene_device(
            packed, n_vox, num_classes, data_name, logger, pos, n_scenes
        )
        return self._collect_scene_device(h, data_name)

    def _dispatch_scene_device(
        self, packed, n_vox: int, num_classes: int, data_name, logger, pos, n_scenes
    ):
        """Fragment loop with a device-resident accumulator (see
        `TesterBase.frag_accumulate`). Enqueues every transfer and forward
        WITHOUT blocking and returns a handle; `_collect_scene_device` syncs
        and fetches. The split lets `test()` keep one scene in flight: scene
        i's wire assembly + H2D put + D2H fetch hide behind scene i±1's
        device work (measured 6.5 -> ~4 s/scene on the bench tester, where
        put/host/fetch were ~3.2 s of the serial 6.5)."""
        cap = self.test_capacity
        # bucket the accumulator rows (64k granularity) so scenes of similar
        # size share one compiled update fn; rows [n_vox, n_vox + cap) are the
        # trash region fed by pad sentinels
        bucket = 65536
        rows = ((n_vox + bucket - 1) // bucket) * bucket + cap
        pred = jnp.zeros((rows, num_classes), jnp.float32)
        dropped = jnp.zeros((), jnp.int32)
        total_pts = 0
        # group fragments by voxel-grid hash: within a group the whole forward
        # geometry is shared, so the group runs as ONE dispatch (geometry once
        # + scan of B=4-batched forwards) instead of per-fragment graphs
        groups = OrderedDict()
        use_groups = True
        for rec in packed:
            total_pts += rec["n_frag"]
            if rec["gk"] is None:
                use_groups = False
            groups.setdefault(rec["gk"], []).append(rec)
        if use_groups:
            for gi, (gk, recs) in enumerate(groups.items()):
                r0 = recs[0]
                n_slots = self._slot_bucket(len(recs))
                nfloat = r0["n_feat"] + (3 if r0["with_coord"] else 0)
                big = np.empty((n_slots, (nfloat + 1) * cap), np.int32)
                for i, r in enumerate(recs):
                    big[i] = r["words"]
                if n_slots > len(recs):
                    # dummy slots: fragment 0's payload with an all-trash
                    # pred_index so its forward contributes nothing
                    big[len(recs) :] = big[0]
                    big[len(recs) :, nfloat * cap :] = n_vox + np.arange(cap, dtype=np.int32)
                fn = self.scene_accumulate(
                    num_classes, n_slots, cap, r0["grid_packed"], r0["with_coord"]
                )
                shared = jax.device_put(r0["shared"])
                words = jax.device_put(big)
                pred, dropped = fn(self.state, shared, words, pred, dropped, r0["n_feat"])
                logger.info(
                    "Test: {}/{}-{data_name}, Fragment group: {gi}/{ng} ({nf} frags)".format(
                        pos + 1, n_scenes, data_name=data_name, gi=gi + 1,
                        ng=len(groups), nf=len(recs),
                    )
                )
        else:
            fn = None
            for i, rec in enumerate(packed):
                if fn is None:
                    fn = self.frag_accumulate(rec["manifest"], num_classes)
                words = jax.device_put(rec["words"])
                pred, dropped = fn(self.state, words, pred, dropped)
                logger.info(
                    "Test: {}/{}-{data_name}, Fragment batch: {batch_idx}/{total_batch}".format(
                        pos + 1, n_scenes, data_name=data_name, batch_idx=i,
                        total_batch=len(packed),
                    )
                )
        return dict(
            pred=pred, dropped=dropped, total_pts=total_pts, n_vox=n_vox,
            num_classes=num_classes, bucket=bucket,
        )

    def _collect_scene_device(self, handle, data_name):
        """Sync + fetch one dispatched scene: overflow check, then the pred
        through a dense 1-D staging buffer: a [N, C] f32 array tiles
        to (8, 128) lanes on TPU (C=20 -> 6.4x padding), and the de-tiling
        D2H measured ~8 MB/s through the tunnel (1.9 s/scene); the on-device
        flatten costs ~3 ms and the 1-D transfer is dense. The fetch length
        shares the accumulator's 64k row bucketing so the tiny flatten
        program compiles once per bucket, not per scene."""
        n_vox, num_classes, bucket = handle["n_vox"], handle["num_classes"], handle["bucket"]
        self.check_dropped(int(handle["dropped"]), max(handle["total_pts"], 1), data_name)
        fetch_rows = ((n_vox + bucket - 1) // bucket) * bucket
        cache = getattr(self, "_fetch_cache", None)
        if cache is None:
            cache = self._fetch_cache = {}
        key = (fetch_rows, num_classes)
        if key not in cache:
            cache[key] = jax.jit(lambda p: p[:fetch_rows].reshape(-1))
        out = np.asarray(cache[key](handle["pred"]))
        return out[: n_vox * num_classes].reshape(n_vox, num_classes)

    def test(self):
        assert self.cfg.get("batch_size_test_per_gpu", 1) == 1
        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")

        batch_time = AverageMeter()
        num_classes = self.cfg.data.num_classes
        ignore_index = self.cfg.data.get("ignore_index", -1)
        save_path = os.path.join(self.cfg.save_path, "result")
        make_dirs(save_path)
        submit_dir = None
        if self.cfg.data.test.get("submit", False):
            submit_dir = os.path.join(save_path, "submit")
            make_dirs(submit_dir)
            if self.cfg.data.test.type == "NuScenesDataset":
                # nuScenes lidarseg challenge requires a meta manifest
                import json

                make_dirs(os.path.join(submit_dir, "test"))
                meta = dict(
                    meta=dict(
                        use_camera=False, use_lidar=True, use_radar=False,
                        use_map=False, use_external=False,
                    )
                )
                with open(os.path.join(submit_dir, "test", "submission.json"), "w") as f:
                    json.dump(meta, f, indent=4)

        record = {}
        indices = self.scene_indices()
        fast = (
            self.cfg.get("device_accumulate", True) and self.supports_device_accumulate
        )
        pool = fut = None
        if fast and len(indices) > 0:
            # one prefetch thread: scene i+1's dataset load + fragment packing
            # (numpy-heavy) overlaps scene i's device loop
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            fut = pool.submit(self._prepare_scene, indices[0], fast, save_path)

        # one scene stays IN FLIGHT on the device: scene i's wire assembly +
        # H2D puts + dispatches are enqueued, then scene i-1 is collected
        # (sync + fetch + metrics) while the device executes scene i — the
        # host-side ~3 s/scene (put/assembly/fetch, measured on the bench
        # tester) hides behind the ~3.3 s of device work per scene
        inflight = []

        def finish_scene(pred, data_dict, segment, data_name, pos, end, save_pred):
            if save_pred:
                if "origin_segment" in data_dict:
                    assert "inverse" in data_dict
                    pred = pred[data_dict["inverse"]]
                    segment = data_dict["origin_segment"]
                np.save(os.path.join(save_path, "{}_pred.npy".format(data_name)), pred)
            pred_label = np.argmax(pred, axis=-1)
            if submit_dir is not None:
                self.write_submission(submit_dir, data_name, pred_label)
            intersection, union, target = intersection_and_union(
                pred_label, segment, num_classes, ignore_index
            )
            record[data_name] = dict(intersection=intersection, union=union, target=target)
            mask = union != 0
            iou_class = intersection / (union + 1e-10)
            iou = np.mean(iou_class[mask])
            acc = sum(intersection) / (sum(target) + 1e-10)
            batch_time.update(time.time() - end)
            logger.info(
                "Test: {} [{}/{}]-{} "
                "Batch {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                "Accuracy {acc:.4f} ({m_acc:.4f}) "
                "mIoU {iou:.4f}".format(
                    data_name, pos + 1, len(indices), segment.size,
                    batch_time=batch_time, acc=acc, m_acc=0.0, iou=iou,
                )
            )

        def flush_inflight():
            if inflight:
                handle, dd, seg, name, p, end = inflight.pop()
                pred = self._collect_scene_device(handle, name)
                finish_scene(pred, dd, seg, name, p, end, save_pred=True)

        for pos, idx in enumerate(indices):
            end = time.time()
            if fut is not None:
                prep = fut.result()
                fut = (
                    pool.submit(self._prepare_scene, indices[pos + 1], fast, save_path)
                    if pos + 1 < len(indices)
                    else None
                )
                data_dict = prep["data_dict"]
                fragment_list = prep["fragment_list"]
                segment = prep["segment"]
                data_name = prep["data_name"]
                packed = prep["packed"]
            else:
                data_dict = self.test_dataset[idx]
                fragment_list = data_dict.pop("fragment_list")
                segment = data_dict.pop("segment")
                data_name = data_dict.pop("name")
                packed = None
            pred_save_path = os.path.join(save_path, "{}_pred.npy".format(data_name))
            if os.path.isfile(pred_save_path):
                flush_inflight()
                logger.info("{}/{}: {}, loaded pred and label.".format(pos + 1, len(indices), data_name))
                pred = np.load(pred_save_path)
                if "origin_segment" in data_dict:
                    segment = data_dict["origin_segment"]
                finish_scene(pred, data_dict, segment, data_name, pos, end, save_pred=False)
                continue
            else:
                cap = self.test_capacity
                if packed is not None:
                    handle = self._dispatch_scene_device(
                        packed, segment.size, num_classes, data_name,
                        logger, pos, len(indices),
                    )
                    flush_inflight()
                    inflight.append((handle, data_dict, segment, data_name, pos, end))
                    continue
                else:
                    flush_inflight()
                    pred = np.zeros((segment.size, num_classes), dtype=np.float32)
                    for i, fragment in enumerate(fragment_list):
                        index = fragment.pop("index")
                        n_frag = fragment["coord"].shape[0]
                        if n_frag > cap:
                            raise ValueError(
                                f"fragment has {n_frag} points > point_capacity_test {cap}"
                            )
                        batch = self.fragment_batch(fragment)
                        arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "num_scenes"}
                        probs, dropped = self.infer_diag(self.state, arrays)
                        self.check_dropped(int(dropped), n_frag, f"{data_name} fragment {i}")
                        probs = np.asarray(probs)[:n_frag]
                        np.add.at(pred, index, probs)
                        logger.info(
                            "Test: {}/{}-{data_name}, Fragment batch: {batch_idx}/{total_batch}".format(
                                pos + 1, len(indices), data_name=data_name, batch_idx=i, total_batch=len(fragment_list)
                            )
                        )
                finish_scene(pred, data_dict, segment, data_name, pos, end, save_pred=True)

        flush_inflight()
        if pool is not None:
            pool.shutdown(wait=False)
        logger.info("Syncing ...")
        comm.synchronize()
        record_sync = comm.gather(record, dst=0)

        if comm.is_main_process():
            record = {}
            for rec in record_sync:
                record.update(rec)
            intersection = np.sum([meters["intersection"] for meters in record.values()], axis=0)
            union = np.sum([meters["union"] for meters in record.values()], axis=0)
            target = np.sum([meters["target"] for meters in record.values()], axis=0)
            # aggregate record for cross-fold evaluation (tools/test_s3dis_6fold.py)
            np.savez(
                os.path.join(save_path, "record.npz"),
                intersection=intersection, union=union, target=target,
            )

            iou_class = intersection / (union + 1e-10)
            accuracy_class = intersection / (target + 1e-10)
            mIoU = np.mean(iou_class)
            mAcc = np.mean(accuracy_class)
            allAcc = sum(intersection) / (sum(target) + 1e-10)

            logger.info("Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}".format(mIoU, mAcc, allAcc))
            names = self.cfg.data.get("names", [str(i) for i in range(num_classes)])
            for i in range(num_classes):
                logger.info(
                    "Class_{idx} - {name} Result: iou/accuracy {iou:.4f}/{accuracy:.4f}".format(
                        idx=i, name=names[i], iou=iou_class[i], accuracy=accuracy_class[i]
                    )
                )
            logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
            return dict(mIoU=float(mIoU), mAcc=float(mAcc), allAcc=float(allAcc))
        return None

    def write_submission(self, submit_dir, data_name, pred_label):
        """Benchmark submission writers (reference test.py:226-280):
        ScanNet/S3DIS txt, SemanticKITTI .label (learning_map_inv, uint32),
        nuScenes lidarseg .bin (learning_map_inv, uint8)."""
        ds_type = self.cfg.data.test.type
        if ds_type in ("ScanNetDataset", "ScanNet200Dataset"):
            from pointcept_tpu.datasets.scannet import ScanNetDataset

            np.savetxt(
                os.path.join(submit_dir, f"{data_name}.txt"),
                ScanNetDataset.class2id[pred_label].reshape([-1, 1]),
                fmt="%d",
            )
        elif ds_type == "SemanticKITTIDataset":
            # data_name: "<sequence>_<frame>" -> sequences/<seq>/predictions/<frame>.label
            sequence_name, frame_name = data_name.split("_")
            pred_dir = os.path.join(submit_dir, "sequences", sequence_name, "predictions")
            make_dirs(pred_dir)
            inv = self.test_dataset.learning_map_inv
            submit = np.vectorize(inv.__getitem__)(pred_label.astype(np.int64)).astype(np.uint32)
            submit.tofile(os.path.join(pred_dir, f"{frame_name}.label"))
        elif ds_type == "NuScenesDataset":
            lidarseg_dir = os.path.join(submit_dir, "lidarseg", "test")
            make_dirs(lidarseg_dir)
            inv = self.test_dataset.learning_map_inv
            submit = np.vectorize(inv.__getitem__)(pred_label.astype(np.int64)).astype(np.uint8)
            submit.tofile(os.path.join(lidarseg_dir, f"{data_name}_lidarseg.bin"))
        else:
            np.save(os.path.join(submit_dir, f"{data_name}_pred.npy"), pred_label)


@TESTERS.register_module()
class DINOSemSegTester(SemSegTester):
    """SemSegTester variant for DINOEnhancedSegmentor (reference test.py:361):
    each fragment forward additionally receives the scene's 2D DINO feature
    point cloud (dino_coord/dino_feat), padded to a static capacity."""

    supports_device_accumulate = False

    def __init__(self, cfg, model=None, state=None, verbose=False, dino_capacity=65536):
        self.dino_capacity = dino_capacity
        super().__init__(cfg, model=model, state=state, verbose=verbose)

    def _pad_dino(self, data_dict):
        dc = np.asarray(data_dict["dino_coord"], np.float32)
        df = np.asarray(data_dict["dino_feat"], np.float32)
        m = self.dino_capacity
        n = min(len(dc), m)
        coord = np.zeros((m, 3), np.float32)
        feat = np.zeros((m, df.shape[1]), np.float32)
        batch = np.full((m,), -1, np.int32)
        coord[:n], feat[:n], batch[:n] = dc[:n], df[:n], 0
        return jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(batch)

    @property
    def infer(self):
        if self._infer_fn is None:
            model = self.model

            @jax.jit
            def infer_fn(state, arrays, dino_coord, dino_feat, dino_batch):
                pb = make_point_batch(arrays, 1)
                data = dict(point=pb, dino_coord=dino_coord, dino_feat=dino_feat, dino_batch=dino_batch)
                out = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats}, data, train=False
                )
                return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)

            self._infer_fn = infer_fn
        return self._infer_fn

    @property
    def infer_diag(self):
        if getattr(self, "_infer_diag_fn", None) is None:
            model = self.model

            @jax.jit
            def infer_fn(state, arrays, dino_coord, dino_feat, dino_batch):
                pb = make_point_batch(arrays, 1)
                data = dict(point=pb, dino_coord=dino_coord, dino_feat=dino_feat, dino_batch=dino_batch)
                out, st = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    data, train=False, mutable=["diagnostics"],
                )
                leaves = jax.tree_util.tree_leaves(st.get("diagnostics", {}))
                dropped = (
                    sum(jnp.sum(l).astype(jnp.int32) for l in leaves)
                    if leaves
                    else jnp.int32(0)
                )
                return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1), dropped

            self._infer_diag_fn = infer_fn
        return self._infer_diag_fn

    def test(self):
        # wrap the base loop: stash dino arrays per scene and curry them into
        # infer/infer_diag (the fragment loop consumes infer_diag)
        base_infer = self.infer
        base_diag = self.infer_diag
        outer = self

        class _Shim:
            def __call__(self, state, arrays):
                return base_infer(state, arrays, *outer._dino)

        class _ShimDiag:
            def __call__(self, state, arrays):
                return base_diag(state, arrays, *outer._dino)

        orig_dataset = self.test_dataset

        class _DS:
            def __len__(self):
                return len(orig_dataset)

            def __getitem__(self, idx):
                d = orig_dataset[idx]
                outer._dino = outer._pad_dino(d)
                d.pop("dino_coord", None), d.pop("dino_feat", None), d.pop("dino_offset", None)
                for frag in d.get("fragment_list", []):
                    frag.pop("dino_coord", None), frag.pop("dino_feat", None), frag.pop("dino_offset", None)
                return d

        self._infer_fn = _Shim()
        self._infer_diag_fn = _ShimDiag()
        self.test_dataset = _DS()
        try:
            return super().test()
        finally:
            self.test_dataset = orig_dataset
            self._infer_fn = None
            self._infer_diag_fn = None


@TESTERS.register_module()
class ClsTester(TesterBase):
    def test(self):
        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = self.cfg.data.num_classes
        intersection_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)

        model = self.model

        @jax.jit
        def infer_cls(state, arrays, category):
            pb = make_point_batch(arrays, 1)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pb,
                train=False,
                category=category,
            )
            return out["cls_logits"]

        indices = self.scene_indices()
        for pos, idx in enumerate(indices):
            data = self.test_dataset[idx]
            category = int(np.asarray(data["category"]).reshape(-1)[0])
            batch = self.fragment_batch(data)
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("num_scenes", "category")}
            logits = np.asarray(infer_cls(self.state, arrays, jnp.asarray([category])))
            pred = int(logits[0].argmax())
            i, u, t = intersection_and_union(np.array([pred]), np.array([category]), num_classes)
            intersection_sum += i
            union_sum += u
            target_sum += t
            logger.info(f"Test: [{pos + 1}/{len(indices)}] {data.get('name', idx)} pred {pred} gt {category}")

        comm.synchronize()
        recs = comm.all_gather((intersection_sum, union_sum, target_sum))
        intersection = np.sum([r[0] for r in recs], axis=0)
        union = np.sum([r[1] for r in recs], axis=0)
        target = np.sum([r[2] for r in recs], axis=0)
        iou_class = intersection / (union + 1e-10)
        acc_class = intersection / (target + 1e-10)
        mIoU, mAcc = np.mean(iou_class), np.mean(acc_class)
        allAcc = sum(intersection) / (sum(target) + 1e-10)
        logger.info("Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}".format(mIoU, mAcc, allAcc))
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(allAcc=float(allAcc))


@TESTERS.register_module()
class InsSegTester(TesterBase):
    """Instance segmentation tester (reference `engines/test.py:1159`):
    per-scene forward -> host BFS clustering -> ScanNet-protocol mAP."""

    def __init__(self, cfg, model=None, state=None, verbose=False, segment_ignore_index=(-1, 0, 1)):
        super().__init__(cfg, model=model, state=state, verbose=verbose)
        self.segment_ignore_index = segment_ignore_index
        self.valid_class_names = None

    @property
    def infer(self):
        if self._infer_fn is None:
            model = self.model

            @jax.jit
            def infer_fn(state, arrays):
                pb = make_point_batch(arrays, 1)
                out = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats}, pb, train=False
                )
                return (
                    jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1),
                    out["bias_pred"],
                )

            self._infer_fn = infer_fn
        return self._infer_fn

    def test(self):
        from pointcept_tpu.utils.instance_eval import aggregate_ap, evaluate_scene

        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = self.cfg.data.num_classes - sum(
            1 for i in self.segment_ignore_index if i >= 0
        )
        # the model wrapper (PG) exposes the host-side proposal step
        pg = self.model

        all_records = {c: [] for c in range(num_classes)}
        all_gt_counts = {c: 0 for c in range(num_classes)}
        indices = self.scene_indices()
        for pos, idx in enumerate(indices):
            data_dict = self.test_dataset[idx]
            if "fragment_list" in data_dict:
                fragment = data_dict["fragment_list"][0]
                gt_segment = data_dict["segment"]
                gt_instance = data_dict.get("instance", np.full_like(gt_segment, -1))
            else:
                fragment = data_dict
                gt_segment = fragment.get("segment")
                gt_instance = fragment.get("instance", np.full_like(gt_segment, -1))
            n_frag = fragment["coord"].shape[0]
            batch = self.fragment_batch(dict(fragment))
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "num_scenes"}
            seg_prob, bias = self.infer(self.state, arrays)
            seg_prob = np.asarray(seg_prob)[:n_frag]
            bias = np.asarray(bias)[:n_frag]
            masks, classes, scores = pg.propose_instances(
                fragment["coord"], bias, seg_prob, np.zeros(n_frag, np.int32), np.ones(n_frag, bool)
            )
            recs, counts = evaluate_scene(
                masks, classes, scores,
                np.asarray(gt_instance)[:n_frag],
                np.asarray(gt_segment)[:n_frag],
                num_classes,
                self.segment_ignore_index,
            )
            for c, lst in recs.items():
                for score, ious in lst:
                    all_records[c].append((score, ious, pos))
            for c, cnt in counts.items():
                all_gt_counts[c] += cnt
            if self.cfg.data.test.get("submit", False):
                self.write_submission(str(data_dict.get("name", idx)), masks, classes, scores)
            logger.info(f"Test: [{pos + 1}/{len(indices)}] {data_dict.get('name', idx)} proposals {len(scores)}")

        comm.synchronize()
        gathered = comm.all_gather((all_records, all_gt_counts))
        merged_records = {c: [] for c in range(num_classes)}
        merged_counts = {c: 0 for c in range(num_classes)}
        for recs, counts in gathered:
            for c in recs:
                merged_records[c].extend(recs[c])
            for c in counts:
                merged_counts[c] += counts[c]
        result = aggregate_ap(merged_records, merged_counts, num_classes)
        logger.info(
            "Val result: mAP/AP50/AP25 {:.4f}/{:.4f}/{:.4f}".format(
                result["mAP"], result["AP50"], result["AP25"]
            )
        )
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return result

    def write_submission(self, data_name, masks, classes, scores):
        """ScanNet/ScanNet++ instance benchmark format (reference test.py:1266-1303):
        per-scene txt manifest + per-instance binary-RLE json masks."""
        import json

        save_dir = os.path.join(self.cfg.save_path, "result", "submit")
        mask_dir = os.path.join(save_dir, "predicted_masks")
        make_dirs(mask_dir)
        lines = []
        for i, (mask, cls, score) in enumerate(zip(masks, classes, scores)):
            mask = np.asarray(mask).astype(np.uint8)
            length = mask.shape[0]
            padded = np.concatenate([[0], mask, [0]])
            runs = np.where(padded[1:] != padded[:-1])[0] + 1
            runs[1::2] -= runs[::2]
            rle = dict(length=int(length), counts=" ".join(str(int(x)) for x in runs))
            rel = os.path.join("predicted_masks", f"{data_name}_{i:03d}.json")
            with open(os.path.join(mask_dir, f"{data_name}_{i:03d}.json"), "w") as f:
                json.dump(rle, f, indent=2)
            lines.append(f"{rel} {int(cls)} {float(score):.4f}")
        with open(os.path.join(save_dir, f"{data_name}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))


@TESTERS.register_module()
class ClsVotingTester(TesterBase):
    """TTA voting classification tester (reference `engines/test.py:724`):
    average logits over `num_repeat` augmented passes per sample."""

    def __init__(self, cfg, model=None, state=None, verbose=False, num_repeat=100, metric="allAcc"):
        super().__init__(cfg, model=model, state=state, verbose=verbose)
        self.num_repeat = num_repeat
        self.metric = metric

    def test(self):
        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = self.cfg.data.num_classes
        model = self.model

        @jax.jit
        def infer_cls(state, arrays, category):
            pb = make_point_batch(arrays, 1)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pb, train=False, category=category,
            )
            return jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1)

        intersection_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        indices = self.scene_indices()
        for pos, idx in enumerate(indices):
            record = np.zeros(num_classes, np.float64)
            category = None
            for _ in range(self.num_repeat):
                data = self.test_dataset[idx]  # re-runs random TTA transforms
                category = int(np.asarray(data["category"]).reshape(-1)[0])
                batch = self.fragment_batch(data)
                arrays = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("num_scenes", "category")}
                record += np.asarray(infer_cls(self.state, arrays, jnp.asarray([category])))[0]
            pred = int(record.argmax())
            i, u, t = intersection_and_union(np.array([pred]), np.array([category]), num_classes)
            intersection_sum += i
            union_sum += u
            target_sum += t
            logger.info(f"Test: [{pos + 1}/{len(indices)}] pred {pred} gt {category}")
        comm.synchronize()
        recs = comm.all_gather((intersection_sum, union_sum, target_sum))
        intersection = np.sum([r[0] for r in recs], axis=0)
        union = np.sum([r[1] for r in recs], axis=0)
        target = np.sum([r[2] for r in recs], axis=0)
        mAcc = float(np.mean(intersection / (target + 1e-10)))
        allAcc = float(intersection.sum() / (target.sum() + 1e-10))
        logger.info("Val result: mAcc/allAcc {:.4f}/{:.4f}".format(mAcc, allAcc))
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(allAcc=allAcc, mAcc=mAcc)


@TESTERS.register_module()
class ShapeNetPartSegTester(TesterBase):
    """Part segmentation tester (reference `engines/test.py:841`): per-category
    part-IoU with logits masked to the sample's category part range."""

    def test(self):
        from pointcept_tpu.datasets.shapenet_part import ShapeNetPartDataset

        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        cat2part = ShapeNetPartDataset.category2part
        categories = ShapeNetPartDataset.categories
        num_categories = len(categories)
        iou_per_cat = {c: [] for c in range(num_categories)}

        indices = self.scene_indices()
        for pos, idx in enumerate(indices):
            data = self.test_dataset[idx]
            cat = int(np.asarray(data["category"]).reshape(-1)[0])
            parts = cat2part[categories[cat]]
            n = data["coord"].shape[0]
            batch = self.fragment_batch(dict(data))
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("num_scenes", "category")}
            probs = np.asarray(self.infer(self.state, arrays))[:n]
            masked = np.full_like(probs, -1e9)
            masked[:, parts] = probs[:, parts]
            pred = masked.argmax(-1)
            seg = np.asarray(data["segment"])[:n]
            ious = []
            for p in parts:
                i = ((pred == p) & (seg == p)).sum()
                u = ((pred == p) | (seg == p)).sum()
                ious.append(i / u if u > 0 else 1.0)
            iou_per_cat[cat].append(float(np.mean(ious)))
            logger.info(f"Test: [{pos + 1}/{len(indices)}] cat {categories[cat]} iou {iou_per_cat[cat][-1]:.4f}")

        comm.synchronize()
        gathered = comm.all_gather(iou_per_cat)
        merged = {c: [] for c in range(num_categories)}
        for g in gathered:
            for c, lst in g.items():
                merged[c].extend(lst)
        ins_iou = float(np.mean([v for lst in merged.values() for v in lst])) if any(merged.values()) else 0.0
        cat_iou = float(np.mean([np.mean(lst) for lst in merged.values() if lst])) if any(merged.values()) else 0.0
        logger.info("Val result: ins.mIoU/cat.mIoU {:.4f}/{:.4f}".format(ins_iou, cat_iou))
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(ins_miou=ins_iou, cat_miou=cat_iou)


@TESTERS.register_module()
class PartNetEPartSegTester(TesterBase):
    """PartNetE category-conditioned part-seg tester (reference
    `engines/test.py:992-1158`): per-sample IoU for each present part of the
    sample's category (skipping the per-category "other" part), accumulated
    into global per-part averages; reports part-mean and category-mean IoU."""

    def test(self):
        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        ds = self.test_dataset
        num_parts_total = int(sum(ds.num_parts))
        iou_sum = np.zeros(num_parts_total, np.float64)
        iou_cnt = np.zeros(num_parts_total, np.float64)

        indices = self.scene_indices()
        for pos, idx in enumerate(indices):
            data_dict = ds[idx]
            fragment_list = data_dict.pop("fragment_list", None)
            segment = np.asarray(data_dict.pop("segment"))
            data_name = data_dict.pop("name", str(idx))
            if fragment_list is None:
                fragment_list = [data_dict]
            cls_token = int(np.asarray(fragment_list[0]["cls_token"]).reshape(-1)[0])
            category = ds.categories[cls_token]
            parts_idx = ds.category2part[category]

            pred = np.zeros((segment.size, self.cfg.data.num_classes), np.float32)
            for frag in fragment_list:
                frag = dict(frag)
                frag.pop("cls_token", None)
                index = frag.pop("index", np.arange(segment.size))
                n_frag = frag["coord"].shape[0]
                batch = self.fragment_batch(frag)
                arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "num_scenes"}
                probs = np.asarray(self.infer(self.state, arrays))[:n_frag]
                np.add.at(pred, np.asarray(index), probs)
            if "origin_segment" in data_dict:
                pred = pred[data_dict["inverse"]]
                segment = np.asarray(data_dict["origin_segment"])
            pred_label = pred.argmax(-1)

            for k, part_id in enumerate(parts_idx):
                if k == 0:  # "other" part excluded (reference :1072)
                    continue
                gid = part_id + 1  # +1: global label space leads with shift
                if (segment == gid).sum() == 0 and (pred_label == gid).sum() == 0:
                    continue
                inter = float(((segment == gid) & (pred_label == gid)).sum())
                union = float(((segment == gid) | (pred_label == gid)).sum())
                slot = int(part_id)
                iou_sum[slot] += inter / (union + 1e-10)
                iou_cnt[slot] += 1
            logger.info(f"Test: [{pos + 1}/{len(indices)}] {data_name} ({category})")

        comm.synchronize()
        gathered = comm.all_gather((iou_sum, iou_cnt))
        iou_sum = sum(g[0] for g in gathered)
        iou_cnt = sum(g[1] for g in gathered)
        present = iou_cnt > 0
        part_iou = np.where(present, iou_sum / np.maximum(iou_cnt, 1), 0.0)
        miou = float(part_iou[present].mean()) if present.any() else 0.0
        cat_ious = []
        for ci, cat in enumerate(ds.categories):
            ids = [p for k, p in enumerate(ds.category2part[cat]) if k > 0 and present[p]]
            if ids:
                cat_ious.append(float(np.mean([part_iou[p] for p in ids])))
        cat_miou = float(np.mean(cat_ious)) if cat_ious else 0.0
        logger.info("Val result: part.mIoU/cat.mIoU {:.4f}/{:.4f}".format(miou, cat_miou))
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(part_miou=miou, cat_miou=cat_miou)
