"""Per-epoch evaluators (voxel-level val).

Parity: reference `pointcept/engines/hooks/evaluator.py` — `SemSegEvaluator:118`
(per-epoch val mIoU/mAcc/allAcc with cross-device reduction), `ClsEvaluator:23`.
Cross-device reduction happens inside the jitted eval step (psum over the mesh);
hooks only aggregate host-side numpy.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pointcept_tpu.engines.hooks.builder import HOOKS
from pointcept_tpu.engines.hooks.default import HookBase


@HOOKS.register_module()
class SemSegEvaluator(HookBase):
    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = trainer.cfg.data.num_classes
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        losses = []
        for i, batch in enumerate(trainer.val_loader):
            arrays = trainer._to_global(batch)
            res = trainer.eval_step(trainer.state, arrays, batch.get("condition"))
            inter = np.asarray(res["intersection"])
            union = np.asarray(res["union"])
            target = np.asarray(res["target"])
            losses.append(float(res["loss"]))
            inter_sum += inter
            union_sum += union
            target_sum += target
            iou = inter.sum() / (union.sum() + 1e-10)
            acc = inter.sum() / (target.sum() + 1e-10)
            trainer.logger.info(
                "Test: [{iter}/{max_iter}] Loss {loss:.4f} Batch iou {iou:.4f} acc {acc:.4f}".format(
                    iter=i + 1, max_iter=len(trainer.val_loader), loss=losses[-1], iou=iou, acc=acc
                )
            )
        iou_class = inter_sum / (union_sum + 1e-10)
        acc_class = inter_sum / (target_sum + 1e-10)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter_sum.sum() / (target_sum.sum() + 1e-10))
        trainer.logger.info(
            "Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}.".format(m_iou, m_acc, all_acc)
        )
        names = trainer.cfg.data.get("names", [str(i) for i in range(num_classes)])
        for i in range(num_classes):
            trainer.logger.info(
                "Class_{idx}-{name} Result: iou/accuracy {iou:.4f}/{accuracy:.4f}".format(
                    idx=i, name=names[i], iou=iou_class[i], accuracy=acc_class[i]
                )
            )
        current_epoch = trainer.epoch + 1
        if trainer.storage is not None:
            trainer.storage.put_scalar("val/loss", float(np.mean(losses)), smoothing_hint=False)
            trainer.storage.put_scalar("val/mIoU", m_iou, smoothing_hint=False)
            trainer.storage.put_scalar("val/mAcc", m_acc, smoothing_hint=False)
            trainer.storage.put_scalar("val/allAcc", all_acc, smoothing_hint=False)
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = m_iou
        trainer.comm_info["current_metric_name"] = "mIoU"

    def after_train(self):
        self.trainer.logger.info(
            "Best {}: {:.4f}".format("mIoU", self.trainer.best_metric_value)
        )


@HOOKS.register_module()
class ClsEvaluator(HookBase):
    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        import jax

        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        num_classes = trainer.cfg.data.num_classes
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        losses = []
        for i, batch in enumerate(trainer.val_loader):
            arrays = trainer._to_global(batch)
            res = trainer.cls_eval_step(trainer.state, arrays)
            inter_sum += np.asarray(res["intersection"])
            union_sum += np.asarray(res["union"])
            target_sum += np.asarray(res["target"])
            losses.append(float(res["loss"]))
        iou_class = inter_sum / (union_sum + 1e-10)
        acc_class = inter_sum / (target_sum + 1e-10)
        m_iou = float(np.mean(iou_class))
        m_acc = float(np.mean(acc_class))
        all_acc = float(inter_sum.sum() / (target_sum.sum() + 1e-10))
        trainer.logger.info(
            "Val result: mIoU/mAcc/allAcc {:.4f}/{:.4f}/{:.4f}.".format(m_iou, m_acc, all_acc)
        )
        if trainer.storage is not None:
            trainer.storage.put_scalar("val/loss", float(np.mean(losses)), smoothing_hint=False)
            trainer.storage.put_scalar("val/mAcc", m_acc, smoothing_hint=False)
            trainer.storage.put_scalar("val/allAcc", all_acc, smoothing_hint=False)
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = all_acc
        trainer.comm_info["current_metric_name"] = "allAcc"

    def after_train(self):
        self.trainer.logger.info("Best {}: {:.4f}".format("allAcc", self.trainer.best_metric_value))


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    """Per-epoch instance-seg eval (reference `hooks/evaluator.py:247`): runs the
    PointGroup proposal path on the val loader and reports mAP/AP50/AP25."""

    def __init__(self, segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1):
        self.segment_ignore_index = segment_ignore_index
        self.instance_ignore_index = instance_ignore_index

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        import jax
        from pointcept_tpu.utils.instance_eval import aggregate_ap, evaluate_scene

        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        model = trainer.model
        num_classes = trainer.cfg.data.num_classes - sum(1 for i in self.segment_ignore_index if i >= 0)
        all_records = {c: [] for c in range(num_classes)}
        all_gt = {c: 0 for c in range(num_classes)}
        scene_counter = 0
        for bi, batch in enumerate(trainer.val_loader):
            arrays = {k: jnp.asarray(v[0]) for k, v in batch.items() if k not in ("num_scenes", "condition")}
            from pointcept_tpu.engines.train import make_point_batch

            pb = make_point_batch(arrays, batch["num_scenes"])
            out = model.apply(
                {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
                pb, train=False,
            )
            seg_prob = np.asarray(jax.nn.softmax(out["seg_logits"], -1))
            bias = np.asarray(out["bias_pred"])
            masks, classes, scores = model.propose_instances(
                np.asarray(pb.coord), bias, seg_prob, np.asarray(pb.batch), np.asarray(pb.mask)
            )
            recs, counts = evaluate_scene(
                masks, classes, scores,
                np.asarray(pb.instance), np.asarray(pb.segment),
                num_classes, self.segment_ignore_index,
            )
            for c, lst in recs.items():
                for score, ious in lst:
                    all_records[c].append((score, ious, scene_counter))
            for c, cnt in counts.items():
                all_gt[c] += cnt
            scene_counter += 1
        result = aggregate_ap(all_records, all_gt, num_classes)
        trainer.logger.info(
            "Val result: mAP/AP50/AP25 {:.4f}/{:.4f}/{:.4f}".format(result["mAP"], result["AP50"], result["AP25"])
        )
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = result["mAP"]
        trainer.comm_info["current_metric_name"] = "mAP"


@HOOKS.register_module()
class ShapeNetPartSegEvaluator(HookBase):
    """Per-epoch part-seg eval (reference hooks/evaluator.py:648): per-sample
    category-masked part IoU, reported as instance-mean and category-mean."""

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        import jax
        from pointcept_tpu.datasets.shapenet_part import ShapeNetPartDataset
        from pointcept_tpu.engines.train import make_point_batch

        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        model = trainer.model
        cat2part = ShapeNetPartDataset.category2part
        categories = ShapeNetPartDataset.categories
        iou_per_cat = {c: [] for c in range(len(categories))}
        for batch in trainer.val_loader:
            arrays = {k: jnp.asarray(v[0]) for k, v in batch.items() if k not in ("num_scenes", "condition")}
            cats = np.asarray(arrays.pop("category"))
            pb = make_point_batch(arrays, batch["num_scenes"])
            out = model.apply(
                {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
                pb, train=False, category=jnp.asarray(cats),
            ) if "category" in model.__call__.__code__.co_varnames else model.apply(
                {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
                pb, train=False,
            )
            logits = np.asarray(out["seg_logits"] if isinstance(out, dict) else out.feat)
            seg = np.asarray(pb.segment)
            bidx = np.asarray(pb.batch)
            for s, cat in enumerate(cats):
                if cat < 0:
                    continue
                sel = bidx == s
                parts = cat2part[categories[int(cat)]]
                masked = np.full_like(logits[sel], -1e9)
                masked[:, parts] = logits[sel][:, parts]
                pred = masked.argmax(-1)
                gt = seg[sel]
                ious = []
                for p in parts:
                    u = ((pred == p) | (gt == p)).sum()
                    ious.append(((pred == p) & (gt == p)).sum() / u if u > 0 else 1.0)
                iou_per_cat[int(cat)].append(float(np.mean(ious)))
        vals = [v for lst in iou_per_cat.values() for v in lst]
        ins_miou = float(np.mean(vals)) if vals else 0.0
        cat_miou = float(np.mean([np.mean(l) for l in iou_per_cat.values() if l])) if vals else 0.0
        trainer.logger.info("Val result: ins.mIoU/cat.mIoU {:.4f}/{:.4f}".format(ins_miou, cat_miou))
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = ins_miou
        trainer.comm_info["current_metric_name"] = "ins.mIoU"


@HOOKS.register_module()
class PartNetEPartSegEvaluator(HookBase):
    """Per-epoch PartNetE eval (reference hooks/evaluator.py:790): per-part IoU
    accumulation over the category's parts (skipping "other")."""

    def after_epoch(self):
        if self.trainer.cfg.get("evaluate", True) and self.trainer.val_loader is not None:
            self.eval()

    def eval(self):
        from pointcept_tpu.engines.train import make_point_batch

        trainer = self.trainer
        trainer.logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        model = trainer.model
        ds = trainer.val_loader.dataset
        num_parts_total = int(sum(ds.num_parts))
        iou_sum = np.zeros(num_parts_total)
        iou_cnt = np.zeros(num_parts_total)
        for batch in trainer.val_loader:
            arrays = {k: jnp.asarray(v[0]) for k, v in batch.items() if k not in ("num_scenes", "condition", "cls_token")}
            toks = np.asarray(batch.get("cls_token", np.zeros(batch["num_scenes"], np.int32))).reshape(-1)
            pb = make_point_batch(arrays, batch["num_scenes"])
            out = model.apply(
                {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
                pb, train=False,
            )
            logits = np.asarray(out["seg_logits"] if isinstance(out, dict) else out.feat)
            seg = np.asarray(pb.segment)
            bidx = np.asarray(pb.batch)
            pred = logits.argmax(-1)
            for s, tok in enumerate(toks):
                sel = bidx == s
                parts = ds.category2part[ds.categories[int(tok)]]
                for k, part_id in enumerate(parts):
                    if k == 0:
                        continue
                    gid = part_id + 1
                    inter = ((pred[sel] == gid) & (seg[sel] == gid)).sum()
                    union = ((pred[sel] == gid) | (seg[sel] == gid)).sum()
                    if union == 0:
                        continue
                    iou_sum[part_id] += inter / union
                    iou_cnt[part_id] += 1
        present = iou_cnt > 0
        miou = float((iou_sum[present] / iou_cnt[present]).mean()) if present.any() else 0.0
        trainer.logger.info("Val result: part.mIoU {:.4f}".format(miou))
        trainer.logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        trainer.comm_info["current_metric_value"] = miou
        trainer.comm_info["current_metric_name"] = "part.mIoU"
