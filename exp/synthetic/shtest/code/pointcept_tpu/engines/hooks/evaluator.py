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
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "num_scenes"}
            res = trainer.eval_step(trainer.state, arrays)
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
            arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "num_scenes"}
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
