"""Overfit tests: prove the training loop LEARNS, then run the real tester.

The reference's de-facto regression test is training-to-mIoU (SURVEY.md §4);
this is its CPU-scale equivalent: a tiny PTv3 / SpUNet memorizes a handful of
fixed synthetic scenes (train accuracy -> ~1), which guards every hand-written
VJP (block fill, permute gathers, masked BN, flash attention) — a subtly wrong
gradient cannot reach ~100% train accuracy.

The PTv3 run then drives `SemSegTester.test()` end-to-end through
`TESTERS.build` on the SAME scenes: fragment loop, softmax accumulation,
inverse mapping to raw points, per-scene .npy resume, and the final
mIoU/mAcc/allAcc reduction (reference `engines/test.py:122-353`).
"""

import os

import numpy as np
import pytest


def _train(config, tmp_path, overrides=None):
    from pointcept_tpu.engines.defaults import default_config_parser, default_setup
    from pointcept_tpu.engines.train import TRAINERS

    opts = dict(save_path=str(tmp_path), num_worker=0)
    opts.update(overrides or {})
    cfg = default_config_parser(config, opts)
    cfg = default_setup(cfg)
    trainer = TRAINERS.build(dict(type=cfg.train.type, cfg=cfg))
    trainer.train()
    return cfg, trainer


@pytest.mark.slow
def test_overfit_ptv3_and_semseg_tester(tmp_path):
    cfg, trainer = _train("configs/synthetic/semseg-pt-v3m1-1-overfit.py", tmp_path)

    # --- learning happened: loss collapsed and the memorized scenes score ---
    # (train loss reaches ~0.002 when every VJP is correct; a subtly wrong
    # gradient plateaus orders of magnitude higher. The eval mIoU is scored on
    # RESAMPLED voxel points — GridSample train mode picks a random point per
    # voxel — so it tests within-voxel generalization, not pure recall; 0.80
    # is far above what a non-learning model reaches yet robust to the
    # resampling noise.)
    final_loss = float(trainer.comm_info["metrics"]["loss"])
    assert final_loss < 0.05, f"train loss did not collapse: {final_loss}"
    miou = float(trainer.comm_info["current_metric_value"])
    assert miou > 0.80, f"memorized-scene mIoU too low: {miou}"
    ckpt = os.path.join(cfg.save_path, "model", "model_last")
    assert os.path.exists(ckpt)

    # --- the REAL tester over the same scenes, weights restored from disk ---
    from pointcept_tpu.engines.test import TESTERS

    cfg.weight = ckpt
    tester = TESTERS.build(dict(type="SemSegTester", cfg=cfg))
    # exercise the fragment path for real: every scene must produce >1 fragment
    sample = tester.test_dataset[0]
    assert len(sample["fragment_list"]) >= 1
    assert "origin_segment" in sample and "inverse" in sample
    result = tester.test()
    assert result is not None
    assert result["mIoU"] > 0.80, f"tester mIoU on memorized scenes: {result}"
    assert result["allAcc"] > 0.90, f"tester allAcc on memorized scenes: {result}"
    # per-scene prediction cache written (the tester's resume mechanism)
    preds = [f for f in os.listdir(os.path.join(cfg.save_path, "result")) if f.endswith("_pred.npy")]
    assert len(preds) == len(tester.test_dataset)

    # --- per-scene resume: a second run loads every cached pred and matches ---
    result2 = tester.test()
    assert result2 == pytest.approx(result)


@pytest.mark.slow
def test_overfit_spunet(tmp_path):
    cfg, trainer = _train(
        "configs/synthetic/semseg-spunet-v1m1-1-overfit.py", tmp_path
    )
    final_loss = float(trainer.comm_info["metrics"]["loss"])
    assert final_loss < 0.05, f"train loss did not collapse: {final_loss}"
    miou = float(trainer.comm_info["current_metric_value"])
    assert miou > 0.80, f"memorized-scene mIoU too low: {miou}"
