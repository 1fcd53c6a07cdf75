import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcept_tpu.models import build_model
from tests.test_structure import make_batch
from tests.test_ptv3 import small_ptv3_cfg


@pytest.fixture(scope="module")
def ppt_model_and_pb():
    pb = make_batch([100, 60], capacity=256, num_classes=20)
    backbone = small_ptv3_cfg(
        pdnorm_bn=True,
        pdnorm_ln=True,
        pdnorm_decouple=True,
        pdnorm_adaptive=False,
        pdnorm_conditions=("Structured3D", "ScanNet", "S3DIS"),
    )
    cfg = dict(
        type="PPT-v1m1",
        backbone=backbone,
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
        backbone_out_channels=16,
        context_channels=32,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        clip_embed_dim=64,
    )
    model = build_model(cfg)
    return model, pb


def test_ppt_language_guided_forward(ppt_model_and_pb):
    model, pb = ppt_model_and_pb
    pb_sc = pb.replace(condition="ScanNet")
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb_sc, train=False)
    out = model.apply(variables, pb_sc, train=False)
    assert out["seg_logits"].shape == (256, 20)  # ScanNet valid_index has 20 entries
    assert np.isfinite(float(out["loss"]))

    # different condition -> different logit width (S3DIS: 13)
    pb_s3 = pb.replace(condition="S3DIS", segment=jnp.clip(pb.segment, -1, 12))
    out2 = model.apply(variables, pb_s3, train=False)
    assert out2["seg_logits"].shape == (256, 13)


def test_ppt_pdnorm_params_cover_all_conditions(ppt_model_and_pb):
    model, pb = ppt_model_and_pb
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb.replace(condition="ScanNet"), train=False)
    # every decoupled PDNorm should have 3 per-condition norms in batch_stats
    flat = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    names = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    stem = [n for n in names if "stem_norm" in n]
    assert any("norm0" in n for n in stem) and any("norm2" in n for n in stem), stem


def test_ppt_decoupled_forward():
    pb = make_batch([80], capacity=128, num_classes=13).replace(condition="S3DIS")
    cfg = dict(
        type="PPT-v1m2",
        backbone=small_ptv3_cfg(
            pdnorm_bn=True, pdnorm_conditions=("Structured3D", "ScanNet", "S3DIS")
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
        backbone_out_channels=16,
        context_channels=32,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        num_classes=(25, 20, 13),
    )
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    out = model.apply(variables, pb, train=False)
    assert out["seg_logits"].shape == (128, 13)
    assert np.isfinite(float(out["loss"]))
