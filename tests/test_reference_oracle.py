"""END-TO-END logit parity against the reference's OWN code.

Runs the unmodified reference model sources (/root/reference/pointcept) on CPU
via pure-torch shims (tests/oracles/), converts the torch state_dict with
`convert_state_dict`, and asserts our JAX model produces the same outputs on
the same scene. This is the real-checkpoint conversion path exercised with the
real reference forward as the numeric oracle (reference weights differ only in
values, not names/shapes/semantics).

Float noise budget: our conv/attention paths compute in bf16 (f32 accumulate),
the reference oracle in f64-exact f32 — tolerances reflect bf16 rounding
through a 5-stage U-Net, and argmax agreement is asserted near-total.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo/tests")

import jax

from pointcept_tpu.engines.train import make_point_batch
from pointcept_tpu.models import build_model
from pointcept_tpu.models.utils.convert import convert_state_dict


def _graft(dst, src, path=""):
    out, missing = {}, []
    for k, v in dst.items():
        if isinstance(v, dict):
            o, m = _graft(v, src.get(k, {}) if isinstance(src, dict) else {}, f"{path}/{k}")
            out[k] = o
            missing += m
        else:
            s = src.get(k) if isinstance(src, dict) else None
            if s is not None:
                assert np.asarray(s).shape == np.asarray(v).shape, (
                    f"shape mismatch at {path}/{k}: {np.asarray(s).shape} vs {np.asarray(v).shape}"
                )
                out[k] = np.asarray(s, np.asarray(v).dtype)
            else:
                out[k] = np.asarray(v)
                missing.append(f"{path}/{k}")
    return out, missing


def _scene(n_target=900, span=48, seed=0, channels=6):
    rng = np.random.default_rng(seed)
    grid = np.unique(rng.integers(0, span, (n_target, 3)), axis=0).astype(np.int32)
    n = grid.shape[0]
    feat = rng.standard_normal((n, channels)).astype(np.float32)
    return grid, feat


ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def test_ptv3_logits_match_reference_code():
    from oracles import load_reference_module

    m = load_reference_module(
        "pointcept.models.point_transformer_v3.point_transformer_v3m1_base"
    )
    torch.manual_seed(0)
    common = dict(
        in_channels=6,
        order=ORDERS,
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(16, 32, 64),
        enc_num_head=(1, 2, 4),
        enc_patch_size=(64, 64, 64),
        dec_depths=(1, 1),
        dec_channels=(16, 32),
        dec_num_head=(1, 2),
        dec_patch_size=(64, 64),
        mlp_ratio=2,
        drop_path=0.0,
    )
    ref = m.PointTransformerV3(
        enable_flash=False,
        enable_rpe=False,
        upcast_attention=True,
        upcast_softmax=True,
        shuffle_orders=False,
        **common,
    )
    seg_head = torch.nn.Linear(16, 13)
    ref.eval()

    grid, feat = _scene()
    n = grid.shape[0]
    depth = int(grid.max() + 1).bit_length()  # reference adaptive depth
    with torch.no_grad():
        point = ref(
            dict(
                coord=torch.tensor(grid, dtype=torch.float32) * 0.02,
                grid_coord=torch.tensor(grid),
                feat=torch.tensor(feat),
                offset=torch.tensor([n]),
            )
        )
        ref_logits = seg_head(point.feat).numpy()

    sd = {f"backbone.{k}": v.numpy() for k, v in ref.state_dict().items()}
    sd["seg_head.weight"] = seg_head.weight.detach().numpy()
    sd["seg_head.bias"] = seg_head.bias.detach().numpy()
    params, stats, unmatched = convert_state_dict(sd, "PT-v3m1")
    assert unmatched == [], unmatched

    ours = build_model(
        dict(
            type="DefaultSegmentorV2",
            num_classes=13,
            backbone_out_channels=16,
            backbone=dict(
                type="PT-v3m1",
                shuffle_orders=False,
                serialize_depth=depth,
                pool_capacity_factors=(0.9, 0.9),
                **common,
            ),
            criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
        )
    )
    arrays = dict(
        coord=grid.astype(np.float32) * 0.02,
        feat=feat,
        grid_coord=grid,
        batch=np.zeros(n, np.int32),
        segment=np.zeros(n, np.int32),
    )
    pb = make_point_batch(arrays, 1)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    new_params, miss_p = _graft(
        jax.tree_util.tree_map(np.asarray, variables["params"]), params
    )
    new_stats, _ = _graft(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {})), stats
    )
    assert miss_p == [], f"converter left params at init: {miss_p[:10]}"
    out = ours.apply({"params": new_params, "batch_stats": new_stats}, pb, train=False)
    got = np.asarray(out["seg_logits"], np.float32)

    scale = np.abs(ref_logits).max()
    err = np.abs(got - ref_logits).max() / scale
    agree = (got.argmax(1) == ref_logits.argmax(1)).mean()
    assert err < 3e-2, f"relative logit error {err:.4f}"
    assert agree > 0.99, f"argmax agreement {agree:.4f}"


def test_spunet_logits_match_reference_code():
    from oracles import load_reference_module

    m = load_reference_module("pointcept.models.sparse_unet.spconv_unet_v1m1_base")
    torch.manual_seed(0)
    ref = m.SpUNetBase(
        in_channels=6,
        num_classes=13,
        base_channels=8,
        channels=(8, 16, 24, 24, 16, 16, 12, 12),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
    )
    ref.eval()

    grid, feat = _scene(n_target=700, span=40, seed=1)
    n = grid.shape[0]
    with torch.no_grad():
        ref_logits = ref(
            dict(
                grid_coord=torch.tensor(grid),
                feat=torch.tensor(feat),
                offset=torch.tensor([n]),
            )
        ).numpy()

    sd = {f"backbone.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params, stats, unmatched = convert_state_dict(sd, "SpUNet-v1m1")
    assert unmatched == [], unmatched

    ours = build_model(
        dict(
            type="DefaultSegmentor",
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=6,
                num_classes=13,
                base_channels=8,
                channels=(8, 16, 24, 24, 16, 16, 12, 12),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
            ),
            criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
        )
    )
    arrays = dict(
        coord=grid.astype(np.float32) * 0.02,
        feat=feat,
        grid_coord=grid,
        batch=np.zeros(n, np.int32),
        segment=np.zeros(n, np.int32),
    )
    pb = make_point_batch(arrays, 1)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    new_params, miss_p = _graft(
        jax.tree_util.tree_map(np.asarray, variables["params"]), params
    )
    new_stats, _ = _graft(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {})), stats
    )
    assert miss_p == [], f"converter left params at init: {miss_p[:10]}"
    out = ours.apply({"params": new_params, "batch_stats": new_stats}, pb, train=False)
    got = np.asarray(out["seg_logits"], np.float32)

    scale = np.abs(ref_logits).max()
    err = np.abs(got - ref_logits).max() / scale
    agree = (got.argmax(1) == ref_logits.argmax(1)).mean()
    assert err < 2e-2, f"relative logit error {err:.4f}"
    assert agree > 0.99, f"argmax agreement {agree:.4f}"
