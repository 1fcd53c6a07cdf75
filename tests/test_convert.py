import numpy as np
import jax

from pointcept_tpu.models import build_model
from pointcept_tpu.models.utils.convert import convert_state_dict
from tests.test_structure import make_batch
from tests.test_ptv3 import small_ptv3_cfg


def _torch_linear(rng, fin, fout, bias=True, prefix="", d=None):
    d[f"{prefix}.weight"] = rng.randn(fout, fin).astype(np.float32)
    if bias:
        d[f"{prefix}.bias"] = rng.randn(fout).astype(np.float32)


def _torch_bn(rng, c, prefix, d):
    d[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
    d[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
    d[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
    d[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5


def _torch_ln(rng, c, prefix, d):
    d[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
    d[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)


def test_convert_ptv3_structure_and_values():
    """Build a synthetic torch-style state_dict following the REFERENCE's
    module naming (point_transformer_v3m1_base.py) and check every converted
    leaf grafts onto our PTv3 param tree with matching shapes."""
    rng = np.random.RandomState(0)
    cfg = small_ptv3_cfg()
    pb = make_batch([50], capacity=64, num_classes=13)
    model = build_model(dict(type="DefaultSegmentorV2", num_classes=13, backbone_out_channels=16,
                             backbone=cfg, criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    sd = {}
    C = dict(enc=(16, 32, 64), dec=(16, 32), heads=dict())
    # embedding
    sd["backbone.embedding.stem.conv.weight"] = rng.randn(5, 5, 5, 6, 16).astype(np.float32)
    _torch_bn(rng, 16, "backbone.embedding.stem.norm", sd)

    def torch_block(prefix, c, heads):
        sd[f"{prefix}.cpe.0.weight"] = rng.randn(3, 3, 3, c, c).astype(np.float32)
        sd[f"{prefix}.cpe.0.bias"] = rng.randn(c).astype(np.float32)
        _torch_linear(rng, c, c, True, f"{prefix}.cpe.1", sd)
        _torch_ln(rng, c, f"{prefix}.cpe.2", sd)
        _torch_ln(rng, c, f"{prefix}.norm1.0", sd)
        _torch_ln(rng, c, f"{prefix}.norm2.0", sd)
        _torch_linear(rng, c, 3 * c, True, f"{prefix}.attn.qkv", sd)
        _torch_linear(rng, c, c, True, f"{prefix}.attn.proj", sd)
        _torch_linear(rng, c, 2 * c, True, f"{prefix}.mlp.0.fc1", sd)
        _torch_linear(rng, 2 * c, c, True, f"{prefix}.mlp.0.fc2", sd)

    for s, c in enumerate(C["enc"]):
        if s > 0:
            _torch_linear(rng, C["enc"][s - 1], c, True, f"backbone.enc{s}.down.proj", sd)
            _torch_bn(rng, c, f"backbone.enc{s}.down.norm.0", sd)
        torch_block(f"backbone.enc{s}.block0", c, None)
    dec_channels = list(C["dec"]) + [C["enc"][-1]]
    for s in (1, 0):
        _torch_linear(rng, dec_channels[s + 1], dec_channels[s], True, f"backbone.dec{s}.up.proj.0", sd)
        _torch_bn(rng, dec_channels[s], f"backbone.dec{s}.up.proj.1", sd)
        _torch_linear(rng, C["enc"][s], dec_channels[s], True, f"backbone.dec{s}.up.proj_skip.0", sd)
        _torch_bn(rng, dec_channels[s], f"backbone.dec{s}.up.proj_skip.1", sd)
        torch_block(f"backbone.dec{s}.block0", dec_channels[s], None)
    _torch_linear(rng, 16, 13, True, "seg_head", sd)

    params, stats, unmatched = convert_state_dict(sd, "PT-v3m1")
    assert unmatched == [], unmatched

    # every converted leaf must exist in our tree with the same shape
    def check(src, dst, path=""):
        count = 0
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in target tree"
            if isinstance(v, dict):
                count += check(v, dst[k], f"{path}/{k}")
            else:
                assert np.asarray(dst[k]).shape == v.shape, f"{path}/{k}: {np.asarray(dst[k]).shape} vs {v.shape}"
                count += 1
        return count

    n1 = check(params, variables["params"])
    n2 = check(stats, variables["batch_stats"])
    assert n1 > 50 and n2 > 5
    # linear transpose correctness
    np.testing.assert_allclose(
        params["backbone_module"]["enc0_block0"]["attn"]["qkv"]["kernel"],
        sd["backbone.enc0.block0.attn.qkv.weight"].T,
    )
    # conv reshaped to [k^3, in, out]
    assert params["backbone_module"]["embedding"]["stem_conv"]["weight"].shape == (125, 6, 16)


def test_convert_spunet_structure():
    rng = np.random.RandomState(1)
    ch = (8, 16, 32, 64, 64, 32, 24, 24)
    layers = (1,) * 8
    pb = make_batch([50], capacity=64, num_classes=13)
    model = build_model(dict(
        type="DefaultSegmentor",
        num_classes=13,
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=13, base_channels=8,
            channels=ch, layers=layers, serialize_depth=8, pool_capacity_factor=0.75,
        ),
        criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
    ))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    sd = {}
    sd["conv_input.0.weight"] = rng.randn(5, 5, 5, 6, 8).astype(np.float32)
    _torch_bn(rng, 8, "conv_input.1", sd)

    def torch_basic(prefix, cin, c):
        sd[f"{prefix}.conv1.weight"] = rng.randn(3, 3, 3, cin, c).astype(np.float32)
        _torch_bn(rng, c, f"{prefix}.bn1", sd)
        sd[f"{prefix}.conv2.weight"] = rng.randn(3, 3, 3, c, c).astype(np.float32)
        _torch_bn(rng, c, f"{prefix}.bn2", sd)
        if cin != c:
            sd[f"{prefix}.proj.0.weight"] = rng.randn(1, 1, 1, cin, c).astype(np.float32)
            _torch_bn(rng, c, f"{prefix}.proj.1", sd)

    enc_in = 8
    for s in range(4):
        sd[f"down.{s}.0.weight"] = rng.randn(2, 2, 2, enc_in, ch[s]).astype(np.float32)
        _torch_bn(rng, ch[s], f"down.{s}.1", sd)
        torch_basic(f"enc.{s}.block0", ch[s], ch[s])
        enc_in = ch[s]
    dec_outs = {3: ch[4], 2: ch[5], 1: ch[6], 0: ch[7]}
    ups_in = {3: ch[3], 2: ch[4], 1: ch[5], 0: ch[6]}
    enc_skip = {3: ch[2], 2: ch[1], 1: ch[0], 0: 8}
    for s in range(4):
        sd[f"up.{s}.0.weight"] = rng.randn(2, 2, 2, ups_in[s], dec_outs[s]).astype(np.float32)
        _torch_bn(rng, dec_outs[s], f"up.{s}.1", sd)
        torch_basic(f"dec.{s}.block0", dec_outs[s] + enc_skip[s], dec_outs[s])
    sd["final.weight"] = rng.randn(1, 1, 1, ch[7], 13).astype(np.float32)
    sd["final.bias"] = rng.randn(13).astype(np.float32)

    params, stats, unmatched = convert_state_dict(sd, "SpUNet-v1m1", backbone_prefix="")
    assert unmatched == [], unmatched

    def check(src, dst, path=""):
        count = 0
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k}"
            if isinstance(v, dict):
                count += check(v, dst[k], f"{path}/{k}")
            else:
                assert np.asarray(dst[k]).shape == v.shape, f"{path}/{k}: {np.asarray(dst[k]).shape} vs {v.shape}"
                count += 1
        return count

    n1 = check(params, variables["params"])
    n2 = check(stats, variables["batch_stats"])
    assert n1 > 30 and n2 > 10


def test_convert_ptv2_structure_and_values():
    """Synthetic torch-style state_dict following the reference PT-v2m2 naming
    (point_transformer_v2m2_base.py:448-556) -> every converted leaf grafts
    onto our PTv2 tree with matching shapes, zero unmatched keys."""
    rng = np.random.RandomState(2)
    pe_c, enc, dec, groups_pe = 8, (16, 32), (8, 16), 2
    cfg = dict(
        type="PT-v2m2", in_channels=6, num_classes=13,
        patch_embed_depth=1, patch_embed_channels=pe_c, patch_embed_groups=groups_pe,
        patch_embed_neighbours=8,
        enc_depths=(1, 1), enc_channels=enc, enc_groups=(4, 8), enc_neighbours=(8, 8),
        dec_depths=(1, 1), dec_channels=dec, dec_groups=(2, 4), dec_neighbours=(8, 8),
        grid_sizes=(0.2, 0.4), pool_capacity_factors=(0.75, 0.75),
    )
    pb = make_batch([60], capacity=96, num_classes=13)
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    sd = {}

    def torch_block(prefix, c, g):
        _torch_linear(rng, c, c, False, f"{prefix}.fc1", sd)
        _torch_linear(rng, c, c, False, f"{prefix}.fc3", sd)
        for i in (1, 2, 3):
            _torch_bn(rng, c, f"{prefix}.norm{i}.norm", sd)
        at = f"{prefix}.attn"
        _torch_linear(rng, c, c, True, f"{at}.linear_q.0", sd)
        _torch_bn(rng, c, f"{at}.linear_q.1.norm", sd)
        _torch_linear(rng, c, c, True, f"{at}.linear_k.0", sd)
        _torch_bn(rng, c, f"{at}.linear_k.1.norm", sd)
        _torch_linear(rng, c, c, True, f"{at}.linear_v", sd)
        # pe_bias branch (default pe_multiplier=False)
        _torch_linear(rng, 3, c, True, f"{at}.linear_p_bias.0", sd)
        _torch_bn(rng, c, f"{at}.linear_p_bias.1.norm", sd)
        _torch_linear(rng, c, c, True, f"{at}.linear_p_bias.3", sd)
        _torch_linear(rng, c, g, True, f"{at}.weight_encoding.0", sd)
        _torch_bn(rng, g, f"{at}.weight_encoding.1.norm", sd)
        _torch_linear(rng, g, g, True, f"{at}.weight_encoding.3", sd)

    _torch_linear(rng, 6, pe_c, False, "backbone.patch_embed.proj.0", sd)
    _torch_bn(rng, pe_c, "backbone.patch_embed.proj.1.norm", sd)
    torch_block("backbone.patch_embed.blocks.blocks.0", pe_c, groups_pe)
    enc_in = [pe_c] + list(enc)
    for s in range(2):
        _torch_linear(rng, enc_in[s], enc[s], False, f"backbone.enc_stages.{s}.down.fc", sd)
        _torch_bn(rng, enc[s], f"backbone.enc_stages.{s}.down.norm.norm", sd)
        torch_block(f"backbone.enc_stages.{s}.blocks.blocks.0", enc[s], (4, 8)[s])
    dec_full = list(dec) + [enc[-1]]
    for s in range(2):
        _torch_linear(rng, dec_full[s + 1], dec[s], True, f"backbone.dec_stages.{s}.up.proj.0", sd)
        _torch_bn(rng, dec[s], f"backbone.dec_stages.{s}.up.proj.1.norm", sd)
        _torch_linear(rng, enc_in[s], dec[s], True, f"backbone.dec_stages.{s}.up.proj_skip.0", sd)
        _torch_bn(rng, dec[s], f"backbone.dec_stages.{s}.up.proj_skip.1.norm", sd)
        torch_block(f"backbone.dec_stages.{s}.blocks.blocks.0", dec[s], (2, 4)[s])
    _torch_linear(rng, dec[0], dec[0], True, "backbone.seg_head.0", sd)
    _torch_bn(rng, dec[0], "backbone.seg_head.1.norm", sd)
    _torch_linear(rng, dec[0], 13, True, "backbone.seg_head.3", sd)

    params, stats, unmatched = convert_state_dict(sd, "PT-v2m2")
    assert unmatched == [], unmatched

    def check(src, dst, path=""):
        count = 0
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k}"
            if isinstance(v, dict):
                count += check(v, dst[k], f"{path}/{k}")
            else:
                assert np.asarray(dst[k]).shape == v.shape, f"{path}/{k}: {np.asarray(dst[k]).shape} vs {v.shape}"
                count += 1
        return count

    tgt_params = {"backbone_module": variables["params"]}
    tgt_stats = {"backbone_module": variables["batch_stats"]}
    n1 = check(params, tgt_params)
    n2 = check(stats, tgt_stats)
    assert n1 > 60 and n2 > 20
    np.testing.assert_allclose(
        params["backbone_module"]["enc0_blocks"]["block0"]["attn"]["linear_q"]["kernel"],
        sd["backbone.enc_stages.0.blocks.blocks.0.attn.linear_q.0.weight"].T,
    )


def test_convert_ptv3m2_linear_stem_and_layerscale():
    """v3m2 (sonata) keys: linear embedding, mask token, LayerScale gammas."""
    rng = np.random.RandomState(3)
    cfg = small_ptv3_cfg()
    cfg.update(type="PT-v3m2", layer_scale=1e-5, mask_token=True, enc_mode=True,
               dec_depths=(), dec_channels=(), dec_num_head=(), dec_patch_size=())
    model = build_model(cfg)
    pb = make_batch([50], capacity=64, num_classes=13)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)

    sd = {}
    _torch_linear(rng, 6, 16, True, "backbone.embedding.stem.linear", sd)
    _torch_ln(rng, 16, "backbone.embedding.stem.norm", sd)
    sd["backbone.embedding.mask_token"] = rng.randn(1, 16).astype(np.float32)

    def torch_block(prefix, c):
        sd[f"{prefix}.cpe.0.weight"] = rng.randn(3, 3, 3, c, c).astype(np.float32)
        sd[f"{prefix}.cpe.0.bias"] = rng.randn(c).astype(np.float32)
        _torch_linear(rng, c, c, True, f"{prefix}.cpe.1", sd)
        _torch_ln(rng, c, f"{prefix}.cpe.2", sd)
        _torch_ln(rng, c, f"{prefix}.norm1.0", sd)
        _torch_ln(rng, c, f"{prefix}.norm2.0", sd)
        _torch_linear(rng, c, 3 * c, True, f"{prefix}.attn.qkv", sd)
        _torch_linear(rng, c, c, True, f"{prefix}.attn.proj", sd)
        _torch_linear(rng, c, 2 * c, True, f"{prefix}.mlp.0.fc1", sd)
        _torch_linear(rng, 2 * c, c, True, f"{prefix}.mlp.0.fc2", sd)
        sd[f"{prefix}.ls1.0.gamma"] = rng.rand(c).astype(np.float32)
        sd[f"{prefix}.ls2.0.gamma"] = rng.rand(c).astype(np.float32)

    for s, c in enumerate((16, 32, 64)):
        if s > 0:
            _torch_linear(rng, (16, 32, 64)[s - 1], c, True, f"backbone.enc{s}.down.proj", sd)
            _torch_bn(rng, c, f"backbone.enc{s}.down.norm.0", sd)
        torch_block(f"backbone.enc{s}.block0", c)

    params, stats, unmatched = convert_state_dict(sd, "PT-v3m2")
    assert unmatched == [], unmatched

    def check(src, dst, path=""):
        count = 0
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k}"
            if isinstance(v, dict):
                count += check(v, dst[k], f"{path}/{k}")
            else:
                assert np.asarray(dst[k]).shape == v.shape, f"{path}/{k}"
                count += 1
        return count

    n = check(params, {"backbone_module": variables["params"]})
    assert n > 40
    np.testing.assert_allclose(
        params["backbone_module"]["enc1_block0"]["ls1_gamma"],
        sd["backbone.enc1.block0.ls1.0.gamma"],
    )


def test_convert_spunet_v1m3_pdnorm():
    """v1m3 PDBatchNorm keys (`.bns.{i}` + `.modulation.1`) expand onto our
    PDNorm tree (norm{i} + modulation)."""
    rng = np.random.RandomState(4)
    sd = {}
    for i in range(3):
        _torch_bn(rng, 8, f"conv_input.1.bns.{i}", sd)
    _torch_linear(rng, 256, 16, True, "conv_input.1.modulation.1", sd)
    sd["conv_input.0.weight"] = rng.randn(5, 5, 5, 6, 8).astype(np.float32)
    params, stats, unmatched = convert_state_dict(sd, "SpUNet-v1m3", backbone_prefix="")
    assert unmatched == [], unmatched
    sn = params["backbone_module"]["stem_norm"]
    for i in range(3):
        assert "scale" in sn[f"norm{i}"]
        np.testing.assert_allclose(
            stats["backbone_module"]["stem_norm"][f"norm{i}"]["mean"],
            sd[f"conv_input.1.bns.{i}.running_mean"],
        )
    assert sn["modulation"]["kernel"].shape == (256, 16)


def test_feat_input_perm_stem():
    """ADVICE r2 #2: reference SSL checkpoints are trained with Collect
    feat_keys=(coord,color,normal); this repo's 9-channel probe configs use
    (color,normal,coord). The converter's stem_in_perm must repair the
    pairing so stem @ feat is invariant."""
    from pointcept_tpu.models.utils.convert import feat_input_perm

    rng = np.random.RandomState(0)
    perm = feat_input_perm(("coord", "color", "normal"), ("color", "normal", "coord"))
    assert perm.tolist() == [3, 4, 5, 6, 7, 8, 0, 1, 2]

    coord, color, normal = rng.randn(3, 7, 3).astype(np.float32)
    feat_ref = np.concatenate([coord, color, normal], 1)   # reference order
    feat_ours = np.concatenate([color, normal, coord], 1)  # repo probe order
    w = rng.randn(9, 4).astype(np.float32)  # [in, out] slice of a stem tap
    np.testing.assert_allclose(feat_ours @ w[perm], feat_ref @ w, rtol=1e-5, atol=1e-6)

    # conv path: [k^3, in, out] weights permute on axis 1
    d = {}
    k3 = 125
    d["backbone.embedding.stem.conv.weight"] = rng.randn(5, 5, 5, 9, 8).astype(np.float32)
    _torch_bn(rng, 8, "backbone.embedding.stem.norm", d)
    params, _, _ = convert_state_dict(
        d, "PT-v3m1", stem_in_perm=feat_input_perm(
            ("coord", "color", "normal"), ("color", "normal", "coord"))
    )
    w_conv = params["backbone_module"]["embedding"]["stem_conv"]["weight"]
    ref = d["backbone.embedding.stem.conv.weight"].reshape(k3, 9, 8)
    np.testing.assert_allclose(w_conv, ref[:, [3, 4, 5, 6, 7, 8, 0, 1, 2], :])
