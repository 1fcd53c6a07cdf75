"""PyTorch (reference Pointcept) checkpoint -> pointcept_tpu parameter trees.

BASELINE.json requires "SpUNet/PTv2/PTv3 checkpoints convert with matched
logits". This module maps the reference torch ``state_dict`` names/layouts to
this framework's flax param/batch_stats trees:

* ``nn.Linear.weight [out, in]``            -> Dense ``kernel [in, out]`` (transposed)
* ``spconv.SubMConv3d.weight``              -> gather-GEMM ``weight [k^3, in, out]``
  (spconv stores ``[k, k, k, in, out]`` for native layout or ``[out, k,k,k, in]``
  depending on version; both are handled by shape inspection; the spatial axes
  enumerate offsets in the same C order as `ops.sparse_conv.kernel_offsets`)
* ``BatchNorm1d {weight, bias}``            -> MaskedBatchNorm ``{scale, bias}``
  and ``{running_mean, running_var}``       -> batch_stats ``{mean, var}``
* ``LayerNorm {weight, bias}``              -> LayerNorm ``{scale, bias}``

Use `tools/convert_checkpoint.py` for the CLI. Rules are per model family
(PT-v3m1, SpUNet-v1m1); unknown keys are reported, never silently dropped.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(w):  # torch Linear -> flax Dense kernel
    return np.ascontiguousarray(np.asarray(w).T)


# channel widths of the Collect feat_keys that stems consume
_FEAT_DIMS = {"coord": 3, "color": 3, "normal": 3, "grid_coord": 3, "strength": 1}


def feat_input_perm(src_keys, dst_keys):
    """Input-channel permutation taking a stem weight trained with Collect
    ``feat_keys=src_keys`` to one usable with ``feat_keys=dst_keys``.

    ``perm[i]`` is the source channel feeding destination channel ``i``; apply
    as ``weight[..., perm, out_axis]``. Reference SSL checkpoints use
    ("coord", "color", "normal") (e.g. `configs/sonata/` in the reference)
    while this repo's pretrain/probe configs use ("color", "normal", "coord");
    without this permutation a converted 9-channel stem silently mispairs its
    inputs (coord weights applied to color, ...).
    """
    src_keys, dst_keys = tuple(src_keys), tuple(dst_keys)
    if sorted(src_keys) != sorted(dst_keys):
        raise ValueError(f"feat_keys mismatch: {src_keys} vs {dst_keys}")
    offs, o = {}, 0
    for k in src_keys:
        offs[k] = o
        o += _FEAT_DIMS[k]
    perm = []
    for k in dst_keys:
        perm.extend(range(offs[k], offs[k] + _FEAT_DIMS[k]))
    return np.asarray(perm, np.int64)


def _conv(w, k3: int):
    """spconv weight -> [k^3, in, out]."""
    w = np.asarray(w)
    if w.ndim == 5:
        if w.shape[0] * w.shape[1] * w.shape[2] == k3:  # [k,k,k,in,out]
            return np.ascontiguousarray(w.reshape(k3, w.shape[3], w.shape[4]))
        if w.shape[1] * w.shape[2] * w.shape[3] == k3:  # [out,k,k,k,in]
            return np.ascontiguousarray(
                w.transpose(1, 2, 3, 4, 0).reshape(k3, w.shape[4], w.shape[0])
            )
    if w.ndim == 3 and w.shape[0] == k3:
        return np.asarray(w)
    raise ValueError(f"unrecognized spconv weight shape {w.shape} for k^3={k3}")


class TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def put(self, tree, path: str, value):
        parts = path.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.asarray(value)

    def param(self, path, value):
        self.put(self.params, path, value)

    def stat(self, path, value):
        self.put(self.stats, path, value)


def _map_bn(tb: TreeBuilder, src: dict, torch_prefix: str, flax_path: str):
    if (
        f"{torch_prefix}.bns.0.weight" in src
        or f"{torch_prefix}.bns.0.running_mean" in src
    ):
        # PDBatchNorm (v1m3 PDNorm variants, `spconv_unet_v1m3_pdnorm.py:25`):
        # per-condition BN list + optional adaptive modulation Linear
        i = 0
        while (
            f"{torch_prefix}.bns.{i}.weight" in src
            or f"{torch_prefix}.bns.{i}.running_mean" in src
        ):
            _map_bn(tb, src, f"{torch_prefix}.bns.{i}", f"{flax_path}/norm{i}")
            i += 1
        if f"{torch_prefix}.modulation.1.weight" in src:
            _map_linear(tb, src, f"{torch_prefix}.modulation.1", f"{flax_path}/modulation")
        return
    if f"{torch_prefix}.weight" in src:
        tb.param(f"{flax_path}/scale", src[f"{torch_prefix}.weight"])
        tb.param(f"{flax_path}/bias", src[f"{torch_prefix}.bias"])
    if f"{torch_prefix}.running_mean" in src:
        tb.stat(f"{flax_path}/mean", src[f"{torch_prefix}.running_mean"])
        tb.stat(f"{flax_path}/var", src[f"{torch_prefix}.running_var"])


def _map_ln(tb: TreeBuilder, src: dict, torch_prefix: str, flax_path: str):
    tb.param(f"{flax_path}/scale", src[f"{torch_prefix}.weight"])
    tb.param(f"{flax_path}/bias", src[f"{torch_prefix}.bias"])


def _map_linear(tb: TreeBuilder, src: dict, torch_prefix: str, flax_path: str):
    tb.param(f"{flax_path}/kernel", _t(src[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in src:
        tb.param(f"{flax_path}/bias", src[f"{torch_prefix}.bias"])


def convert_ptv3(
    state_dict: dict,
    backbone_prefix: str = "backbone.",
    stem_in_perm=None,
) -> Tuple[dict, dict, list]:
    """Reference PT-v3m1 (DefaultSegmentorV2) state_dict -> (params, batch_stats, unmatched).

    Reference module names from `point_transformer_v3m1_base.py`:
    embedding.stem.{conv,norm}, enc{s}.[down|block{i}], dec{s}.[up|block{i}],
    block = {cpe.0 conv, cpe.1 linear, cpe.2 ln, norm1.0, attn.{qkv,proj},
    norm2.0, mlp.0.{fc1,fc2}}.
    """
    # canonicalize: real checkpoints nest stages in PointSequential containers
    # ("enc.enc0.block0", "dec.dec1.up" — point_transformer_v3m1_base.py:601-697);
    # torch bookkeeping buffers (num_batches_tracked) carry no weights
    def _canon(k):
        if k.startswith(backbone_prefix):
            r = k[len(backbone_prefix):]
            r = re.sub(r"^enc\.enc(\d)", r"enc\1", r)
            r = re.sub(r"^dec\.dec(\d)", r"dec\1", r)
            return backbone_prefix + r
        return k

    src = {
        _canon(k): v
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }
    tb = TreeBuilder()
    unmatched = []
    bp = backbone_prefix
    out = "backbone_module"

    def block(tprefix, fprefix):
        tb.param(f"{fprefix}/cpe_conv/weight", _conv(src[f"{tprefix}.cpe.0.weight"], 27))
        if f"{tprefix}.cpe.0.bias" in src:
            tb.param(f"{fprefix}/cpe_conv/bias", src[f"{tprefix}.cpe.0.bias"])
        _map_linear(tb, src, f"{tprefix}.cpe.1", f"{fprefix}/cpe_linear")
        _map_ln(tb, src, f"{tprefix}.cpe.2", f"{fprefix}/cpe_norm")
        _map_ln(tb, src, f"{tprefix}.norm1.0", f"{fprefix}/norm1")
        _map_ln(tb, src, f"{tprefix}.norm2.0", f"{fprefix}/norm2")
        _map_linear(tb, src, f"{tprefix}.attn.qkv", f"{fprefix}/attn/qkv")
        _map_linear(tb, src, f"{tprefix}.attn.proj", f"{fprefix}/attn/proj")
        _map_linear(tb, src, f"{tprefix}.mlp.0.fc1", f"{fprefix}/mlp/fc1")
        _map_linear(tb, src, f"{tprefix}.mlp.0.fc2", f"{fprefix}/mlp/fc2")
        # v3m2/m3 LayerScale (sonata `:27-40`; identity when absent)
        for ls in ("ls1", "ls2"):
            if f"{tprefix}.{ls}.0.gamma" in src:
                tb.param(f"{fprefix}/{ls}_gamma", src[f"{tprefix}.{ls}.0.gamma"])

    handled = set()
    for key in list(src):
        k = key
        if not k.startswith(bp):
            continue
        r = k[len(bp):]
        if r.startswith("embedding.stem.conv"):
            w = _conv(src[f"{bp}embedding.stem.conv.weight"], 125)
            if stem_in_perm is not None:
                if len(stem_in_perm) != w.shape[1]:
                    raise ValueError(
                        f"stem_in_perm len {len(stem_in_perm)} != stem in_channels {w.shape[1]}"
                    )
                w = w[:, np.asarray(stem_in_perm), :]
            tb.param(f"{out}/embedding/stem_conv/weight", w)
            handled.add(k)
        elif r.startswith("embedding.stem.linear"):
            # v3m2 linear embedding (sonata `:507-540`)
            kern = _t(src[f"{bp}embedding.stem.linear.weight"])
            if stem_in_perm is not None:
                if len(stem_in_perm) != kern.shape[0]:
                    raise ValueError(
                        f"stem_in_perm len {len(stem_in_perm)} != stem in_features {kern.shape[0]}"
                    )
                kern = kern[np.asarray(stem_in_perm), :]
            tb.param(f"{out}/embedding/stem_linear/kernel", kern)
            if f"{bp}embedding.stem.linear.bias" in src:
                tb.param(f"{out}/embedding/stem_linear/bias", src[f"{bp}embedding.stem.linear.bias"])
            handled.add(k)
        elif r == "embedding.mask_token":
            tb.param(f"{out}/embedding/mask_token", src[k])
            handled.add(k)
        elif r.startswith("embedding.stem.norm"):
            _map_bn(tb, src, f"{bp}embedding.stem.norm", f"{out}/embedding/stem_norm")
            handled.add(k)
        elif m := re.match(r"enc(\d+)\.down\.proj\.(weight|bias)", r):
            _map_linear(tb, src, f"{bp}enc{m.group(1)}.down.proj", f"{out}/enc{m.group(1)}_down/proj")
            handled.add(k)
        elif m := re.match(r"enc(\d+)\.down\.norm\.0\.", r):
            _map_bn(tb, src, f"{bp}enc{m.group(1)}.down.norm.0", f"{out}/enc{m.group(1)}_down/norm")
            handled.add(k)
        elif m := re.match(r"enc(\d+)\.block(\d+)\.", r):
            block(f"{bp}enc{m.group(1)}.block{m.group(2)}", f"{out}/enc{m.group(1)}_block{m.group(2)}")
            handled.add(k)
        elif m := re.match(r"dec(\d+)\.up\.proj\.0\.", r):
            _map_linear(tb, src, f"{bp}dec{m.group(1)}.up.proj.0", f"{out}/dec{m.group(1)}_up/proj")
            handled.add(k)
        elif m := re.match(r"dec(\d+)\.up\.proj\.1\.", r):
            _map_bn(tb, src, f"{bp}dec{m.group(1)}.up.proj.1", f"{out}/dec{m.group(1)}_up/proj_norm")
            handled.add(k)
        elif m := re.match(r"dec(\d+)\.up\.proj_skip\.0\.", r):
            _map_linear(tb, src, f"{bp}dec{m.group(1)}.up.proj_skip.0", f"{out}/dec{m.group(1)}_up/proj_skip")
            handled.add(k)
        elif m := re.match(r"dec(\d+)\.up\.proj_skip\.1\.", r):
            _map_bn(tb, src, f"{bp}dec{m.group(1)}.up.proj_skip.1", f"{out}/dec{m.group(1)}_up/proj_skip_norm")
            handled.add(k)
        elif m := re.match(r"dec(\d+)\.block(\d+)\.", r):
            block(f"{bp}dec{m.group(1)}.block{m.group(2)}", f"{out}/dec{m.group(1)}_block{m.group(2)}")
            handled.add(k)
        else:
            unmatched.append(k)
    # wrapper seg head
    if "seg_head.weight" in src:
        _map_linear(tb, src, "seg_head", "seg_head")
    unmatched = [k for k in unmatched if k not in handled]
    return tb.params, tb.stats, sorted(set(unmatched))


def convert_spunet(
    state_dict: dict,
    backbone_prefix: str = "backbone.",
    stem_in_perm=None,
) -> Tuple[dict, dict, list]:
    """Reference SpUNet-v1m1 state_dict -> (params, batch_stats, unmatched)."""
    src = dict(state_dict)
    tb = TreeBuilder()
    unmatched = []
    bp = backbone_prefix
    out = "backbone_module"

    def basic_block(tprefix, fprefix):
        tb.param(f"{fprefix}/conv1/weight", _conv(src[f"{tprefix}.conv1.weight"], 27))
        _map_bn(tb, src, f"{tprefix}.bn1", f"{fprefix}/bn1")
        tb.param(f"{fprefix}/conv2/weight", _conv(src[f"{tprefix}.conv2.weight"], 27))
        _map_bn(tb, src, f"{tprefix}.bn2", f"{fprefix}/bn2")
        if f"{tprefix}.proj.0.weight" in src:
            tb.param(f"{fprefix}/proj_conv/weight", _conv(src[f"{tprefix}.proj.0.weight"], 1))
            _map_bn(tb, src, f"{tprefix}.proj.1", f"{fprefix}/proj_norm")

    for key in list(src):
        if not key.startswith(bp):
            continue
        r = key[len(bp):]
        if r.startswith("conv_input.0."):
            w = _conv(src[f"{bp}conv_input.0.weight"], 125)
            if stem_in_perm is not None:
                if len(stem_in_perm) != w.shape[1]:
                    raise ValueError(
                        f"stem_in_perm len {len(stem_in_perm)} != stem in_channels {w.shape[1]}"
                    )
                w = w[:, np.asarray(stem_in_perm), :]
            tb.param(f"{out}/conv_input/weight", w)
        elif r.startswith("conv_input.1."):
            _map_bn(tb, src, f"{bp}conv_input.1", f"{out}/stem_norm")
        elif m := re.match(r"down\.(\d+)\.0\.weight", r):
            s = int(m.group(1))
            tb.param(f"{out}/down{s}_weight", _conv(src[key], 8))
        elif m := re.match(r"down\.(\d+)\.1\.", r):
            s = int(m.group(1))
            _map_bn(tb, src, f"{bp}down.{s}.1", f"{out}/down{s}_norm")
        elif m := re.match(r"up\.(\d+)\.0\.weight", r):
            s = int(m.group(1))
            # up[s] is used at the decode step for skip level s (same index)
            tb.param(f"{out}/up{s}_weight", _conv(src[key], 8))
        elif m := re.match(r"up\.(\d+)\.1\.", r):
            s = int(m.group(1))
            _map_bn(tb, src, f"{bp}up.{s}.1", f"{out}/up{s}_norm")
        elif m := re.match(r"enc\.(\d+)\.block(\d+)\.", r):
            basic_block(f"{bp}enc.{m.group(1)}.block{m.group(2)}", f"{out}/enc{m.group(1)}_block{m.group(2)}")
        elif m := re.match(r"dec\.(\d+)\.block(\d+)\.", r):
            basic_block(f"{bp}dec.{m.group(1)}.block{m.group(2)}", f"{out}/dec{m.group(1)}_block{m.group(2)}")
        elif r.startswith("final."):
            if r == "final.weight":
                tb.param(f"{out}/final_weight", _conv(src[key], 1))
            else:
                tb.param(f"{out}/final_bias", src[key])
        else:
            unmatched.append(key)
    return tb.params, tb.stats, sorted(set(unmatched))


def convert_ptv2(state_dict: dict, backbone_prefix: str = "backbone.") -> Tuple[dict, dict, list]:
    """Reference PT-v2m2 (DefaultSegmentor) state_dict -> (params, batch_stats, unmatched).

    Reference module names from `point_transformer_v2m2_base.py:448-556`:
    patch_embed.{proj.0 linear, proj.1 PointBatchNorm(.norm), blocks.blocks.i},
    enc_stages.s.{down.fc, down.norm.norm, blocks.blocks.i},
    dec_stages.s.{up.proj.0/1, up.proj_skip.0/1, blocks.blocks.i},
    seg_head.{0 linear, 1.norm bn, 3 linear}. Each Block (`:132-178`):
    fc1/fc3 (no-bias linears), norm{1,2,3}.norm, attn.{linear_q/k (Sequential
    linear+PointBatchNorm), linear_v, linear_p_multiplier/linear_p_bias/
    weight_encoding (Sequential linear+bn+relu+linear)}.
    """
    src = dict(state_dict)
    tb = TreeBuilder()
    unmatched = []
    bp = backbone_prefix
    out = "backbone_module"

    def pbn(tprefix, fpath):
        # PointBatchNorm wraps BatchNorm1d at `.norm`; our PointBN wraps
        # MaskedBatchNorm at `bn`
        _map_bn(tb, src, f"{tprefix}.norm", f"{fpath}/bn")

    def seq3(tprefix, fprefix):  # Sequential(linear, PointBatchNorm, relu, linear)
        _map_linear(tb, src, f"{tprefix}.0", f"{fprefix}_fc1")
        pbn(f"{tprefix}.1", f"{fprefix}_norm")
        _map_linear(tb, src, f"{tprefix}.3", f"{fprefix}_fc2")

    def block(tprefix, fprefix):
        _map_linear(tb, src, f"{tprefix}.fc1", f"{fprefix}/fc1")
        _map_linear(tb, src, f"{tprefix}.fc3", f"{fprefix}/fc3")
        for i in (1, 2, 3):
            pbn(f"{tprefix}.norm{i}", f"{fprefix}/norm{i}")
        at, af = f"{tprefix}.attn", f"{fprefix}/attn"
        _map_linear(tb, src, f"{at}.linear_q.0", f"{af}/linear_q")
        pbn(f"{at}.linear_q.1", f"{af}/q_norm")
        _map_linear(tb, src, f"{at}.linear_k.0", f"{af}/linear_k")
        pbn(f"{at}.linear_k.1", f"{af}/k_norm")
        _map_linear(tb, src, f"{at}.linear_v", f"{af}/linear_v")
        if f"{at}.linear_p_multiplier.0.weight" in src:
            seq3(f"{at}.linear_p_multiplier", f"{af}/pem")
        if f"{at}.linear_p_bias.0.weight" in src:
            seq3(f"{at}.linear_p_bias", f"{af}/peb")
        if f"{at}.weight_encoding.0.weight" in src:
            seq3(f"{at}.weight_encoding", f"{af}/we")

    handled = set()

    def claim(prefix):
        for k in src:
            if k.startswith(prefix):
                handled.add(k)

    for key in list(src):
        if not key.startswith(bp):
            if key.startswith("seg_head."):
                # PTv2's seg head lives inside the backbone; DefaultSegmentor
                # adds nothing else
                continue
            unmatched.append(key)
            continue
        r = key[len(bp):]
        if r.startswith("patch_embed.proj.0."):
            _map_linear(tb, src, f"{bp}patch_embed.proj.0", f"{out}/patch_proj")
            claim(f"{bp}patch_embed.proj.0.")
        elif r.startswith("patch_embed.proj.1."):
            pbn(f"{bp}patch_embed.proj.1", f"{out}/patch_norm")
            claim(f"{bp}patch_embed.proj.1.")
        elif m := re.match(r"patch_embed\.blocks\.blocks\.(\d+)\.", r):
            i = m.group(1)
            block(f"{bp}patch_embed.blocks.blocks.{i}", f"{out}/patch_embed/block{i}")
            claim(f"{bp}patch_embed.blocks.blocks.{i}.")
        elif m := re.match(r"enc_stages\.(\d+)\.down\.fc\.", r):
            s = m.group(1)
            _map_linear(tb, src, f"{bp}enc_stages.{s}.down.fc", f"{out}/enc{s}_down/fc")
            claim(f"{bp}enc_stages.{s}.down.fc.")
        elif m := re.match(r"enc_stages\.(\d+)\.down\.norm\.", r):
            s = m.group(1)
            pbn(f"{bp}enc_stages.{s}.down.norm", f"{out}/enc{s}_down/norm")
            claim(f"{bp}enc_stages.{s}.down.norm.")
        elif m := re.match(r"enc_stages\.(\d+)\.blocks\.blocks\.(\d+)\.", r):
            s, i = m.group(1), m.group(2)
            block(f"{bp}enc_stages.{s}.blocks.blocks.{i}", f"{out}/enc{s}_blocks/block{i}")
            claim(f"{bp}enc_stages.{s}.blocks.blocks.{i}.")
        elif m := re.match(r"dec_stages\.(\d+)\.up\.proj\.0\.", r):
            s = m.group(1)
            _map_linear(tb, src, f"{bp}dec_stages.{s}.up.proj.0", f"{out}/dec{s}_up/proj_fc")
            claim(f"{bp}dec_stages.{s}.up.proj.0.")
        elif m := re.match(r"dec_stages\.(\d+)\.up\.proj\.1\.", r):
            s = m.group(1)
            pbn(f"{bp}dec_stages.{s}.up.proj.1", f"{out}/dec{s}_up/proj_norm")
            claim(f"{bp}dec_stages.{s}.up.proj.1.")
        elif m := re.match(r"dec_stages\.(\d+)\.up\.proj_skip\.0\.", r):
            s = m.group(1)
            _map_linear(tb, src, f"{bp}dec_stages.{s}.up.proj_skip.0", f"{out}/dec{s}_up/skip_fc")
            claim(f"{bp}dec_stages.{s}.up.proj_skip.0.")
        elif m := re.match(r"dec_stages\.(\d+)\.up\.proj_skip\.1\.", r):
            s = m.group(1)
            pbn(f"{bp}dec_stages.{s}.up.proj_skip.1", f"{out}/dec{s}_up/skip_norm")
            claim(f"{bp}dec_stages.{s}.up.proj_skip.1.")
        elif m := re.match(r"dec_stages\.(\d+)\.blocks\.blocks\.(\d+)\.", r):
            s, i = m.group(1), m.group(2)
            block(f"{bp}dec_stages.{s}.blocks.blocks.{i}", f"{out}/dec{s}_blocks/block{i}")
            claim(f"{bp}dec_stages.{s}.blocks.blocks.{i}.")
        elif r.startswith("seg_head.0."):
            _map_linear(tb, src, f"{bp}seg_head.0", f"{out}/seg_head_fc1")
            claim(f"{bp}seg_head.0.")
        elif r.startswith("seg_head.1."):
            pbn(f"{bp}seg_head.1", f"{out}/seg_head_norm")
            claim(f"{bp}seg_head.1.")
        elif r.startswith("seg_head.3."):
            _map_linear(tb, src, f"{bp}seg_head.3", f"{out}/seg_head_fc2")
            claim(f"{bp}seg_head.3.")
        else:
            unmatched.append(key)
    unmatched = [k for k in unmatched if k not in handled]
    return tb.params, tb.stats, sorted(set(unmatched))


CONVERTERS = {
    "PT-v3m1": convert_ptv3,
    # m2 (sonata: linear embedding, LayerScale, mask token) and m3 (utonia:
    # +RoPE, which is parameter-free) share m1's module naming
    "PT-v3m2": convert_ptv3,
    "PT-v3m3": convert_ptv3,
    "PT-v2m2": convert_ptv2,
    "SpUNet-v1m1": convert_spunet,
    # v1m2 shares v1m1's graph/key names (only BN hyperparams differ); v1m3's
    # PDBatchNorm lists are expanded by _map_bn
    "SpUNet-v1m2": convert_spunet,
    "SpUNet-v1m3": convert_spunet,
}
# MinkUNet variants are SpUNet-graph presets (models/sparse_unet/spconv_unet.py)
for _n in ("MinkUNet14", "MinkUNet18", "MinkUNet34", "MinkUNet50"):
    for _v in "ABCD":
        CONVERTERS[f"{_n}{_v}"] = convert_spunet


def convert_state_dict(state_dict: dict, model_type: str, **kwargs):
    if model_type not in CONVERTERS:
        raise KeyError(f"No converter for {model_type}; available: {list(CONVERTERS)}")
    return CONVERTERS[model_type](state_dict, **kwargs)
