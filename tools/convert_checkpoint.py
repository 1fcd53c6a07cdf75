"""Convert a reference Pointcept torch checkpoint into a pointcept_tpu orbax one.

Usage:
  python tools/convert_checkpoint.py --input exp/model_best.pth \
      --model-type PT-v3m1 --config configs/scannet/semseg-pt-v3m1-0-base.py \
      --output exp_tpu/model_converted

Loads the torch .pth (CPU), maps names/layouts via
`pointcept_tpu.models.utils.convert`, grafts the converted leaves onto a
freshly-initialized state for the given config, and saves an orbax checkpoint
loadable by `--options weight=...`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--model-type", required=True, help="PT-v3m1 | SpUNet-v1m1")
    parser.add_argument("--config", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--backbone-prefix", default="backbone.")
    parser.add_argument(
        "--feat-keys",
        default=None,
        help="Collect feat_keys order of the TARGET config, comma-separated "
        "(e.g. color,normal,coord). When it differs from --src-feat-keys the "
        "stem's input channels are permuted to match.",
    )
    parser.add_argument(
        "--src-feat-keys",
        default="coord,color,normal",
        help="feat_keys order the checkpoint was trained with (reference "
        "default: coord,color,normal).",
    )
    args = parser.parse_args()

    import numpy as np
    import torch

    from pointcept_tpu.models.utils.convert import convert_state_dict, feat_input_perm

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k.removeprefix("module."): v.numpy() for k, v in state_dict.items()}
    stem_in_perm = None
    if args.feat_keys:
        src_keys = tuple(args.src_feat_keys.split(","))
        dst_keys = tuple(args.feat_keys.split(","))
        if src_keys != dst_keys:
            stem_in_perm = feat_input_perm(src_keys, dst_keys)
            print(f"permuting stem input channels {src_keys} -> {dst_keys}: {stem_in_perm}")
    params, stats, unmatched = convert_state_dict(
        state_dict,
        args.model_type,
        backbone_prefix=args.backbone_prefix,
        stem_in_perm=stem_in_perm,
    )
    if unmatched:
        print(f"WARNING: {len(unmatched)} unmatched keys, e.g. {unmatched[:10]}")

    # init target state from config, then graft converted leaves
    import jax

    from pointcept_tpu.engines.defaults import default_config_parser
    from pointcept_tpu.engines.test import TesterBase
    from pointcept_tpu.engines.train import TrainState
    from pointcept_tpu.models.utils.checkpoint import save_checkpoint

    cfg = default_config_parser(args.config, {"save_path": os.path.dirname(args.output) or "."})
    tester = TesterBase(cfg)
    state = tester.state

    def graft(dst, src, path=""):
        out = {}
        grafted = missing = 0
        for k, v in dst.items():
            if isinstance(v, dict):
                o, g, m = graft(v, src.get(k, {}) if isinstance(src, dict) else {}, f"{path}/{k}")
                out[k] = o
                grafted += g
                missing += m
            else:
                s = src.get(k) if isinstance(src, dict) else None
                if s is not None and np.asarray(s).shape == np.asarray(v).shape:
                    out[k] = np.asarray(s, np.asarray(v).dtype)
                    grafted += 1
                else:
                    out[k] = np.asarray(v)
                    missing += 1
                    if s is not None:
                        print(f"shape mismatch at {path}/{k}: {np.asarray(s).shape} vs {np.asarray(v).shape}")
        return out, grafted, missing

    new_params, g1, m1 = graft(jax.tree_util.tree_map(np.asarray, state.params), params)
    new_stats, g2, m2 = graft(jax.tree_util.tree_map(np.asarray, state.batch_stats), stats)
    print(f"grafted {g1} params ({m1} left at init), {g2} batch stats ({m2} left)")
    state = state.replace(params=new_params, batch_stats=new_stats)
    save_checkpoint(args.output, state, epoch=int(ckpt.get("epoch", 0)))
    print(f"saved converted checkpoint to {args.output}")


if __name__ == "__main__":
    main()
