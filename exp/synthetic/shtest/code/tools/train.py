"""Training entry point (parity: reference `tools/train.py`)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointcept_tpu.engines.defaults import (
    default_argument_parser,
    default_config_parser,
    default_setup,
)
from pointcept_tpu.engines.launch import launch


def main_worker(cfg):
    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = default_setup(cfg)
    from pointcept_tpu.engines.train import TRAINERS

    trainer = TRAINERS.build(dict(type=cfg.train.type, cfg=cfg))
    trainer.train()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(
        main_worker,
        num_gpus_per_machine=args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        cfg=(cfg,),
    )


if __name__ == "__main__":
    main()
