"""Default argument parsing / config resolution / per-process setup.

Parity: reference `pointcept/engines/defaults.py:62-151`. The DDP helpers
(`create_ddp_model`, worker_init_fn) have no TPU equivalent — JAX SPMD shards a
single program; per-host batch splitting happens in the trainer against the
device mesh instead of a process group.
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os

from pointcept_tpu.utils import comm
from pointcept_tpu.utils.config import Config, DictAction
from pointcept_tpu.utils.env import get_random_seed, set_seed


def default_argument_parser(epilog=None):
    parser = argparse.ArgumentParser(
        epilog=epilog
        or """Examples: python tools/train.py --config-file configs/scannet/semseg-pt-v3m1-0-base.py --options save_path=exp/debug""",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--config-file", default="", metavar="FILE", help="path to config file")
    parser.add_argument(
        "--num-gpus", type=int, default=1, help="number of chips per machine (informational; JAX auto-detects)"
    )
    parser.add_argument("--num-machines", type=int, default=1, help="total number of hosts")
    parser.add_argument("--machine-rank", type=int, default=0, help="the rank of this machine")
    parser.add_argument("--dist-url", default="auto", help="coordinator address for multi-host jax.distributed")
    parser.add_argument(
        "--options", nargs="+", action=DictAction, help="custom options, e.g. save_path=exp/debug batch_size=8"
    )
    return parser


def default_config_parser(file_path: str, options):
    """Load config (path or `dataset-name` shorthand), merge CLI options, derive
    the epoch-compression loop (reference `engines/defaults.py:108-127`)."""
    if os.path.isfile(file_path):
        cfg = Config.fromfile(file_path)
    else:
        sep = file_path.find("-")
        cfg = Config.fromfile(os.path.join(file_path[:sep], file_path[sep + 1 :]))

    if options is not None:
        cfg.merge_from_dict(options)

    if cfg.get("seed", None) is None:
        cfg.seed = get_random_seed()

    cfg.data.train.loop = cfg.epoch // cfg.eval_epoch

    os.makedirs(os.path.join(cfg.save_path, "model"), exist_ok=True)
    if not cfg.get("resume", False):
        cfg.dump(os.path.join(cfg.save_path, "config.py"))
    return cfg


def default_setup(cfg):
    """Per-host setup: divide global batch across hosts, seed, log env."""
    world_size = comm.get_world_size()
    cfg.num_worker = cfg.get("num_worker", mp.cpu_count() // 2)
    cfg.num_worker_per_gpu = cfg.num_worker // world_size
    assert cfg.batch_size % world_size == 0, "batch_size must divide by host count"
    assert cfg.batch_size_val is None or cfg.batch_size_val % world_size == 0
    cfg.batch_size_per_gpu = cfg.batch_size // world_size
    cfg.batch_size_val_per_gpu = cfg.batch_size_val // world_size if cfg.batch_size_val is not None else 1
    cfg.batch_size_test_per_gpu = cfg.batch_size_test // world_size if cfg.get("batch_size_test", None) is not None else 1
    # update data loop with sharded repeats (parity: reference keeps global loop)
    seed = cfg.seed if cfg.get("seed") is not None else get_random_seed()
    rank = comm.get_rank()
    # shared (pre-offset) seed: model init must be IDENTICAL on every host —
    # the reference gets this from DDP's rank-0 param broadcast
    # (engines/defaults.py:22-43); our equivalent is initializing from the
    # same key everywhere. The per-rank offset seed drives data augmentation.
    cfg.shared_seed = seed
    seed = seed * world_size + rank
    set_seed(seed)
    cfg.seed = seed
    return cfg
