"""Worker for test_multihost.py: one of two jax.distributed CPU processes.

Run as: python tests/multihost_worker.py <pid> <nproc> <port> <workdir>

Each process gets 4 virtual CPU devices (8 global over 2 hosts), builds its
OWN per-host loader shard, runs REAL Trainer epochs over the global mesh
(make_array_from_process_local_data + shard_map psum), saves an orbax
checkpoint (rank 0 only), restores it, and verifies:
  * loader shards are disjoint and cover the dataset (allgathered)
  * the train loss is bit-identical across hosts (pmean'd inside the step)
  * post-restore params are bit-identical to the trained state on every host

Parity: reference launch/DDP semantics (`engines/launch.py:36-136`,
`scripts/train.sh:58-63`) — multi-node training with per-rank samplers and
rank-0 checkpointing.
"""

import json
import os
import sys


def main():
    pid, nproc, port, workdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    # prewarm mode (pid == -1): same trainer graphs on a single process with
    # the same GLOBAL device count, no jax.distributed — populates the
    # persistent compile cache so the real 2-process run compiles nothing.
    # Without it, the 1-core CI box cold-compiles inside the distributed
    # section and one worker outlives Gloo's 1800 s collective window while
    # the other waits in process_allgather (observed in the r4 review).
    prewarm = pid < 0
    n_local = 4 * nproc if prewarm else 4
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if not prewarm:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
        assert jax.process_count() == nproc
        assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    # persistent compile cache: both workers compile the same train/eval
    # graphs; on the 1-core CI box a cold compile dominates the 1200 s budget
    from pointcept_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache("/root/.jax_compile_cache_tests", min_compile_secs=0.2)
    import numpy as np
    from jax.experimental import multihost_utils

    from pointcept_tpu.engines.defaults import default_config_parser, default_setup
    from pointcept_tpu.engines.train import TRAINERS

    cfg = default_config_parser(
        os.path.join(repo, "configs/synthetic/semseg-pt-v3m1-0-tiny.py"),
        dict(
            save_path=os.path.join(workdir, "exp"),
            num_worker=0,
            batch_size=8,  # 1 scene per global device
            epoch=2,
            eval_epoch=2,
            evaluate=False,
        ),
    )
    cfg = default_setup(cfg)
    trainer = TRAINERS.build(dict(type=cfg.train.type, cfg=cfg))

    if prewarm:
        # compile the train/eval graphs into the persistent cache and exit
        trainer.train()
        print(json.dumps({"pid": pid, "ok": True, "prewarm": True}))
        return

    # --- per-host loader shards are disjoint and cover the dataset ---
    loader = trainer.train_loader
    assert loader.process_count == nproc and loader.process_index == pid
    local_idx = [i for batch in loader._index_batches() for i in batch]
    pad = np.full(64, -1, np.int64)
    pad[: len(local_idx)] = local_idx
    all_idx = np.asarray(multihost_utils.process_allgather(pad)).reshape(nproc, -1)
    mine = set(all_idx[pid][all_idx[pid] >= 0].tolist())
    other = set(all_idx[1 - pid][all_idx[1 - pid] >= 0].tolist())
    assert mine and other and not (mine & other), "loader shards overlap"

    trainer.train()
    loss = float(trainer.comm_info["metrics"]["loss"])
    losses = np.asarray(
        multihost_utils.process_allgather(np.array([loss], np.float64))
    ).ravel()
    assert np.all(losses == losses[0]), f"per-host losses diverged: {losses}"

    # --- multihost checkpoint: rank 0 saved; all hosts restore and match ---
    ckpt = os.path.join(cfg.save_path, "model", "model_last")
    multihost_utils.sync_global_devices("ckpt_saved")
    assert os.path.exists(ckpt), "rank-0 checkpoint missing"
    from pointcept_tpu.models.utils.checkpoint import restore_state

    restored = restore_state(ckpt, trainer.state)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, trainer.state.params)
        ),
        jax.tree_util.tree_leaves_with_path(restored["params"] if isinstance(restored, dict) else restored.params),
    ):
        assert np.array_equal(a, np.asarray(b)), f"restore mismatch at {jax.tree_util.keystr(pa)}"

    print(json.dumps({"pid": pid, "loss": loss, "steps": int(trainer.state.step), "ok": True}))


if __name__ == "__main__":
    main()
