"""2-process multi-host integration (VERDICT r3 missing #5).

Spawns two real jax.distributed CPU processes (4 virtual devices each, 8
global) running tests/multihost_worker.py: disjoint per-host loader shards,
real Trainer epochs with make_array_from_process_local_data + psum'd loss,
rank-0 orbax checkpoint save and all-host restore.

Parity: reference `engines/launch.py:36-136` (mp.spawn + NCCL init) and
`scripts/train.sh:58-63` (SLURM multi-node rendezvous).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_checkpoint(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers pick their own platform/device-count flags
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # single-process prewarm pass first: compiles the same global-mesh graphs
    # into the persistent cache, so the distributed section below never
    # cold-compiles inside Gloo's collective timeout window (1-core CI box)
    pre = subprocess.run(
        [sys.executable, worker, "-1", "2", str(port), str(tmp_path / "prewarm")],
        capture_output=True,
        env=env,
        cwd=repo,
        text=True,
        timeout=2400,
    )
    assert pre.returncode == 0, f"prewarm failed:\n{pre.stdout[-2000:]}\n{pre.stderr[-4000:]}"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=repo,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        # 1-core CI boxes time-slice both workers; cold compiles dominate
        out, err = p.communicate(timeout=2400)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-2000:]}\n{err[-4000:]}"
    results = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    assert all(r["ok"] for r in results)
    # the step-pmean makes the loss identical across hosts
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["steps"] == results[1]["steps"] > 0
