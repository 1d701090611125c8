"""Real multi-process ``jax.distributed`` smoke (VERDICT r2 #6).

Spawns TWO actual Python processes with a localhost coordinator, each
initializing through ``maybe_initialize_distributed`` (the same entry every
train CLI calls), and checks:

* both ranks see the 2-process world (``loader_shard``),
* a cross-process ``psum`` over the global mesh returns the true global sum,
* ``DetectionLoader`` host sharding yields disjoint index sets whose union
  is the full epoch.

The reference has no distributed code at all (SURVEY.md §2c/§5.8); this is
the TPU-native substitute's proof that it actually forms a cluster, not just
that it tries to.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "_distributed_worker.py"
_FIT_WORKER = Path(__file__).parent / "_distributed_fit_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_cluster():
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        # Strip the test-session JAX env (virtual 8-device CPU flags) so each
        # worker gets one local CPU device.
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")
    }
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            MMOE_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            MMOE_NUM_PROCESSES="2",
            MMOE_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(_WORKER)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out (coordinator never formed?)")
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for o in outs:
        assert o["world"] == 2
        # psum of (1) + (2) across processes
        assert o["psum"] == pytest.approx(3.0)
    i0, i1 = set(by_rank[0]["indices"]), set(by_rank[1]["indices"])
    assert i0.isdisjoint(i1)
    assert i0 | i1 == set(range(10))


@pytest.mark.timeout(900)
def test_two_process_fit(tmp_path):
    """End-to-end 2-process TRAINING smoke (VERDICT r3 #7): a real
    ``DetectionTrainer.fit`` across two jax.distributed processes — global
    batches assembled from per-process loader shards, collective Orbax
    checkpoint writes (rank-0 rename swap), early pause, and a resume that
    finishes the run. The replicated-param checksum must agree across ranks
    (the gradient psum really synchronized) and the step count must show
    the resume continued rather than restarted."""
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")
    }
    run_dir = tmp_path / "run"
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            MMOE_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            MMOE_NUM_PROCESSES="2",
            MMOE_PROCESS_ID=str(rank),
            MMOE_TEST_RUN_DIR=str(run_dir),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(_FIT_WORKER)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed fit worker timed out")
        assert p.returncode == 0, f"fit worker failed:\nstdout={out}\nstderr={err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for o in outs:
        assert o["world"] == 2
        assert o["epochs_phase1"] == 2
        assert o["epochs_total"] == 3  # resume continued, not restarted
        assert o["final_step"] == 6  # 3 epochs x 2 steps, carried across resume
        assert o["weights_exist"] == {"last": True, "best": True}
        assert np.isfinite(o["loss_last"])
    assert by_rank[0]["param_checksum"] == pytest.approx(
        by_rank[1]["param_checksum"], rel=1e-6
    )
