"""True multi-process data parallelism (SURVEY §2.4; VERDICT r1 item 6).

Launches TWO actual JAX processes (subprocesses, CPU backend, 2 virtual
devices each) that rendezvous through ``jax.distributed.initialize``, build
one 4-device global mesh, assemble the global batch from per-process
row-blocks via ``jax.make_array_from_process_local_data``, and run one
jitted train step.  Asserts both processes compute the identical global
loss AND that it matches a single-process run on the gathered batch — i.e.
the multi-host branch of ``parallel.mesh.shard_batch`` has actually
executed, not just been unit-sliced.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            SSTPU_COORD=f"localhost:{port}",
            SSTPU_NUM_PROCS="2",
            SSTPU_PROC_ID=str(pid),
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "scripts", "multiproc_worker.py"),
                 str(tmp_path)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    losses = []
    for pid in range(2):
        with open(tmp_path / f"proc{pid}.json") as f:
            rec = json.load(f)
        assert rec["nproc"] == 2
        losses.append(rec["loss"])
    # Both processes see the same global (psum-reduced) loss.
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses

    # Single-process oracle on the same global batch, same seed/state.
    import jax

    from semi_supervised_semantic_segmentation_tpu.data.datasets import build_dataset
    from semi_supervised_semantic_segmentation_tpu.data.pipeline import Loader
    from semi_supervised_semantic_segmentation_tpu.methods import supervised
    from semi_supervised_semantic_segmentation_tpu.models.registry import build_model
    from semi_supervised_semantic_segmentation_tpu.parallel import mesh as mesh_lib

    from tests.helpers import tiny_cfg

    cfg = tiny_cfg("supervised", crop=32, **{
        "train.labeled_batch_size": 4, "data.synthetic_size": 8,
    })
    ds = build_dataset(cfg, "labeled")
    loader = Loader(ds, batch_size=4, seed=0, shuffle=False, num_workers=1)
    batch = next(loader.epoch(0))
    batch.pop("index")
    # Cap data-parallel at the batch size: under the suite's forced-8-device
    # CPU the full mesh would need batch%8==0, and mesh width doesn't change
    # the psum-reduced loss.
    mesh = mesh_lib.make_mesh(min(4, len(jax.devices())), 1)
    model = build_model(cfg)
    state = supervised.init_state(cfg, model, jax.random.key(0), total_steps=10)
    state = mesh_lib.replicate(state, mesh)
    step = jax.jit(supervised.make_train_step(cfg, model, total_steps=10))
    _, metrics = step(state, mesh_lib.shard_batch(batch, mesh))
    oracle = float(jax.device_get(metrics["loss"]))
    assert losses[0] == pytest.approx(oracle, abs=5e-5), (losses[0], oracle)
