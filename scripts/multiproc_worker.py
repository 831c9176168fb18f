#!/usr/bin/env python
"""Worker for the true multi-process DP test (SURVEY §2.4 DCN path; VERDICT
r1 item 6).

Launched N times by tests/test_multiprocess.py (and runnable by hand):

  SSTPU_COORD=localhost:PORT SSTPU_NUM_PROCS=2 SSTPU_PROC_ID=i \
      python scripts/multiproc_worker.py /tmp/out_dir

Each process initializes jax.distributed over the CPU backend with 2 local
virtual devices (4 global), assembles its contiguous row-block of the global
batch through the process-sliced Loader, builds the global array via
``jax.make_array_from_process_local_data`` (the multi-host branch of
``parallel.mesh.shard_batch``), and runs ONE jitted supervised train step on
a 4-way data mesh.  It writes {proc, loss} JSON to the output dir; the test
asserts every process saw the identical global loss and that it equals the
single-process oracle on the gathered batch.
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys

# Must be set before jax import: CPU platform, 2 virtual local devices,
# and no axon session registration (contends with TPU jobs).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    out_dir = sys.argv[1]
    coord = os.environ["SSTPU_COORD"]
    nproc = int(os.environ["SSTPU_NUM_PROCS"])
    pid = int(os.environ["SSTPU_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc  # global devices

    import jax.numpy as jnp

    from semi_supervised_semantic_segmentation_tpu.data.datasets import build_dataset
    from semi_supervised_semantic_segmentation_tpu.data.pipeline import Loader
    from semi_supervised_semantic_segmentation_tpu.methods import supervised
    from semi_supervised_semantic_segmentation_tpu.models.registry import build_model
    from semi_supervised_semantic_segmentation_tpu.parallel import mesh as mesh_lib
    from tests.helpers import tiny_cfg

    cfg = tiny_cfg("supervised", crop=32, **{
        "train.labeled_batch_size": 4, "data.synthetic_size": 8,
    })
    mesh = mesh_lib.make_mesh(-1, 1)
    ds = build_dataset(cfg, "labeled")
    loader = Loader(
        ds, batch_size=4, seed=0, shuffle=False, num_workers=1,
        process_index=pid, process_count=nproc,
    )
    local = next(loader.epoch(0))
    local.pop("index")
    assert local["image"].shape[0] == 4 // nproc  # row-block only
    batch = mesh_lib.shard_batch(local, mesh)
    assert batch["image"].shape[0] == 4  # global array assembled

    model = build_model(cfg)
    state = supervised.init_state(cfg, model, jax.random.key(0), total_steps=10)
    state = mesh_lib.replicate(state, mesh)
    step = jax.jit(supervised.make_train_step(cfg, model, total_steps=10))
    state, metrics = step(state, batch)
    loss = float(jax.device_get(metrics["loss"]))

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
        json.dump({"proc": pid, "nproc": nproc, "loss": loss}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
