"""Multi-host bring-up (SURVEY §2.4: ICI in-slice, DCN across hosts).

The data-parallel code is already multi-host clean: the mesh is built over
``jax.devices()`` (global after distributed init), batches are sharded on
'data', and GSPMD emits the collectives.  The only host-side work is calling
``jax.distributed.initialize()`` before any backend use, and restricting
host-side batch assembly to each process's addressable shard — implemented:
``data/pipeline.py`` slices the id-list per process
(``Loader(process_index, process_count)``) and ``tests/test_multihost_loader.py``
pins that the per-process shards partition the global order exactly.

``maybe_initialize()`` is called by train.py; it triggers when standard
coordinator env vars are present (JAX_COORDINATOR_ADDRESS / cloud-TPU pod
env) or SSTPU_MULTIHOST=1 is set, and is a no-op otherwise (single host,
including the single-chip dev tunnel).
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    trigger = (
        os.environ.get("SSTPU_MULTIHOST") == "1"
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not trigger:
        return False
    import jax

    jax.distributed.initialize()
    return True


def process_info():
    import jax

    return {"process_index": jax.process_index(), "process_count": jax.process_count()}
