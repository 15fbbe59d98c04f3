"""Multi-host distributed runtime (SPMD over all hosts of a slice).

SURVEY §2 'Parallelism strategies' names the TPU-native scale-out path:
``jax.distributed`` + jit/GSPMD over the ICI mesh, data-parallel across a
v5e-16 slice. v5e-16 spans multiple hosts, so the trainer must run as one
SPMD program per host:

  - every process calls :func:`initialize` (flag- or env-gated) before any
    device use, which wires the JAX coordination service and makes
    ``jax.devices()`` return the GLOBAL device list;
  - the mesh is built over those global devices exactly as single-host —
    GSPMD programs are identical, XLA inserts cross-host collectives (ICI
    within a slice, DCN across slices);
  - each process loads only its own slice of every global batch
    (data/loader.py ``process_index``/``process_count``) and assembles the
    global on-device batch with ``jax.make_array_from_process_local_data``;
  - exactly one process (index 0) writes checkpoints/metrics/logs.

The reference is single-GPU and has nothing here; this is the TPU-native
equivalent of what torchrun+DDP would be for it (SURVEY.md §2).

Launch recipe (one command per host):

    python -m audio_llama_tpu.training.train \
        --distributed --coordinator_address HOST0:12355 \
        --num_processes 4 --process_id $HOST_RANK ...

On Cloud TPU pods, ``--distributed`` alone suffices: ``jax.distributed
.initialize()`` auto-detects coordinator/rank from the TPU metadata. The
2-process CPU integration test (tests/test_distributed.py) exercises the
full path: Gloo collectives, global mesh, per-process loader shards,
global-batch assembly, loss parity with single-process.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """jax.distributed.initialize with optional explicit wiring.

    Explicit args serve CPU/GPU fleets and tests; on TPU pods all three are
    auto-detected from the runtime (pass nothing). Returns
    (process_index, process_count) after initialization. Idempotent-ish:
    calling with an already-initialized runtime returns the current state.
    """
    import jax

    try:
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes and num_processes > 0:
            kwargs["num_processes"] = num_processes
        if process_id is not None and process_id >= 0:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    pi, pc = jax.process_index(), jax.process_count()
    logger.info("distributed runtime: process %d of %d", pi, pc)
    return pi, pc


def process_info() -> tuple[int, int]:
    """(process_index, process_count); (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0


def make_global_batch(local_batch, shardings):
    """Assemble a globally-sharded on-device batch from this process's local
    shard (the loader's per-process rows).

    local_batch: pytree of host numpy arrays whose BATCH axis holds only this
    process's rows (global_batch / process_count of them).
    shardings: matching pytree of NamedShardings over the global mesh (the
    same ones the jitted step declares as in_shardings).

    Single-process this degrades to jax.device_put semantics; use it
    unconditionally only behind a process_count > 1 check so the common case
    keeps device_put's async one-ahead transfer behavior.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, x),
        local_batch,
        shardings,
    )
