"""Multi-host distributed runtime (SURVEY.md section 2.6).

The reference is strictly single-process/single-GPU; the TPU-native scaling
story is: ``jax.distributed.initialize`` connects the processes of a pod
slice (or any multi-host job), after which ``jax.devices()`` is GLOBAL and a
single ``Mesh`` + GSPMD program spans all hosts — collectives ride ICI with
zero hand-written comm code. This module is the one place that touches the
process-level runtime.

Launch procedure (one process per host; same command everywhere):

    C2D_COORDINATOR=10.0.0.1:8476 C2D_NUM_PROCESSES=4 C2D_PROCESS_ID=$RANK \\
        python -m clap2diffusion_tpu.apps.main train --stage 2 ...

On Cloud TPU pods set ``C2D_AUTO_DIST=1`` instead of the three variables —
``jax.distributed.initialize()`` is then called bare and auto-detects the
topology from the TPU metadata server. (Auto-detection is NOT attempted by
default: a bare initialize() on a non-pod host hangs waiting for a
coordinator.) On CPU (tests) the collectives run over Gloo; see
tests/test_distributed.py for a real 2-process launch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Connect this process to the job. Returns True if multi-process.

    Arguments fall back to ``C2D_COORDINATOR`` / ``C2D_NUM_PROCESSES`` /
    ``C2D_PROCESS_ID``; ``C2D_AUTO_DIST=1`` opts into jax's TPU-pod
    auto-detection (bare initialize()). With none of those set this is a
    no-op (single process). Idempotent: a second call is a no-op.

    MUST run before anything initializes the JAX backend (jit, device
    query, param init): jax.distributed.initialize raises RuntimeError
    after backend init. Entry points call this first for that reason.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("C2D_COORDINATOR")
    env_n = os.environ.get("C2D_NUM_PROCESSES")
    env_i = os.environ.get("C2D_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None
    )
    process_id = process_id if process_id is not None else (
        int(env_i) if env_i else None
    )
    if coordinator is None and num_processes is None:
        if os.environ.get("C2D_AUTO_DIST") == "1":
            jax.distributed.initialize()  # TPU-pod metadata auto-detection
            _INITIALIZED = True
            return jax.process_count() > 1
        return False  # single-process: never touch the distributed runtime

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def is_coordinator() -> bool:
    """True on the process that owns logging / metric emission."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def shard_host_batch(mesh, batch, axis: int = 0):
    """Place a per-process batch shard onto the global mesh's data axis.

    ``axis`` selects which dimension is the (host-sharded) batch dimension —
    0 for plain batches, 1 for scan-stacked [steps, batch, ...] batches.
    Each process feeds only its local slice (that dim =
    global / process_count); ``make_array_from_process_local_data``
    assembles the logically-global array. Single-process: behaves exactly
    like ``parallel.sharding.shard_batch``.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    nproc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[axis] = "data"
        sharding = NamedSharding(mesh, P(*spec))
        if nproc == 1:
            return jax.device_put(x, sharding)
        global_shape = (
            x.shape[:axis] + (x.shape[axis] * nproc,) + x.shape[axis + 1:]
        )
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(place, batch)
