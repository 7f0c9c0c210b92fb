"""Multi-host bring-up + process-0 gating.

The single-controller replacement for the reference's Horovod/MPI launch
(`classification_part/training.py:43-66`, Slurm `vgg_jpeg.sl:47`):
`jax.distributed.initialize()` once per host, a mesh over all processes'
devices, and `is_primary_process()` gating side-effects (dirs, checkpoints,
logs) the way the reference gates on `hvd.rank() == 0`
(`training.py:122-156`).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when a multi-host environment is detected
    (explicit args, JAX_COORDINATOR_ADDRESS, or a cloud-TPU metadata env).
    Returns True if distributed mode is active."""
    import jax

    # Re-entrancy: if a launcher (or an earlier call) already initialized the
    # distributed client, don't try again — initialize() raises on repeat.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # No multi-host contract in the environment.  Only NOW is it safe to
        # touch jax.process_count() — querying it earlier would initialize
        # the backend and make a later distributed.initialize() fail.
        return jax.process_count() > 1
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_primary_process() -> bool:
    import jax

    return jax.process_index() == 0
