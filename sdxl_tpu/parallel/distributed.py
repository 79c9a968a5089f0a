"""Multi-host initialization.

The reference is strictly single-process/single-GPU (SURVEY.md §5 —
no NCCL/MPI anywhere). For multi-host TPU slices the idiomatic JAX path is
jax.distributed + a global mesh: batch fan-out rides DCN between hosts,
tensor-parallel collectives stay on ICI within a slice.

Call ensure_initialized() before building a mesh on a multi-host
deployment; it is a no-op on a single host (and under tests).
"""

from __future__ import annotations

import os

from ..utils import log

_initialized = False


def ensure_initialized(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), retrying
    transient coordinator failures."""
    global _initialized
    if _initialized:
        return

    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        _initialized = True  # single host
        return

    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0")
    )

    last_err = None
    for attempt in range(3):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _initialized = True
            log(
                f"jax.distributed up: process {process_id}/{num_processes} "
                f"via {coordinator_address}"
            )
            return
        except Exception as e:  # transient coordinator races
            last_err = e
            log(f"jax.distributed init attempt {attempt} failed: {e}")
    raise RuntimeError(f"jax.distributed failed to initialize: {last_err}")
