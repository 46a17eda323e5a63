"""Multi-host initialization.

The reference's multi-process story is an NCCL DDP launcher
(models/vqvae2/distributed/launch.py:21-91: mp.spawn + TCP init + process
groups).  On TPU pods the runtime handles process coordination; this is
the one call each host makes before building the global mesh -- afterwards
jax.devices() spans the slice and the existing pjit code is unchanged."""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (no-op on single-host TPU/CPU setups,
    where the arguments are auto-detected from the TPU metadata server).
    Returns the global device count."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
    return len(jax.devices())
