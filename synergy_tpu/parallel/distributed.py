"""Multi-host initialization (the reference's setup()/NCCL rendezvous,
re-designed for TPU pods).

The reference spawns one process per GPU and rendezvous over localhost TCP
(reference main_pretraining.py:61-67, 283-292). On TPU, one process per host
drives all local chips; ``jax.distributed.initialize()`` wires the hosts and
every collective rides ICI/DCN via XLA. Single-host runs need no init at all.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed(coordinator: str = None,
                                 num_processes: int = None,
                                 process_id: int = None) -> bool:
    """Initialize multi-host JAX when the standard env/args are present
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU pod metadata
    auto-detection). Returns True if distributed mode is active."""
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")
    if coordinator is None and num_processes is None:
        return False  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def _int_env(name: str):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary() -> bool:
    """Rank-0 equivalent (the reference gates logging/checkpointing on
    rank == 0, main_pretraining.py:152, 222)."""
    return jax.process_index() == 0
