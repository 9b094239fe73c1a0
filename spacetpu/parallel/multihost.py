"""Multi-host distributed runtime: `jax.distributed` plumbing.

One TPU host sees only its local chips; scaling an N-body run past a
single host (pod slices — ICI within a slice, DCN across hosts) requires
every process to join one JAX distributed runtime before any backend
initializes. The reference has no distributed layer at all (single
process, shared memory — SURVEY.md SS5); this is the TPU-native one.

Usage (same program on every host):

    from spacetpu.parallel import multihost
    multihost.initialize()            # env-driven; no-op single-process
    mesh = ring.make_mesh()           # jax.devices() is now GLOBAL
    sim  = ring.ShardedSimulation(mesh, n, ...)  # collectives ride
                                      # ICI within a host, DCN across

On Cloud TPU pods `jax.distributed.initialize()` discovers everything
from the TPU metadata; elsewhere set the usual triplet explicitly or via
env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
`tests/test_multihost.py` proves the plumbing composes by running a real
two-process CPU-backend mesh through a body-sharded force step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join the distributed runtime. Returns True if initialized.

    Argument resolution order: explicit args, then the standard JAX env
    variables (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID), then Cloud-TPU autodetection (args all None). With
    no args and no env on a non-TPU-pod machine this is a no-op (single
    process) rather than an error, so the same entry point runs anywhere.
    """
    global _initialized
    if _initialized:
        return True
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    on_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                      or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0
