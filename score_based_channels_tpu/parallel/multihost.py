"""Multi-host initialization (SURVEY.md §2.4 communication backend).

The reference has no distributed backend at all (no NCCL/MPI/torch.
distributed anywhere). Here multi-host runs need exactly one extra call
before any jax use; everything else (mesh construction, sharding, the
trainers and sweep runners) already operates on GLOBAL devices.

Design (SURVEY.md §2.4): the 5.9M-param model is replicated; the batch
axis {channels × SNR × hparams} shards across all chips of all hosts.
Collectives ride ICI within a slice; only the training gradient
all-reduce and final NMSE gathers cross DCN.

Usage on each host of a pod slice:

    from score_based_channels_tpu.parallel import multihost
    multihost.initialize()            # TPU pod: auto-detected
    mesh = make_mesh()                # all global devices

For CPU-based multi-process testing pass coordinator/num_processes
explicitly (the JAX distributed runtime works identically).
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection defaults."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
