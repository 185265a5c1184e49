"""Multi-host runtime initialisation and host-sharded input streams.

The TPU-native replacement for the reference's cluster batch systems
(parasol / gridEngine over a shared filesystem, reference Makefile:2,
SURVEY.md section 5): one process per host over DCN, 4-8 chips per host
over ICI, reads streamed host-sharded, statistics tensors all-reduced by
XLA collectives under jit.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("nanopore_tpu")


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """jax.distributed.initialize from args or standard env vars.

    Returns (process_index, process_count).  Safe to call in
    single-process runs (no-op).
    """
    coordinator = coordinator_address or os.environ.get(
        "NANOPORE_TPU_COORDINATOR"
    )
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes
            or int(os.environ.get("NANOPORE_TPU_NUM_PROCESSES", "1")),
            process_id=process_id
            or int(os.environ.get("NANOPORE_TPU_PROCESS_ID", "0")),
        )
        logger.info(
            "distributed runtime: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def host_shard(items: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """This host's strided shard of a work list (reads, experiments...).

    Strided rather than blocked so read-length skew balances across
    hosts without a length-sort pass.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]
