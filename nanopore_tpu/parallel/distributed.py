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


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(tag: str) -> None:
    """Cross-host sync point; no-op in single-process runs.

    The TPU-native analogue of the reference's follow-on-target joins
    (jobTree setFollowOnTarget, e.g. utils.py:572): all hosts must
    reach the same barriers in the same order (call from the main
    thread only — interleaved collectives from worker threads would
    disorder the global collective stream).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("nanopore_tpu:" + tag)


def coordinator_decision(value: bool) -> bool:
    """Host 0's boolean, agreed by every host (skip/run consensus).

    Control decisions that depend on shared-filesystem state (e.g. "does
    mapping.sam already exist?") must not diverge across hosts — a host
    that skips a cooperative step while another enters its barriers
    deadlocks the collective stream.  Single-process: returns value.
    """
    if jax.process_count() <= 1:
        return value
    import numpy as np
    from jax.experimental import multihost_utils

    agreed = multihost_utils.broadcast_one_to_all(
        np.asarray([1 if value else 0], dtype=np.int32)
    )
    return bool(np.asarray(agreed)[0])


def shard_paths(base_path: str, process_count: int | None = None) -> list[str]:
    pc = jax.process_count() if process_count is None else process_count
    return ["%s.shard%d" % (base_path, pi) for pi in range(pc)]


def merge_sam_shards(
    paths: list[str], output_path: str, order: str = "sorted"
) -> int:
    """Host-0 merge of per-host SAM shards into one file.

    ``order="sorted"``: records re-sorted by the deterministic
    SamRecord.sort_key — what map_fastq does single-host.
    ``order="interleave"``: round-robin by record across shards, which
    reconstructs the original list order when shard i held items
    [i::n] of an ordered record list (the realign case: one global
    record per (read, ref) in chained order).  Shard files are removed
    after the merge.  Returns the merged record count.

    Both orders STREAM: memory is O(shards), not O(records), so the
    host-0 merge scales to pod-size outputs.  The sorted merge is a
    k-way heap merge relying on each shard being internally sorted by
    SamRecord.sort_key (map_fastq sorts before writing); shard order is
    verified while streaming and an unsorted shard falls back to an
    in-memory sort of that merge.
    """
    import heapq

    from nanopore_tpu.io.sam import SamReader, SamWriter

    readers = [SamReader(p) for p in paths]
    count = 0
    with SamWriter(output_path, template=readers[0]) as writer:
        if order == "interleave":
            # original index of shard i's j-th record is j*n + i, so
            # taking row j across shards in shard order reconstructs
            # list order
            iters = [iter(r) for r in readers]
            live = list(iters)
            while live:
                nxt = []
                for it in live:
                    rec = next(it, None)
                    if rec is not None:
                        writer.write(rec)
                        count += 1
                        nxt.append(it)
                live = nxt
        else:
            # same key map_fastq sorts with single-host; a read's
            # candidates all live in one shard (reads are sharded
            # whole), so the k-way merge reproduces single-host order
            def checked(reader):
                prev_key = None
                for rec in reader:
                    key = rec.sort_key()
                    if prev_key is not None and key < prev_key:
                        raise _UnsortedShard(reader.path)
                    prev_key = key
                    yield key, rec

            try:
                for _, rec in heapq.merge(
                    *(checked(r) for r in readers), key=lambda kr: kr[0]
                ):
                    writer.write(rec)
                    count += 1
            except _UnsortedShard:
                merged = [rec for r in readers for rec in r]
                merged.sort(key=lambda r: r.sort_key())
                writer._fh.seek(0)
                writer._fh.truncate()
                writer._fh.write("@HD\tVN:1.6\tSO:unknown\n")
                for line in readers[0].header_lines:
                    if not line.startswith("@HD"):
                        writer._fh.write(line + "\n")
                for rec in merged:
                    writer.write(rec)
                count = len(merged)
    for p in paths:
        try:
            os.remove(p)
        except OSError:  # pragma: no cover
            pass
    return count


class _UnsortedShard(Exception):
    pass
