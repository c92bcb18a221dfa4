"""Multi-host (N>=2 process) runtime glue.

The reference has no distributed backend at all (SURVEY.md §5.8 — rayon
threads in one address space, a mutex as the only "collective").  Here the
multi-host story is the single-host one scaled up: every process owns the
corpus chunks assigned to its devices, the query batch is replicated, and
per-chunk hit ranges flow back over DCN via ``process_allgather``.

Search is stateless per batch, so failure recovery is re-dispatch
(SURVEY.md §5.3): a lost host means re-running the batch against its chunk
shard after reassignment; no in-flight state needs checkpointing beyond the
container file itself.
"""

from __future__ import annotations

import typing

import jax
import numpy as np


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the distributed runtime (TCP coordinator; works for CPU test
    meshes and TPU pods alike)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def my_chunk_ids(num_chunks: int) -> typing.List[int]:
    """Round-robin chunk -> process assignment; each process loads only its
    own chunks' text and SA from the container."""
    pid = jax.process_index()
    nproc = jax.process_count()
    return [c for c in range(num_chunks) if c % nproc == pid]


def allgather_counts(local_counts: np.ndarray) -> np.ndarray:
    """Gather per-process [C_local, B] hit-count blocks to every host."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(local_counts, tiled=False)
    )
