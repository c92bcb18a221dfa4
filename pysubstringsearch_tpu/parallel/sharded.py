"""Sharded index build and search over a device mesh (shard_map + pjit).

Chunk-data-parallel SPMD programs:

- ``sharded_build_step``: every device builds the suffix arrays of its local
  corpus chunks (the vectorized prefix-doubling sort) — the analog of the
  reference's per-chunk libsais calls, but running on all chips at once.
- ``sharded_probe``: every device answers the (replicated) query batch
  against its local chunks; per-chunk hit ranges are all-gathered over ICI so
  every host sees the full [C, B, 2] result tensor — the analog of the
  reference's mutex-merged result vector (src/lib.rs:205-280), as a
  collective instead of a lock.

All functions take the stacked chunk-major layout of models/index.py:
``text [C, N_pad] uint8, n [C] int32, sa [C, N_pad] int32``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.search import probe_bounds_loop
from ..ops.suffix_array import _doubling_kernel
from .mesh import CHUNK_AXIS


def _build_one(text_row: jnp.ndarray, n_row: jnp.ndarray) -> jnp.ndarray:
    """Head-aligned SA of one padded chunk (real entries in [0, n)).

    Uses the plain (full-sort) doubling kernel, not the segmented one: this
    function is vmapped over the chunk axis, and under vmap a ``lax.cond``
    (the segmented kernel's overflow fallback) lowers to a select that
    executes BOTH branches — which would pay the full sort every round on
    top of the segmented work.  The Writer's per-chunk host loop (the real
    build path) does use the segmented kernel.
    """
    sa_full = _doubling_kernel(text_row, n_row)
    # _doubling_kernel yields real entries at the tail; rotate to the head.
    return jnp.roll(sa_full, n_row - text_row.shape[0])


build_chunks = jax.vmap(_build_one)  # [C, N_pad], [C] -> [C, N_pad]
# Loop-form probe (production compilation shape: one small while_loop
# program per geometry instead of a log2(N)-step unrolled binary search —
# the unrolled form is compile-prohibitive at real chunk sizes through a
# remote tunnel; see ops/search.py:probe_bounds_loop).
_probe_chunks = jax.vmap(probe_bounds_loop, in_axes=(0, 0, 0, None, None))


def make_sharded_build(mesh):
    """jitted [C, N_pad] build step, C sharded over the mesh."""
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        build_chunks,
        mesh=mesh,
        in_specs=(P(CHUNK_AXIS), P(CHUNK_AXIS)),
        out_specs=P(CHUNK_AXIS),
    )
    return jax.jit(fn)


def make_sharded_probe(mesh, gather: bool = True):
    """jitted sharded probe: (text, n, sa, patterns, lengths) -> [C, B, 2].

    With ``gather=True`` the per-device partial results are all-gathered over
    the mesh (ICI collective), so the output is replicated on every device.
    """
    from jax.sharding import PartitionSpec as P

    def local(text, n, sa, patterns, lengths):
        lo, cnt = _probe_chunks(text, n, sa, patterns, lengths)
        out = jnp.stack([lo, cnt], axis=-1)  # [C_local, B, 2]
        if gather:
            out = jax.lax.all_gather(out, CHUNK_AXIS, axis=0, tiled=True)
        return out

    # check_vma=False for the gathered case: the all_gather output is
    # replicated in value, but the varying-axis type system cannot express
    # varying -> invarying, so replication is asserted rather than inferred.
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CHUNK_AXIS), P(CHUNK_AXIS), P(CHUNK_AXIS), P(), P()),
        out_specs=P() if gather else P(CHUNK_AXIS),
        check_vma=not gather,
    )
    return jax.jit(fn)


def make_giant_chunk_build(mesh):
    """SA build of ONE chunk sharded across every chip of the mesh.

    The intra-chunk analog of sequence parallelism (SURVEY.md §5.7): the
    text array [N_pad] is split over the mesh axis and the whole doubling
    kernel runs as a GSPMD program — XLA partitions each ``lax.sort`` into a
    distributed sort (the all-to-all of this domain) and the rolls/scatters
    into ppermute/collective ops over ICI.  Use when a single chunk's build
    working set (~12 bytes/char transient) exceeds one chip's HBM — e.g. the
    reference-default 512 MiB chunks (int32 limit, libsais.c:38-44) on v5e.

    Returns a jitted ``(text_padded [N], n) -> sa_full [N]`` with sharded
    input/output; callers slice ``[N-n:]`` for the real entries (same
    contract as ops.suffix_array._doubling_kernel).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P(CHUNK_AXIS))
    return jax.jit(
        _doubling_kernel,
        in_shardings=(shard, NamedSharding(mesh, P())),
        out_shardings=shard,
    )


def make_full_step(mesh):
    """The framework's "training step": build SAs for all sharded chunks and
    immediately answer a query batch, with hit counts psum-reduced across the
    mesh — exercises compute + collectives in one compiled program.  Used by
    the multi-chip dry-run and as the end-to-end unit of the build+search
    pipeline."""
    from jax.sharding import PartitionSpec as P

    def local(text, n, patterns, lengths):
        sa = build_chunks(text, n)
        lo, cnt = _probe_chunks(text, n, sa, patterns, lengths)
        bounds = jax.lax.all_gather(
            jnp.stack([lo, cnt], axis=-1), CHUNK_AXIS, axis=0, tiled=True
        )
        total_hits = jax.lax.psum(jnp.sum(cnt, axis=0), CHUNK_AXIS)  # [B]
        return bounds, total_hits

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CHUNK_AXIS), P(CHUNK_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs replicated by all_gather/psum (see above)
    )
    return jax.jit(fn)
