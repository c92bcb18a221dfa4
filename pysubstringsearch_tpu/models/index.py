"""The flagship "model" of this framework: a device-resident substring index.

Where the reference keeps chunk text in host RAM and leaves suffix arrays on
disk behind per-probe file seeks (reference: src/lib.rs:146-199), the TPU
design inverts the memory model: both text and SA for every chunk are
resident in device HBM as stacked, padded, statically-shaped arrays —

    text [C, N_pad] uint8    sa [C, N_pad] int32    n [C] int32
    table [C, 66565] int32   (2-byte prefix bucket table, see ops/search.py)

so a batch of queries is answered by a single jitted program: a vmapped
bucket-seeded lower/upper-bound probe over the chunk axis (the analog of the
reference's rayon fan-out over sub-indexes, src/lib.rs:207).  The chunk axis
``C`` is also the sharding axis for multi-chip / multi-host meshes (see
pysubstringsearch_tpu.parallel).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..container import Chunk
from ..ops import search as search_ops
from ..ops.suffix_array import _pad_len


class DeviceIndex:
    """Stacked padded chunks on one device (or replicated; sharding is
    layered on top by pysubstringsearch_tpu.parallel)."""

    def __init__(self, chunks: typing.Sequence[Chunk]) -> None:
        self.num_chunks = len(chunks)
        if self.num_chunks == 0:
            self.n_pad = 8
            self.text = jnp.zeros((0, 8), jnp.uint8)
            self.sa = jnp.zeros((0, 8), jnp.int32)
            self.lengths = jnp.zeros((0,), jnp.int32)
            self.tables = jnp.zeros(
                (0, search_ops.BUCKET_TABLE_SIZE), jnp.int32
            )
            return
        max_n = max(c.data.size for c in chunks)
        # Margin so suffix windows up to PAD_MARGIN bytes never clamp.
        n_pad = _pad_len(max_n + search_ops.PAD_MARGIN)
        text = np.zeros((self.num_chunks, n_pad), dtype=np.uint8)
        sa = np.zeros((self.num_chunks, n_pad), dtype=np.int32)
        n = np.zeros((self.num_chunks,), dtype=np.int32)
        for i, c in enumerate(chunks):
            text[i, : c.data.size] = c.data
            sa[i, : c.suffix_array.size] = c.suffix_array
            n[i] = c.data.size
        self.n_pad = n_pad
        self.text = jnp.asarray(text)
        self.sa = jnp.asarray(sa)
        self.lengths = jnp.asarray(n)
        # Tables and packed prefix keys are built on the host: zero device
        # round trips at load time (the first D2H readback degrades all later
        # dispatches in this environment's remote runtime — keep the load
        # path H2D-only).
        host_tables = np.stack([
            search_ops.build_bucket_table_host(c.data, c.suffix_array)
            for c in chunks
        ])
        self.tables = jnp.asarray(host_tables)
        # Widest bucket across chunks fixes the static bisection depth.
        widths = np.diff(host_tables, axis=1).max(axis=1)
        self.probe_steps = search_ops.steps_for_width(int(widths.max()))
        self.num_limbs = search_ops.KEY_LIMBS
        limbs = np.zeros(
            (self.num_chunks, n_pad * self.num_limbs), dtype=np.int32
        )
        for i, c in enumerate(chunks):
            k = search_ops.build_limbs_host(
                c.data, c.suffix_array, self.num_limbs
            )
            limbs[i, : k.size] = k.reshape(-1)
        self.limbs = jnp.asarray(limbs)

    def probe_device(
        self,
        patterns: np.ndarray,  # uint8 [B, L]
        lengths: np.ndarray,  # int32 [B]
    ) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
        """(lower, count) int32 [C, B] as DEVICE arrays — no host readback.

        The benchmark path: callers that only need device-side results (or
        want to defer the transfer) use this to keep the process free of
        D2H round trips.
        """
        # deep refinement only when the batch has patterns beyond the packed
        # key coverage — a static (host-known) decision per pattern width.
        deep = (
            self.probe_steps
            if patterns.shape[1] > search_ops.key_cover_bytes(self.num_limbs)
            else 0
        )
        probe = search_ops.limbs_batch_jit(
            self.probe_steps, deep, self.num_limbs
        )
        return probe(
            self.text, self.lengths, self.sa, self.tables, self.limbs,
            jnp.asarray(patterns), jnp.asarray(lengths),
        )

    def probe(
        self,
        patterns: np.ndarray,  # uint8 [B, L]
        lengths: np.ndarray,  # int32 [B]
    ) -> typing.Tuple[np.ndarray, np.ndarray]:
        """(lower, count) int32 [C, B]: SA range of matches per (chunk, query)."""
        B = patterns.shape[0]
        if (
            self.num_chunks == 0
            or B == 0
            or patterns.shape[1] > self.n_pad  # longer than any text: no hits
        ):
            zeros = np.zeros((self.num_chunks, B), dtype=np.int32)
            return zeros, zeros.copy()
        lo, cnt = self.probe_device(patterns, lengths)
        return np.asarray(lo), np.asarray(cnt)
