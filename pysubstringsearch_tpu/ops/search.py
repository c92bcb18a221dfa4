"""Batched substring probe: vectorized lower/upper-bound search over the SA.

The reference answers one pattern at a time with a scalar binary search whose
every probe is a file seek (reference: src/lib.rs:212-252), and its
``search_multiple`` is a sequential Python loop (pysubstringsearch/__init__.py:61-73).
Here the whole query batch is a first-class axis: patterns are packed into a
``[B, L]`` uint8 tensor and *both* bounds for *all* patterns advance together
through one ``lax.fori_loop`` of ``ceil(log2 n)`` steps — each step is a
single batched gather from the text in HBM plus a vectorized lexicographic
compare on the VPU.

Semantics match the reference byte compare exactly:

- ``lower`` = first SA slot whose suffix is >= the pattern, where a suffix
  that *starts with* the pattern compares equal (src/lib.rs:219-220).
- ``upper`` = first SA slot whose suffix is > the pattern and does not start
  with it.  ``count = upper - lower`` is the number of matching suffixes.

The trick that fuses the two searches: classify each (pattern, suffix) pair
with a three-way compare ``cmp ∈ {-1, 0, +1}`` (0 = pattern is a prefix).
Then ``lower`` is the first slot with ``cmp >= 0`` and ``upper`` the first
with ``cmp >= 1`` — one predicate parameterized by a threshold, so both
bounds run as a single ``[2B]`` search.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ['probe_bounds', 'probe_bounds_batch', 'pack_patterns']


def pack_patterns(patterns, max_len: int | None = None):
    """Pack byte-string patterns into (uint8[B, L], int32[B]) host arrays.

    ``L`` is rounded up to a multiple of 8 (min 8) to bound jit retraces
    across pattern-length distributions.
    """
    lengths = np.array([len(p) for p in patterns], dtype=np.int32)
    L = int(lengths.max(initial=0)) if max_len is None else max_len
    L = max(8, -(-L // 8) * 8)
    packed = np.zeros((len(patterns), L), dtype=np.uint8)
    for i, p in enumerate(patterns):
        packed[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    return packed, lengths


def _cmp3(text, n, sa, slots, patterns_p1, lengths):
    """Three-way compare of each pattern against the suffix at SA[slot].

    text:        uint8 [N_pad] — chunk text (padded; only [:n] is real)
    n:           int32 scalar  — true text length
    sa:          int32 [N_pad] — suffix array (real entries only are probed)
    slots:       int32 [B]     — SA slot per query, clipped to [0, n)
    patterns_p1: int32 [B, L]  — pattern bytes + 1 (0 past the length)
    lengths:     int32 [B]

    Returns int32 [B]: -1 suffix < pattern, 0 pattern is a prefix, +1 greater.
    """
    B, L = patterns_p1.shape
    starts = jnp.take(sa, jnp.clip(slots, 0, jnp.maximum(n - 1, 0)), axis=0)  # [B]
    pos = starts[:, None] + lax.broadcasted_iota(jnp.int32, (B, L), 1)
    # Rank scheme matching suffix_array.py: real byte -> b+1, past-end -> 0.
    sbytes = jnp.take(text, jnp.clip(pos, 0, text.shape[0] - 1), axis=0)
    s = jnp.where(pos < n, sbytes.astype(jnp.int32) + 1, 0)
    jmask = lax.broadcasted_iota(jnp.int32, (B, L), 1) < lengths[:, None]
    diff = jnp.logical_and(s != patterns_p1, jmask)
    any_diff = jnp.any(diff, axis=1)
    first = jnp.argmax(diff, axis=1)  # first differing byte index
    s_at = jnp.take_along_axis(s, first[:, None], axis=1)[:, 0]
    p_at = jnp.take_along_axis(patterns_p1, first[:, None], axis=1)[:, 0]
    return jnp.where(any_diff, jnp.sign(s_at - p_at), 0).astype(jnp.int32)


def _first_slot_geq(text, n, sa, patterns_p1, lengths, thresholds):
    """First SA slot where cmp3 >= threshold, per query (branchless bisect)."""
    B = patterns_p1.shape[0]
    # Derive both carries from n so their varying-ness over any shard_map
    # mesh axis matches the loop body's outputs (scan carries must agree).
    lo = jnp.zeros((B,), jnp.int32) + n * 0
    hi = jnp.full((B,), 1, jnp.int32) * n  # [B] — search over [0, n)
    steps = max(1, int(np.ceil(np.log2(max(2, int(text.shape[0])))))) + 1

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        cmp = _cmp3(text, n, sa, mid, patterns_p1, lengths)
        pred = cmp >= thresholds
        active = lo < hi
        new_hi = jnp.where(jnp.logical_and(active, pred), mid, hi)
        new_lo = jnp.where(jnp.logical_and(active, ~pred), mid + 1, lo)
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def probe_bounds(text, n, sa, patterns, lengths):
    """(lower, count) int32 [B] for each pattern against one chunk.

    Jittable; all shapes static.  ``patterns`` is uint8 [B, L] (zero padded),
    ``lengths`` int32 [B].  Works for empty patterns (count = n) and empty
    chunks (count = 0).
    """
    n = jnp.asarray(n, jnp.int32)
    p1 = patterns.astype(jnp.int32) + 1
    jmask = lax.broadcasted_iota(jnp.int32, p1.shape, 1) < lengths[:, None]
    p1 = jnp.where(jmask, p1, 0)
    both = jnp.concatenate([p1, p1], axis=0)
    both_len = jnp.concatenate([lengths, lengths], axis=0)
    B = p1.shape[0]
    thresholds = jnp.concatenate(
        [jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32)], axis=0
    )
    bounds = _first_slot_geq(text, n, sa, both, both_len, thresholds)
    lower = bounds[:B]
    upper = bounds[B:]
    return lower, upper - lower


# vmap over a stacked chunk axis: text [C, N_pad], n [C], sa [C, N_pad]
probe_bounds_batch = jax.vmap(probe_bounds, in_axes=(0, 0, 0, None, None))

probe_bounds_jit = jax.jit(probe_bounds)
probe_bounds_batch_jit = jax.jit(probe_bounds_batch)


@functools.lru_cache(maxsize=None)
def _gather_hits_jit(cap: int):
    """Jitted gather of up to ``cap`` matching text positions per query."""

    def gather(sa, lower, count):
        B = lower.shape[0]
        idx = lower[:, None] + lax.broadcasted_iota(jnp.int32, (B, cap), 1)
        valid = lax.broadcasted_iota(jnp.int32, (B, cap), 1) < count[:, None]
        pos = jnp.take(sa, jnp.clip(idx, 0, sa.shape[0] - 1), axis=0)
        return jnp.where(valid, pos, -1)

    return jax.jit(gather)


def gather_hit_positions(sa, lower, count, cap: int):
    """Text positions of up to ``cap`` hits per query; -1 pads. [B, cap]."""
    return _gather_hits_jit(cap)(sa, lower, count)
