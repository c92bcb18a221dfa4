"""Batched substring probe: vectorized lower/upper-bound search over the SA.

The reference answers one pattern at a time with a scalar binary search whose
every probe is a file seek (reference: src/lib.rs:212-252), and its
``search_multiple`` is a sequential Python loop (pysubstringsearch/__init__.py:61-73).
Here the whole query batch is a first-class axis: patterns are packed into a
``[B, L]`` uint8 tensor and *both* bounds for *all* patterns advance together
through one ``lax.fori_loop`` — each step is one batched suffix-window gather
plus a vectorized lexicographic compare on the VPU.

Semantics match the reference byte compare exactly:

- ``lower`` = first SA slot whose suffix is >= the pattern, where a suffix
  that *starts with* the pattern compares equal (src/lib.rs:219-220).
- ``upper`` = first SA slot whose suffix is > the pattern and does not start
  with it.  ``count = upper - lower`` is the number of matching suffixes.

TPU-shaping decisions (measured on v5e):

- Text windows are fetched with ``vmap(lax.dynamic_slice)`` — XLA lowers this
  to a sliced gather that moves whole rows at ~6 M rows/s-per-lane-bundle,
  ~500x faster than an element gather of the same bytes.  Text arrays carry a
  zero-padding margin so windows never clamp in the common case; a per-lane
  roll keeps the exotic clamped case exact.
- The two searches fuse: classify each (pattern, suffix) pair with a three-way
  compare ``cmp ∈ {-1, 0, +1}`` (0 = pattern is a prefix); ``lower`` is the
  first slot with ``cmp >= 0`` and ``upper`` the first with ``cmp >= 1`` —
  one predicate parameterized by a threshold, so both bounds run as a single
  ``[2B]`` search.
- ``probe_bounds_bucketed`` seeds the bisection from a precomputed 2-byte
  prefix bucket table (first-two-byte analogue of the suffix array's bucket
  structure), skipping ~16 of the ~30 steps, and runs only as many steps as
  the widest seeded range actually needs (dynamic fori bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    'pack_patterns',
    'probe_bounds',
    'probe_bounds_bucketed',
    'build_bucket_table',
    'gather_hit_positions',
    'BUCKET_TABLE_SIZE',
    'PAD_MARGIN',
]

#: Digit space for byte ranks: real byte b -> b + 1, past-the-end -> 0, and
#: 257 as the +infinity digit used by upper-bound targets.
_RADIX = 258

#: Bucket table: one entry per 2-digit prefix value plus a terminator.
BUCKET_TABLE_SIZE = _RADIX * _RADIX + 1

#: Deep bucket table: one entry per 3-digit prefix (69 MB as int32).  Worth
#: it for large chunks: ~8 fewer bisection steps for one extra lookup, and
#: the table is small next to the packed limb keys (4n*num_limbs bytes).
BUCKET_TABLE_SIZE_3 = _RADIX * _RADIX * _RADIX + 1


def _bucket_depth(table_len: int) -> int:
    """Bucket-prefix depth encoded by a table's (static) length."""
    if table_len == BUCKET_TABLE_SIZE:
        return 2
    if table_len == BUCKET_TABLE_SIZE_3:
        return 3
    raise ValueError(f'not a bucket table length: {table_len}')

#: Limbs per suffix in the packed prefix-key array: each limb holds 3 bytes
#: in base-258 digits (b+1; 0 = past-end), so the bucket (2 bytes) plus
#: KEY_LIMBS limbs cover the first ``2 + 3*KEY_LIMBS`` bytes of every suffix.
KEY_LIMBS = 5


def key_cover_bytes(num_limbs: int = KEY_LIMBS) -> int:
    return 2 + 3 * num_limbs

#: Zero-byte margin device text arrays carry after position n, so suffix
#: windows up to this long never clamp. Longer patterns stay correct via the
#: clamp+roll path, and patterns longer than the whole padded array cannot
#: match anything (handled by callers).
PAD_MARGIN = 1024


def pack_patterns(patterns, max_len: int | None = None):
    """Pack byte-string patterns into (uint8[B, L], int32[B]) host arrays.

    ``L`` is rounded up to the next limb-aligned boundary (8, 11, 14, 17 =
    ``key_cover_bytes(k)``, then multiples of 8) — this bounds jit retraces
    across pattern-length distributions while keeping the probe's static
    per-step gather width (``k_used = ceil((L-2)/3)`` limbs) as small as the
    batch allows.  An explicit ``max_len`` is used literally.
    """
    lengths = np.array([len(p) for p in patterns], dtype=np.int32)
    if max_len is None:
        L = int(lengths.max(initial=0))
        if L <= key_cover_bytes(KEY_LIMBS):
            L = next(
                w for w in (8, 11, 14, 17) if w >= max(8, L)
            )
        else:
            L = -(-L // 8) * 8
    else:
        L = max_len
    packed = np.zeros((len(patterns), L), dtype=np.uint8)
    for i, p in enumerate(patterns):
        packed[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    return packed, lengths


def _gather_suffix_windows(text, starts, L):
    """[B, L] windows text[starts[b] : starts[b]+L] as one element gather.

    Measured on v5e (in-jit repetition slope, the only reliable methodology
    through this environment's async remote runtime): flat ``jnp.take``
    element gathers run at ~6 ns/element while ``vmap(lax.dynamic_slice)``
    row gathers cost ~1.1 us/lane — 180x slower per byte at L=8.  So windows
    are fetched as a flat [B*L] element gather.

    The clip keeps accesses in-bounds; positions past the true text length
    are masked to rank 0 by the caller (via ``pos < n``), so clamped reads
    never influence results.
    """
    N = text.shape[0]
    B = starts.shape[0]
    pos = starts[:, None] + lax.broadcasted_iota(jnp.int32, (B, L), 1)
    flat = jnp.take(text, jnp.clip(pos.reshape(-1), 0, N - 1), axis=0)
    return flat.reshape(B, L)


def _cmp3(text, n, sa, slots, patterns_p1, lengths):
    """Three-way compare of each pattern against the suffix at SA[slot].

    text:        uint8 [N_pad] — chunk text (only [:n] is real; N_pad >= L)
    n:           int32 scalar  — true text length
    sa:          int32 [N_pad] — suffix array (real entries in [0, n))
    slots:       int32 [B]     — SA slot per query
    patterns_p1: int32 [B, L]  — pattern bytes + 1 (0 past the length)
    lengths:     int32 [B]

    Returns int32 [B]: -1 suffix < pattern, 0 pattern is a prefix, +1 greater.
    """
    B, L = patterns_p1.shape
    starts = jnp.take(sa, jnp.clip(slots, 0, jnp.maximum(n - 1, 0)), axis=0)
    rows = _gather_suffix_windows(text, starts, L)
    jpos = lax.broadcasted_iota(jnp.int32, (B, L), 1)
    pos = starts[:, None] + jpos
    # Rank scheme matching suffix_array.py: real byte -> b+1, past-end -> 0.
    s = jnp.where(pos < n, rows.astype(jnp.int32) + 1, 0)
    jmask = jpos < lengths[:, None]
    # Lexicographic compare without any minor-axis gather: take_along_axis
    # along the byte axis costs ~25 ms per call on TPU for [20k, L], so the
    # "value at first differing byte" is selected with a min-reduce + one-hot
    # sum instead (pure VPU work).
    d = jnp.sign(s - patterns_p1) * jmask.astype(jnp.int32)  # {-1, 0, +1}
    nz = d != 0
    firstj = jnp.min(jnp.where(nz, jpos, L), axis=1)  # [B]; L = no difference
    onehot = jnp.logical_and(jpos == firstj[:, None], nz)
    return jnp.sum(d * onehot, axis=1).astype(jnp.int32)


def _bisect_first_geq(text, n, sa, patterns_p1, lengths, thresholds, lo0, hi0,
                      steps: int):
    """First SA slot in [lo0, hi0) where cmp3 >= threshold (branchless).

    ``steps`` is STATIC and the loop is unrolled into straight-line XLA:
    measured on v5e, the same body inside ``lax.fori_loop`` runs ~250x
    slower (the loop re-materializes its big invariant operands every
    iteration), while the unrolled form hits the fast sliced-gather path —
    0.16 ms vs 635 ms for 10k queries on a 16 MiB chunk.
    """
    lo, hi = lo0, hi0
    for _ in range(steps):
        mid = (lo + hi) // 2
        cmp = _cmp3(text, n, sa, mid, patterns_p1, lengths)
        pred = cmp >= thresholds
        active = lo < hi
        hi = jnp.where(jnp.logical_and(active, pred), mid, hi)
        lo = jnp.where(jnp.logical_and(active, ~pred), mid + 1, lo)
    return lo


def _duplex(patterns, lengths):
    """Stack the query batch twice — lanes [0, B) search the lower bound
    (threshold 0), lanes [B, 2B) the upper (threshold 1)."""
    p1 = patterns.astype(jnp.int32) + 1
    jmask = lax.broadcasted_iota(jnp.int32, p1.shape, 1) < lengths[:, None]
    p1 = jnp.where(jmask, p1, 0)
    B = p1.shape[0]
    both = jnp.concatenate([p1, p1], axis=0)
    both_len = jnp.concatenate([lengths, lengths], axis=0)
    thresholds = jnp.concatenate(
        [jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32)], axis=0
    )
    return both, both_len, thresholds


def probe_bounds(text, n, sa, patterns, lengths):
    """(lower, count) int32 [B] for each pattern against one chunk.

    Jittable; all shapes static.  ``patterns`` is uint8 [B, L] (zero padded),
    ``lengths`` int32 [B].  Works for empty patterns (count = n) and empty
    chunks (count = 0).  Requires ``text.shape[0] >= L``.
    """
    n = jnp.asarray(n, jnp.int32)
    both, both_len, thresholds = _duplex(patterns, lengths)
    B = patterns.shape[0]
    lo0 = jnp.zeros((2 * B,), jnp.int32) + n * 0  # varying-ness follows n
    hi0 = jnp.full((2 * B,), 1, jnp.int32) * n
    steps = max(1, int(np.ceil(np.log2(max(2, int(text.shape[0])))))) + 1
    bounds = _bisect_first_geq(
        text, n, sa, both, both_len, thresholds, lo0, hi0, steps
    )
    lower = bounds[:B]
    return lower, bounds[B:] - lower


def build_bucket_table(text, n, sa, depth: int = 2):
    """int32 bucket table: table[k] = first SA slot whose suffix's
    ``depth``-digit prefix value is >= k (digits in the b+1 rank space).

    The device-side analogue of SA-IS bucket pointers: seeds every probe's
    bisection at its prefix bucket, replacing ~8*depth binary-search steps
    with two table lookups.
    """
    N = text.shape[0]
    n = jnp.asarray(n, jnp.int32)
    slot_iota = lax.broadcasted_iota(jnp.int32, (N,), 0)
    starts = jnp.clip(sa, 0, jnp.maximum(N - depth, 0))
    rows = jax.vmap(lambda s: lax.dynamic_slice(text, (s,), (depth,)))(starts)
    b = jnp.zeros((N,), jnp.int32)
    for j in range(depth):
        dj = jnp.where(
            sa + j < n, rows[:, j].astype(jnp.int32) + 1, 0
        )
        b = b * _RADIX + dj
    # Padding slots (>= n) sort after every real prefix value.
    b = jnp.where(slot_iota < n, b, _RADIX ** depth)
    size = _RADIX ** depth + 1
    probes = lax.broadcasted_iota(jnp.int32, (size,), 0)
    return jnp.searchsorted(b, probes, side='left').astype(jnp.int32)


def _pattern_limb_targets(patterns, lengths, thresholds, num_limbs,
                          bucket_depth: int = 2):
    """Bucket ids and limb targets for duplex lanes.

    Lower-bound lanes (threshold 0) pad past-the-pattern digits with 0 (the
    -infinity digit), upper-bound lanes with 257 (+infinity): the first slot
    whose key-sequence compares >= the lower target is exactly the lower
    bound, and >= +1 the upper — no per-byte length masks needed.
    """
    B2, L = patterns.shape
    width = max(key_cover_bytes(num_limbs), bucket_depth)
    pad = jnp.where(thresholds > 0, _RADIX - 1, 0)  # [2B]
    cols = min(L, width)
    ipos = lax.broadcasted_iota(jnp.int32, (B2, width), 1)
    raw = jnp.zeros((B2, width), jnp.int32)
    raw = raw.at[:, :cols].set(patterns[:, :cols].astype(jnp.int32) + 1)
    digits = jnp.where(ipos < lengths[:, None], raw, pad[:, None])
    bucket = digits[:, 0]
    for j in range(1, bucket_depth):
        bucket = bucket * _RADIX + digits[:, j]
    tgt = jnp.stack(
        [
            (digits[:, 2 + 3 * j] * _RADIX + digits[:, 3 + 3 * j]) * _RADIX
            + digits[:, 4 + 3 * j]
            for j in range(num_limbs)
        ],
        axis=1,
    )  # [2B, K]
    return bucket, tgt


def _limb_cmp3(limbs_flat, slots, targets, stride, k_used):
    """Three-way compare of packed suffix keys at SA slots vs targets.

    ``limbs_flat`` is PLANE-MAJOR: ``stride`` planes of ``N`` elements each,
    limb j of slot i at ``j * N + i``.  (Slot-major `[N, stride]` would be
    the natural layout, but a minor-dim-``stride`` array is tiled to 128
    lanes on TPU — a 25x memory blowup that overflows HBM at reference chunk
    sizes.)  Only the first ``k_used`` limbs are gathered and compared —
    enough whenever the target digits beyond them are all pads (see
    probe_bounds_limbs), which cuts the dominant per-step gather volume for
    short patterns.
    """
    B2 = slots.shape[0]
    K = k_used
    Nk = limbs_flat.shape[0]
    Ns = Nk // stride
    col = lax.broadcasted_iota(jnp.int32, (B2, K), 1)
    idx = col * Ns + slots[:, None]
    rows = jnp.take(
        limbs_flat, jnp.clip(idx.reshape(-1), 0, Nk - 1), axis=0
    ).reshape(B2, K)
    d = jnp.sign(rows - targets)
    nz = d != 0
    firstj = jnp.min(jnp.where(nz, col, K), axis=1)
    onehot = jnp.logical_and(col == firstj[:, None], nz)
    return jnp.sum(d * onehot, axis=1).astype(jnp.int32)


def probe_bounds_limbs(text, n, sa, table, limbs_flat, patterns, lengths,
                       steps: int, deep_steps: int = 0,
                       num_limbs: int = KEY_LIMBS):
    """The production probe: bucket-seeded bisection over packed prefix keys.

    Each bisection step gathers ``num_limbs`` int32 elements per lane (vs L
    text bytes for the byte-window probe) and compares in pure digit space.
    Patterns longer than ``key_cover_bytes(num_limbs)`` finish with
    ``deep_steps`` byte-window bisection steps inside the key-resolved range
    (callers pass deep_steps=0 when the batch's max length fits the keys —
    a static, trace-time decision).

    Only the first ``ceil((L-2)/3)`` stored limbs are gathered/compared
    (static in the packed pattern width L): any limb past that is all-pad in
    every lane's target — 0 digits for lower-bound lanes (so the full-key
    compare can never be < 0 there) and 257 digits for upper-bound lanes (so
    it is always < 0) — which means the truncated compare drives the
    bisection predicate to the same value as the full compare.
    """
    n = jnp.asarray(n, jnp.int32)
    both, both_len, thresholds = _duplex(patterns, lengths)
    B = patterns.shape[0]
    L = patterns.shape[1]
    k_used = max(1, min(num_limbs, -(-(L - 2) // 3)))
    bucket, tgt = _pattern_limb_targets(
        jnp.concatenate([patterns, patterns], axis=0).astype(jnp.uint8),
        both_len, thresholds, k_used,
        bucket_depth=_bucket_depth(table.shape[0]),
    )
    lo = jnp.take(table, bucket, axis=0)
    hi = jnp.take(table, bucket + 1, axis=0)
    for _ in range(steps):
        mid = (lo + hi) // 2
        cmp = _limb_cmp3(limbs_flat, mid, tgt, num_limbs, k_used)
        pred = cmp >= thresholds
        active = lo < hi
        hi = jnp.where(jnp.logical_and(active, pred), mid, hi)
        lo = jnp.where(jnp.logical_and(active, ~pred), mid + 1, lo)
    if deep_steps > 0:
        # Keys resolved only the first key_cover_bytes(); continue on raw
        # text within the key-equal range (exchange duplex halves so both
        # lanes bisect the same enclosing range).
        l0 = jnp.concatenate([lo[:B], lo[:B]], axis=0)
        h0 = jnp.concatenate([lo[B:], lo[B:]], axis=0)
        lo = _bisect_first_geq(
            text, n, sa, both, both_len, thresholds, l0, h0, deep_steps
        )
    lower = lo[:B]
    return lower, lo[B:] - lower


def probe_bounds_limbs_loop(text, n, sa, table, limbs_flat, patterns,
                            lengths, deep: bool = False,
                            num_limbs: int = KEY_LIMBS):
    """Loop-form production probe: bucket-seeded bisection over packed limb
    keys inside a ``lax.while_loop`` with on-device early exit.

    Same math as :func:`probe_bounds_limbs`, different compilation shape.
    The unrolled form specializes on the step count — every distinct bucket
    width compiles a fresh program, and through this environment's remote
    tunnel a 16-step unrolled probe costs 5+ MINUTES to compile.  The loop
    form is one small program for every width, converges in exactly the
    steps the widest seeded range needs (the while_loop exits when every
    lane's range is empty), and needs no width measurement at load time —
    the derive path can stay readback-free.

    ``deep`` (static) appends a second while_loop bisecting raw text windows
    inside the key-resolved range, for patterns longer than
    ``key_cover_bytes(num_limbs)``.
    """
    n = jnp.asarray(n, jnp.int32)
    both, both_len, thresholds = _duplex(patterns, lengths)
    B = patterns.shape[0]
    L = patterns.shape[1]
    k_used = max(1, min(num_limbs, -(-(L - 2) // 3)))
    bucket, tgt = _pattern_limb_targets(
        jnp.concatenate([patterns, patterns], axis=0).astype(jnp.uint8),
        both_len, thresholds, k_used,
        bucket_depth=_bucket_depth(table.shape[0]),
    )
    lo0 = jnp.take(table, bucket, axis=0)
    hi0 = jnp.take(table, bucket + 1, axis=0)

    def cond(state):
        lo, hi = state
        return jnp.any(lo < hi)

    def body(state):
        lo, hi = state
        mid = (lo + hi) // 2
        cmp = _limb_cmp3(limbs_flat, mid, tgt, num_limbs, k_used)
        pred = cmp >= thresholds
        active = lo < hi
        hi = jnp.where(jnp.logical_and(active, pred), mid, hi)
        lo = jnp.where(jnp.logical_and(active, ~pred), mid + 1, lo)
        return lo, hi

    lo, _ = lax.while_loop(cond, body, (lo0, hi0))
    if deep:
        l0 = jnp.concatenate([lo[:B], lo[:B]], axis=0)
        h0 = jnp.concatenate([lo[B:], lo[B:]], axis=0)

        def body2(state):
            lo, hi = state
            mid = (lo + hi) // 2
            cmp = _cmp3(text, n, sa, mid, both, both_len)
            pred = cmp >= thresholds
            active = lo < hi
            hi = jnp.where(jnp.logical_and(active, pred), mid, hi)
            lo = jnp.where(jnp.logical_and(active, ~pred), mid + 1, lo)
            return lo, hi

        lo, _ = lax.while_loop(cond, body2, (l0, h0))
    lower = lo[:B]
    return lower, lo[B:] - lower


@functools.lru_cache(maxsize=None)
def limbs_loop_batch_jit(deep: bool, num_limbs: int):
    """Jitted chunk-vmapped loop probe — one compiled program per
    (deep?, num_limbs), independent of corpus statistics."""

    def f(text, n, sa, table, limbs, patterns, lengths):
        return probe_bounds_limbs_loop(
            text, n, sa, table, limbs, patterns, lengths, deep, num_limbs
        )

    return jax.jit(jax.vmap(f, in_axes=(0, 0, 0, 0, 0, None, None)))


def steps_for_width(width: int) -> int:
    """Static bisection step count for a max seeded-range width, rounded up
    to a multiple of 4 to bound the number of distinct jit traces."""
    raw = int(np.ceil(np.log2(width + 1))) + 1 if width > 0 else 0
    return min(-(-raw // 4) * 4, 36)


def build_limbs_host(
    data: np.ndarray, sa: np.ndarray, num_limbs: int = KEY_LIMBS
) -> np.ndarray:
    """[num_limbs, n] int32 packed prefix keys, plane-major (see _limb_cmp3).

    limb j of slot i packs bytes ``sa[i]+2+3j .. +3`` of the text as three
    base-258 digits (byte+1; 0 past the end).  Together with the 2-byte
    bucket id this gives each SA slot a ``key_cover_bytes()``-byte sortable
    prefix key, so probe bisection steps gather ``num_limbs`` int32 elements
    per lane instead of L text bytes — and need no per-byte length masks
    (the pad digits encode string end exactly).
    """
    n = data.size
    if n == 0:
        return np.zeros((num_limbs, 0), dtype=np.int32)
    # Digit stream in text order, padded so all windows are in-bounds.
    width = key_cover_bytes(num_limbs)
    digits = np.zeros(n + width, dtype=np.int32)
    digits[:n] = data.astype(np.int32) + 1
    out = np.empty((num_limbs, n), dtype=np.int32)
    base = sa.astype(np.int64) + 2
    for j in range(num_limbs):
        o = base + 3 * j
        out[j] = (
            (digits[o] * _RADIX + digits[o + 1]) * _RADIX + digits[o + 2]
        )
    return out


def pad_limbs_host(limbs: np.ndarray, n_pad: int) -> np.ndarray:
    """Place plane-major host limbs ``[num_limbs, n]`` into the flat padded
    device layout ``[num_limbs * n_pad]`` (plane j at ``j * n_pad``)."""
    num_limbs, n = limbs.shape
    out = np.zeros(num_limbs * n_pad, dtype=np.int32)
    for j in range(num_limbs):
        out[j * n_pad : j * n_pad + n] = limbs[j]
    return out


def build_bucket_table_host(
    data: np.ndarray, sa: np.ndarray, depth: int = 2
) -> np.ndarray:
    """Host (numpy) twin of build_bucket_table — used at index load (upload
    mode) so the load path is pure H2D with no device round trips before the
    first probe."""
    size = _RADIX ** depth + 1
    n = data.size
    if n == 0:
        return np.zeros(size, dtype=np.int32)
    b = np.zeros(n, dtype=np.int64)
    for j in range(depth):
        nxt = sa.astype(np.int64) + j
        dj = np.where(
            nxt < n, data[np.minimum(nxt, n - 1)].astype(np.int64) + 1, 0
        )
        b = b * _RADIX + dj  # non-decreasing over SA order
    probes = np.arange(size, dtype=np.int64)
    return np.searchsorted(b, probes, side='left').astype(np.int32)


def _digit_stream(text, n):
    """int32 [N] digit stream: text byte + 1 for positions < n, else 0."""
    N = text.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (N,), 0)
    return jnp.where(iota < n, text.astype(jnp.int32) + 1, 0), iota


def _shifted_digits(d, iota, n, j):
    """d shifted left by j with 0 (past-end digit) fill."""
    return jnp.where(iota + j < n, jnp.roll(d, -j), 0)


def build_limbs_device(text, n, sa, num_limbs: int = KEY_LIMBS):
    """Device twin of :func:`build_limbs_host`: packed prefix keys
    [N * num_limbs] int32 in SA-slot order, derived entirely on device.

    Limb streams are computed in TEXT order with rolled digit streams (pure
    VPU passes over HBM), then permuted to SA order with one element gather
    per limb — the gather-friendly formulation (ARCHITECTURE.md measured
    behaviors: element gathers ~6 ns/element; per-slot row gathers are
    1000x worse).

    PLANE-MAJOR output (limb j of slot i at ``j * N + i``, see _limb_cmp3):
    built with `concatenate`, never materializing an `[N, num_limbs]` array —
    TPU tiling pads a minor dim of ``num_limbs`` to 128 lanes, which at
    reference chunk sizes is a 25x blowup past HBM.
    """
    N = text.shape[0]
    n = jnp.asarray(n, jnp.int32)
    d, iota = _digit_stream(text, n)
    sa_c = jnp.clip(sa, 0, N - 1)
    cols = []
    for j in range(num_limbs):
        o = 2 + 3 * j
        lj = (
            _shifted_digits(d, iota, n, o) * _RADIX
            + _shifted_digits(d, iota, n, o + 1)
        ) * _RADIX + _shifted_digits(d, iota, n, o + 2)
        cols.append(jnp.take(lj, sa_c, axis=0))
    return jnp.concatenate(cols)


def build_bucket_table_device(text, n, sa, depth: int = 2):
    """Device twin of :func:`build_bucket_table_host` via scatter-min.

    ``table[k] = first SA slot whose depth-digit prefix value >= k``.  The
    prefix-value stream is computed in text order, gathered to SA order
    (non-decreasing), scatter-min'd into a first-slot-per-value table, and
    completed with a reverse cummin — one N-element scatter instead of a
    size-17M searchsorted bisection.
    """
    N = text.shape[0]
    n = jnp.asarray(n, jnp.int32)
    d, iota = _digit_stream(text, n)
    pv = jnp.zeros((N,), jnp.int32)
    for j in range(depth):
        pv = pv * _RADIX + _shifted_digits(d, iota, n, j)
    b = jnp.take(pv, jnp.clip(sa, 0, N - 1), axis=0)
    size = _RADIX ** depth + 1
    # Padding slots (>= n) get the terminator value so they never claim a
    # real bucket's first slot.
    b = jnp.where(iota < n, b, size - 1)
    first = jnp.full((size,), N, jnp.int32).at[b].min(iota, mode='drop')
    # table[k] = min over k' >= k of first[k']; clamp the N sentinel to n.
    table = lax.cummin(first, reverse=True)
    return jnp.minimum(table, n)


@functools.lru_cache(maxsize=None)
def derive_sa_jit():
    """Device program: text -> SA rolled to the front (real entries in slots
    [0, n); the tail holds pad-suffix positions >= n which no probe range can
    reach — bucket tables clamp to n).

    The load-path inversion for slow host<->device links (measured in this
    environment: H2D ~5-12 MB/s, D2H ~1-5 MB/s): instead of uploading
    SA (4 bytes/char) + limbs (4*num_limbs bytes/char) + tables, upload the
    text alone (1 byte/char) and derive everything in HBM.  The SA of a
    string is unique, so the derived SA is byte-identical to the container's.

    SA construction and the aux-structure build (:func:`derive_aux_jit`) are
    deliberately SEPARATE dispatches: fused into one program, the doubling
    loop's scratch (3 N-int32 carries + sort buffers) and the [N, num_limbs]
    limb matrix are live together, which exceeds 16 GB HBM at the 512 MiB
    reference chunk size.  Split, each program's peak fits with room to
    spare, and nothing extra crosses the link (all intermediates stay in
    HBM).
    """
    from .suffix_array import _segmented_kernel

    def f(text, n):
        N = text.shape[0]
        sa_full = _segmented_kernel(text, jnp.asarray(n, jnp.int32))
        return jnp.roll(sa_full, n - N)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def derive_aux_jit(num_limbs: int, depth: int):
    """Device program: (text, n, sa) -> (packed limb keys, bucket table).
    Second stage of the derive load path — see :func:`derive_sa_jit`."""

    def f(text, n, sa):
        limbs = build_limbs_device(text, n, sa, num_limbs)
        table = build_bucket_table_device(text, n, sa, depth)
        return limbs, table

    return jax.jit(f)


def probe_bounds_bucketed(text, n, sa, table, patterns, lengths,
                          steps: int = 36):
    """probe_bounds seeded from a 2-byte bucket table — the production query
    path.  ``steps`` is static; callers pass ``steps_for_width(max bucket
    width)`` measured once at table-build time (DeviceIndex does)."""
    n = jnp.asarray(n, jnp.int32)
    both, both_len, thresholds = _duplex(patterns, lengths)
    B2 = both.shape[0]
    depth = _bucket_depth(table.shape[0])
    # Target digit values: lower-bound lanes pad with 0 (-infinity digit),
    # upper-bound lanes with 257 (+infinity digit).
    pad = jnp.where(thresholds > 0, _RADIX - 1, 0)
    bucket = jnp.zeros((B2,), jnp.int32)
    for j in range(depth):
        dj = jnp.where(both_len >= j + 1, both[:, j], pad)
        bucket = bucket * _RADIX + dj
    lo0 = jnp.take(table, bucket, axis=0)
    hi0 = jnp.take(table, bucket + 1, axis=0)
    bounds = _bisect_first_geq(
        text, n, sa, both, both_len, thresholds, lo0, hi0, steps
    )
    B = B2 // 2
    lower = bounds[:B]
    return lower, bounds[B:] - lower


# vmap over a stacked chunk axis: text [C, N_pad], n [C], sa [C, N_pad]
probe_bounds_batch = jax.vmap(probe_bounds, in_axes=(0, 0, 0, None, None))
build_bucket_table_batch = jax.vmap(build_bucket_table)

probe_bounds_jit = jax.jit(probe_bounds)
probe_bounds_batch_jit = jax.jit(probe_bounds_batch)
build_bucket_table_batch_jit = jax.jit(build_bucket_table_batch)


@functools.lru_cache(maxsize=None)
def bucketed_batch_jit(steps: int):
    """Jitted chunk-vmapped bucketed probe for a static step count."""

    def f(text, n, sa, table, patterns, lengths):
        return probe_bounds_bucketed(
            text, n, sa, table, patterns, lengths, steps
        )

    return jax.jit(jax.vmap(f, in_axes=(0, 0, 0, 0, None, None)))


@functools.lru_cache(maxsize=None)
def limbs_batch_jit(steps: int, deep_steps: int, num_limbs: int):
    """Jitted chunk-vmapped limb-key probe (the production query path)."""

    def f(text, n, sa, table, limbs, patterns, lengths):
        return probe_bounds_limbs(
            text, n, sa, table, limbs, patterns, lengths,
            steps, deep_steps, num_limbs,
        )

    return jax.jit(jax.vmap(f, in_axes=(0, 0, 0, 0, 0, None, None)))


@functools.lru_cache(maxsize=None)
def repeated_limbs_probe_jit(steps: int, deep_steps: int, num_limbs: int,
                             reps: int):
    """Slope-measurement twin of limbs_batch_jit (see
    repeated_bucketed_probe_jit for why slopes)."""

    def f(text, n, sa, table, limbs, patterns, lengths):
        total = jnp.int32(0)
        for i in range(reps):
            varied = ((patterns.astype(jnp.int32) + i) % 255).astype(
                jnp.uint8
            )
            lo, cnt = jax.vmap(
                lambda t, n_, s, tb, lb: probe_bounds_limbs(
                    t, n_, s, tb, lb, varied, lengths,
                    steps, deep_steps, num_limbs,
                ),
            )(text, n, sa, table, limbs)
            total = total + jnp.sum(lo) + jnp.sum(cnt)
        return total

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def repeated_bucketed_probe_jit(steps: int, reps: int):
    """One jit running ``reps`` pattern-varied bucketed probes back to back,
    reduced to a scalar checksum.

    Measurement primitive: this environment's remote runtime is fully
    asynchronous (block_until_ready returns before device completion) and its
    first D2H readback adds a large constant per-dispatch transport penalty.
    True device time is therefore only observable as a *slope*:
    ``(wall(reps=K) - wall(reps=1)) / (K - 1)`` with the scalar checksum
    forcing completion.  bench.py uses exactly this.
    """

    def f(text, n, sa, table, patterns, lengths):
        total = jnp.int32(0)
        for i in range(reps):
            varied = ((patterns.astype(jnp.int32) + i) % 255).astype(
                jnp.uint8
            )
            lo, cnt = jax.vmap(
                lambda t, n_, s, tb: probe_bounds_bucketed(
                    t, n_, s, tb, varied, lengths, steps
                ),
            )(text, n, sa, table)
            total = total + jnp.sum(lo) + jnp.sum(cnt)
        return total

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _gather_hits_jit(cap: int):
    """Jitted gather of up to ``cap`` matching text positions per query."""

    def gather(sa, lower, count):
        N = sa.shape[0]
        c = min(cap, N)
        B = lower.shape[0]
        off = lax.broadcasted_iota(jnp.int32, (B, c), 1)
        slot = lower[:, None] + off
        rows = jnp.take(sa, jnp.clip(slot.reshape(-1), 0, N - 1), axis=0)
        rows = rows.reshape(B, c)
        return jnp.where(off < count[:, None], rows, -1)

    return jax.jit(gather)


def gather_hit_positions(sa, lower, count, cap: int):
    """Text positions of up to ``cap`` hits per query; -1 pads. [B, cap]."""
    return _gather_hits_jit(cap)(sa, lower, count)


def host_probe_bounds(data: bytes, sa: np.ndarray, pattern: bytes):
    """(lower, count) for one pattern on the host — exact scalar bisection
    used for patterns longer than PAD_MARGIN (outside the device windows)."""
    n = sa.shape[0]
    L = len(pattern)

    def cmp_at(slot: int) -> int:
        start = int(sa[slot])
        s = data[start : start + L]
        if s == pattern:
            return 0
        return -1 if s < pattern else 1

    def first_geq(threshold: int) -> int:
        lo, hi = 0, n
        while lo < hi:
            mid = (lo + hi) // 2
            if cmp_at(mid) >= threshold:
                hi = mid
            else:
                lo = mid + 1
        return lo

    lower = first_geq(0)
    upper = first_geq(1)
    return lower, upper - lower
