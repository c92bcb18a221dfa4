"""Probe-kernel agreement tests: the bucketed fast path and the plain
bisection must both match brute-force suffix counting on adversarial data
(NUL bytes, high bytes, empty and over-long patterns)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pysubstringsearch_tpu.ops.search import (
    KEY_LIMBS,
    PAD_MARGIN,
    build_bucket_table,
    build_bucket_table_host,
    build_limbs_host,
    key_cover_bytes,
    pack_patterns,
    probe_bounds,
    probe_bounds_bucketed,
    probe_bounds_limbs,
)
from pysubstringsearch_tpu.ops.suffix_array import suffix_array_numpy, _pad_len


def brute_counts(data: bytes, patterns):
    out = []
    for p in patterns:
        if len(p) == 0:
            out.append(len(data))
            continue
        out.append(sum(1 for i in range(len(data)) if data[i : i + len(p)] == p))
    return np.array(out, dtype=np.int32)


def device_args(data: bytes):
    n = len(data)
    n_pad = _pad_len(n + PAD_MARGIN)
    text = np.zeros(n_pad, dtype=np.uint8)
    text[:n] = np.frombuffer(data, dtype=np.uint8)
    sa = np.zeros(n_pad, dtype=np.int32)
    sa[:n] = suffix_array_numpy(text[:n])
    return jnp.asarray(text), jnp.int32(n), jnp.asarray(sa)


CORPORA = [
    b'banana banana band ana nab\n',
    bytes(np.random.default_rng(0).integers(0, 256, 2000, dtype=np.uint8)),
    bytes(np.random.default_rng(1).integers(97, 100, 3000, dtype=np.uint8)),
    b'\x00\x01\x00\x00\x02\x00\x01\x00' * 50,
    b'aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa',
]


def sample_patterns(data: bytes, seed: int):
    rng = np.random.default_rng(seed)
    pats = [b'', b'\x00', b'\xff', data[:1], data[-1:]]
    for _ in range(40):
        if len(data) < 3:
            break
        i = int(rng.integers(0, len(data) - 1))
        l = int(rng.integers(1, min(20, len(data) - i) + 1))
        pats.append(data[i : i + l])
    if len(data) < 900:
        # Longer than any suffix but still within the device-window
        # contract (L <= PAD_MARGIN); beyond it the API uses the host path.
        pats.append(data + b'x')
    pats.append(bytes(rng.integers(0, 256, 5, dtype=np.uint8)))
    return pats


@pytest.mark.parametrize('ci', range(len(CORPORA)))
def test_plain_and_bucketed_match_brute_force(ci):
    data = CORPORA[ci]
    text, n, sa = device_args(data)
    pats = sample_patterns(data, ci)
    packed, lengths = pack_patterns(pats)
    expected = brute_counts(data, pats)

    lo_p, cnt_p = probe_bounds(text, n, sa, jnp.asarray(packed), jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(cnt_p), expected)

    table = build_bucket_table(text, n, sa)
    # Host and device table builders must agree exactly.
    host_table = build_bucket_table_host(
        np.frombuffer(data, dtype=np.uint8),
        np.asarray(sa)[: len(data)],
    )
    np.testing.assert_array_equal(np.asarray(table), host_table)
    lo_b, cnt_b = probe_bounds_bucketed(
        text, n, sa, table, jnp.asarray(packed), jnp.asarray(lengths)
    )
    np.testing.assert_array_equal(np.asarray(cnt_b), expected)
    # Both paths must agree on the ranges too, not just the counts.
    np.testing.assert_array_equal(np.asarray(lo_b), np.asarray(lo_p))

    # Limb-key probe (the production path), with and without deep phase.
    limbs = build_limbs_host(
        np.frombuffer(data, dtype=np.uint8), np.asarray(sa)[: len(data)]
    )
    limbs_pad = np.zeros(text.shape[0] * KEY_LIMBS, dtype=np.int32)
    limbs_pad[: limbs.size] = limbs.reshape(-1)
    width = key_cover_bytes()
    deep = 36 if packed.shape[1] > width else 0
    lo_l, cnt_l = probe_bounds_limbs(
        text, n, sa, table, jnp.asarray(limbs_pad),
        jnp.asarray(packed), jnp.asarray(lengths), 36, deep,
    )
    np.testing.assert_array_equal(np.asarray(cnt_l), expected)
    np.testing.assert_array_equal(np.asarray(lo_l), np.asarray(lo_p))
    # Force the deep phase even when keys would suffice: must still agree.
    lo_d, cnt_d = probe_bounds_limbs(
        text, n, sa, table, jnp.asarray(limbs_pad),
        jnp.asarray(packed), jnp.asarray(lengths), 36, 36,
    )
    np.testing.assert_array_equal(np.asarray(cnt_d), expected)
    np.testing.assert_array_equal(np.asarray(lo_d), np.asarray(lo_p))


def test_depth3_bucket_table_probe():
    """The 3-byte bucket table (used for large chunks) must seed both probe
    paths to the same results as the 2-byte table, including patterns
    shorter than the bucket depth (their pad digits hit empty buckets whose
    boundaries collapse to the exact answer)."""
    data = CORPORA[1] + b'\x00\xff' + CORPORA[0]
    text, n, sa = device_args(data)
    pats = sample_patterns(data, 9) + [b'a', b'\x00', b'ba', b'']
    packed, lengths = pack_patterns(pats)
    expected = brute_counts(data, pats)
    table3 = build_bucket_table_host(
        np.frombuffer(data, dtype=np.uint8), np.asarray(sa)[: len(data)], 3
    )
    dev3 = build_bucket_table(text, n, sa, 3)
    np.testing.assert_array_equal(np.asarray(dev3), table3)
    lo_b, cnt_b = probe_bounds_bucketed(
        text, n, sa, jnp.asarray(table3), jnp.asarray(packed),
        jnp.asarray(lengths)
    )
    np.testing.assert_array_equal(np.asarray(cnt_b), expected)
    limbs = build_limbs_host(
        np.frombuffer(data, dtype=np.uint8), np.asarray(sa)[: len(data)]
    )
    limbs_pad = np.zeros(text.shape[0] * KEY_LIMBS, dtype=np.int32)
    limbs_pad[: limbs.size] = limbs.reshape(-1)
    deep = 36 if packed.shape[1] > key_cover_bytes() else 0
    lo_l, cnt_l = probe_bounds_limbs(
        text, n, sa, jnp.asarray(table3), jnp.asarray(limbs_pad),
        jnp.asarray(packed), jnp.asarray(lengths), 36, deep,
    )
    np.testing.assert_array_equal(np.asarray(cnt_l), expected)
    np.testing.assert_array_equal(np.asarray(lo_l), np.asarray(lo_b))


@pytest.mark.parametrize('width', [8, 11, 14, 17])
def test_limb_probe_truncated_gather_widths(width):
    """Each packed pattern width L maps to a static k_used = ceil((L-2)/3);
    sweep the exact boundaries so every truncation level is exercised."""
    data = CORPORA[1]
    text, n, sa = device_args(data)
    rng = np.random.default_rng(width)
    pats = []
    for _ in range(24):
        i = int(rng.integers(0, len(data) - width))
        pats.append(data[i : i + int(rng.integers(1, width + 1))])
    packed, lengths = pack_patterns(pats, max_len=width)
    assert packed.shape[1] == width
    expected = brute_counts(data, pats)
    table = build_bucket_table(text, n, sa)
    limbs = build_limbs_host(
        np.frombuffer(data, dtype=np.uint8), np.asarray(sa)[: len(data)]
    )
    limbs_pad = np.zeros(text.shape[0] * KEY_LIMBS, dtype=np.int32)
    limbs_pad[: limbs.size] = limbs.reshape(-1)
    lo, cnt = probe_bounds_limbs(
        text, n, sa, table, jnp.asarray(limbs_pad),
        jnp.asarray(packed), jnp.asarray(lengths), 36, 0,
    )
    np.testing.assert_array_equal(np.asarray(cnt), expected)
