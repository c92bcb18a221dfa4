"""ShardedReader parity: identical result multisets to the single-device
Reader on the same index, across the virtual 8-device mesh."""

import collections

import pytest

import jax

import pysubstringsearch_tpu as pss
from pysubstringsearch_tpu.parallel.reader import ShardedReader


@pytest.fixture(scope='module')
def index_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('sharded_reader')
    path = str(tmp / 'index.idx')
    writer = pss.Writer(path, max_chunk_len=64)  # many small chunks
    entries = [f'entry number {i} of the corpus' for i in range(50)]
    entries += ['shared token alpha'] * 3 + ['unique omega']
    for e in entries:
        writer.add_entry(e)
    writer.finalize()
    return path, entries


def test_parity_with_plain_reader(index_path):
    path, entries = index_path
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device backend')
    plain = pss.Reader(path)
    sharded = ShardedReader(path)
    for pat in ['entry', 'number 7 ', 'alpha', 'omega', 'missing', '', 'corpus']:
        a = plain.search(pat)
        b = sharded.search(pat)
        assert collections.Counter(a) == collections.Counter(b), pat


def test_search_multiple_parity(index_path):
    path, entries = index_path
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device backend')
    plain = pss.Reader(path)
    sharded = ShardedReader(path)
    pats = ['entry', 'alpha', 'alpha', 'nope']
    assert collections.Counter(plain.search_multiple(pats)) == (
        collections.Counter(sharded.search_multiple(pats))
    )


def test_chunk_padding_to_mesh_multiple(index_path):
    path, _ = index_path
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device backend')
    sharded = ShardedReader(path)
    assert sharded._C % sharded.mesh.devices.size == 0
    assert sharded._C >= sharded._num_real


def test_sharded_derive_parity(index_path):
    """Derive mode over the mesh: each row's SA/limbs/tables build on its
    owning device; results match the plain Reader (the VERDICT r2 gap —
    the sharded slow-link load path)."""
    path, entries = index_path
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device backend')
    plain = pss.Reader(path)
    sharded = ShardedReader(path, index_mode='derive')
    assert sharded._index.mode == 'derive'
    assert sharded._C % sharded.mesh.devices.size == 0
    for pat in ['entry', 'number 7 ', 'alpha', 'omega', 'missing', '']:
        a = plain.search(pat)
        b = sharded.search(pat)
        assert collections.Counter(a) == collections.Counter(b), pat


def test_sharded_derive_merged_parity(index_path):
    """Merged rows + mesh placement compose: container chunks concatenate
    into rows, rows shard across devices."""
    path, entries = index_path
    if len(jax.devices()) < 2:
        pytest.skip('needs multi-device backend')
    import os
    os.environ['TPUSS_MERGE_CAP'] = '512'
    try:
        plain = pss.Reader(path)
        sharded = ShardedReader(path, index_mode='derive')
        assert sharded._index.merged
        for pat in ['entry', 'alpha', 'omega', 'missing', 'the corpus']:
            a = plain.search(pat)
            b = sharded.search(pat)
            assert collections.Counter(a) == collections.Counter(b), pat
    finally:
        del os.environ['TPUSS_MERGE_CAP']
