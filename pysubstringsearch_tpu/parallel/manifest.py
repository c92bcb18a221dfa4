"""Sharded-manifest container: the pod-scale variant of the index format.

The reference's container is one append-only file whose framed (text, SA)
records double as its checkpoint (SURVEY.md §5.4; reference
src/lib.rs:105-124).  At pod scale a single file serializes all IO through
one host, so this module splits the SAME byte format across N shard files
plus a tiny JSON manifest:

    <dir>/manifest.json                 {"format": ..., "shards": [...]}
    <dir>/shard-0000.idx, shard-0001.idx, ...

Every shard file is itself a fully valid reference-format container — the
reference Reader (and this package's Reader) can open any one of them
directly.  Chunks are assigned to shards round-robin in flush order, which
is exactly the chunk->process assignment of multihost.my_chunk_ids, so each
host of an N-process job reads only its own shard file(s) and no cross-host
IO happens at load time.

Crash behavior matches the reference: fully flushed chunks in every shard
remain readable; the manifest is (re)written on finalize and on every flush,
so a crashed build leaves a loadable prefix.
"""

from __future__ import annotations

import json
import os
import typing

from .. import container
from ..api import Reader
from ..ops.suffix_array import build_suffix_array

MANIFEST_NAME = 'manifest.json'
_FORMAT = 'pysubstringsearch-sharded-v1'


def _shard_path(dir_path: str, i: int) -> str:
    return os.path.join(dir_path, f'shard-{i:04d}.idx')


class ShardedWriter:
    """Round-robin chunk writer over N shard containers.

    Same ingestion API and flush policy as the reference Writer; only the
    placement of flushed chunks differs.  ``num_shards`` is typically the
    host count of the serving job.
    """

    def __init__(
        self,
        dir_path: str,
        num_shards: int,
        max_chunk_len: typing.Optional[int] = None,
        *,
        sa_backend: str = 'auto',
    ) -> None:
        if num_shards < 1:
            raise ValueError('num_shards must be >= 1')
        os.makedirs(dir_path, exist_ok=True)
        self._dir = dir_path
        self._files = [
            open(_shard_path(dir_path, i), 'wb') for i in range(num_shards)
        ]
        self._buffer = container.ChunkBuffer(max_chunk_len)
        self._sa_backend = sa_backend
        self._next_shard = 0
        self._chunks_per_shard = [0] * num_shards

    def add_entry(self, text: str) -> None:
        data = text.encode('utf-8')
        if len(data) > self._buffer.capacity:
            raise ValueError('entry is too big')
        if self._buffer.would_overflow(len(data)):
            self.dump_data()
        self._buffer.append(data)

    def add_entries_from_file_lines(self, input_file_path: str) -> None:
        with open(input_file_path, 'rb') as input_file:
            for raw in input_file:
                line = raw
                if line.endswith(b'\n'):
                    line = line[:-1]
                    if line.endswith(b'\r'):
                        line = line[:-1]
                if self._buffer.would_overflow(len(line)):
                    self.dump_data()
                self._buffer.append(line)

    def dump_data(self) -> None:
        if len(self._buffer) == 0:
            return
        data = self._buffer.take()
        sa = build_suffix_array(data, backend=self._sa_backend)
        i = self._next_shard
        container.write_chunk(self._files[i], data, sa)
        self._files[i].flush()
        self._chunks_per_shard[i] += 1
        self._next_shard = (i + 1) % len(self._files)
        self._write_manifest()

    def _write_manifest(self) -> None:
        manifest = {
            'format': _FORMAT,
            'num_shards': len(self._files),
            'shards': [
                {
                    'path': os.path.basename(_shard_path(self._dir, i)),
                    'chunks': self._chunks_per_shard[i],
                }
                for i in range(len(self._files))
            ],
        }
        tmp = os.path.join(self._dir, MANIFEST_NAME + '.tmp')
        with open(tmp, 'w') as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self._dir, MANIFEST_NAME))

    def finalize(self) -> None:
        if len(self._buffer) > 0:
            self.dump_data()
        self._write_manifest()
        for f in self._files:
            f.flush()

    def close(self) -> None:
        self.finalize()
        for f in self._files:
            f.close()
        self._files = []

    def __enter__(self) -> 'ShardedWriter':
        return self

    def __exit__(self, *exc: typing.Any) -> None:
        self.close()


def read_manifest(dir_path: str) -> typing.List[str]:
    """Absolute shard paths listed by a manifest directory."""
    with open(os.path.join(dir_path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    if manifest.get('format') != _FORMAT:
        raise ValueError(f'unknown manifest format: {manifest.get("format")!r}')
    return [
        os.path.join(dir_path, shard['path']) for shard in manifest['shards']
    ]


def local_shard_paths(dir_path: str) -> typing.List[str]:
    """The shard files this process should load (round-robin by process id,
    aligned with multihost.my_chunk_ids)."""
    import jax

    paths = read_manifest(dir_path)
    pid, nproc = jax.process_index(), jax.process_count()
    return [p for i, p in enumerate(paths) if i % nproc == pid]


def open_local_reader(dir_path: str) -> Reader:
    """A Reader over this process's shards (single-process: all of them).

    Chunks from multiple shard files are concatenated; search semantics are
    identical to a single-file index holding the same chunks.
    """
    paths = local_shard_paths(dir_path)
    chunks: typing.List[container.Chunk] = []
    for p in paths:
        chunks.extend(container.read_chunks(p))
    return Reader.from_chunks(chunks)


def convert_index(index_file_path: str, dir_path: str, num_shards: int) -> None:
    """Split an existing single-file index into a sharded manifest (each
    chunk is copied verbatim — no SA rebuild)."""
    os.makedirs(dir_path, exist_ok=True)
    chunks = container.read_chunks(index_file_path)
    files = [open(_shard_path(dir_path, i), 'wb') for i in range(num_shards)]
    counts = [0] * num_shards
    try:
        for i, c in enumerate(chunks):
            container.write_chunk(files[i % num_shards], c.data, c.suffix_array)
            counts[i % num_shards] += 1
    finally:
        for f in files:
            f.close()
    manifest = {
        'format': _FORMAT,
        'num_shards': num_shards,
        'shards': [
            {'path': f'shard-{i:04d}.idx', 'chunks': counts[i]}
            for i in range(num_shards)
        ],
    }
    with open(os.path.join(dir_path, MANIFEST_NAME), 'w') as f:
        json.dump(manifest, f, indent=1)


__all__ = [
    'ShardedWriter',
    'read_manifest',
    'local_shard_paths',
    'open_local_reader',
    'convert_index',
    'MANIFEST_NAME',
]
