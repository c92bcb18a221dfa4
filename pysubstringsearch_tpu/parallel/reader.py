"""ShardedReader — the Reader, scaled over a device mesh.

Same API and result-set semantics as ``api.Reader`` (the conformance tests
run against both), but chunk arrays are placed across a 1-D mesh with
``NamedSharding`` and the probe runs as one sharded program: queries
replicated to every device, per-chunk hit ranges all-gathered back (the
collective analog of the reference's rayon fan-out + mutex merge,
src/lib.rs:205-284).

Single-host form: every process holds all chunk text for line extraction and
shards only the device arrays.  The multi-host recipe (each host feeding its
own chunk shard, DCN gather of hit ranges, host-0 merge) composes from the
same pieces — see ``sharded_probe_program`` and docs in ARCHITECTURE.md.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import container
from ..ops import search as search_ops
from ..ops.extract import LineTable
from ..ops.suffix_array import _pad_len
from .mesh import CHUNK_AXIS, make_mesh


class ShardedReader:
    def __init__(
        self,
        index_file_path: str,
        mesh: typing.Optional[jax.sharding.Mesh] = None,
    ) -> None:
        self._chunks = container.read_chunks(index_file_path)
        self._tables = [LineTable(c.data) for c in self._chunks]
        self.mesh = mesh if mesh is not None else make_mesh()
        self._num_real = len(self._chunks)
        self._build_device_state()

    def _build_device_state(self) -> None:
        d = self.mesh.devices.size
        # Pad the chunk count to a mesh multiple; padding chunks have n = 0
        # and can never produce hits.
        C = max(d, -(-max(self._num_real, 1) // d) * d)
        max_n = max((c.data.size for c in self._chunks), default=1)
        n_pad = _pad_len(max_n + search_ops.PAD_MARGIN)
        text = np.zeros((C, n_pad), dtype=np.uint8)
        sa = np.zeros((C, n_pad), dtype=np.int32)
        n = np.zeros((C,), dtype=np.int32)
        for i, c in enumerate(self._chunks):
            text[i, : c.data.size] = c.data
            sa[i, : c.suffix_array.size] = c.suffix_array
            n[i] = c.data.size
        shard = NamedSharding(self.mesh, P(CHUNK_AXIS))
        self.text = jax.device_put(text, shard)
        self.sa = jax.device_put(sa, shard)
        self.lengths = jax.device_put(n, shard)
        # Host-built tables: the load path stays H2D-only (see models/index.py).
        from ..models.index import DeviceIndex

        # Limb-kind selection mirrors models/index.py.
        pres = np.zeros(256, dtype=bool)
        for c in self._chunks:
            pres |= np.bincount(c.data, minlength=256)[:256] > 0
        sigma = int(pres.sum())
        bits = search_ops.ranked_bits(sigma)
        if bits is not None:
            self._kind = 'ranked'
        elif not pres[0]:
            self._kind = 'raw'
        else:
            self._kind = 'digit'
        self._bits = bits
        if self._kind in ('ranked', 'raw'):
            rank, sigma = search_ops.alphabet_rank(pres)
            base, depth = search_ops.pick_table_params(sigma, max_n)
        else:
            rank, pres_i = search_ops.identity_rank()
            pres = pres_i > 0
            base = search_ops._RADIX
            depth = 3 if max_n >= DeviceIndex.DEEP_TABLE_MIN_CHUNK else 2
        host_tables = np.zeros((C, base ** depth + 1), dtype=np.int32)
        for i, c in enumerate(self._chunks):
            host_tables[i] = search_ops.build_seed_table_host(
                c.data, c.suffix_array, rank, base, depth
            )
        self.tables = jax.device_put(host_tables, shard)
        self.rank = jnp.asarray(rank)
        self.present = jnp.asarray(pres.astype(np.int32))
        self._base, self._depth = base, depth
        self.num_limbs = (
            search_ops.KEY_LIMBS if self._kind == 'digit'
            else search_ops.RAW_LIMBS
        )
        # Plane-major limb layout — see ops/search.py:_limb_cmp3.
        limbs = np.zeros((C, n_pad * self.num_limbs), dtype=np.int32)
        for i, c in enumerate(self._chunks):
            if self._kind == 'ranked':
                k = search_ops.build_ranked_limbs_host(
                    c.data, c.suffix_array, rank, self.num_limbs, depth,
                    self._bits,
                )
            elif self._kind == 'raw':
                k = search_ops.build_raw_limbs_host(
                    c.data, c.suffix_array, self.num_limbs, depth
                )
            else:
                k = search_ops.build_limbs_host(
                    c.data, c.suffix_array, self.num_limbs
                )
            limbs[i] = search_ops.pad_limbs_host(k, n_pad)
        self.limbs = jax.device_put(limbs, shard)
        self._n_pad = n_pad
        self._C = C

    def _probe(self, patterns: np.ndarray, lengths: np.ndarray):
        if self._kind == 'digit':
            cover = search_ops.key_cover_bytes(self.num_limbs)
            probe = search_ops.limbs_loop_batch_jit(
                patterns.shape[1] > cover, self.num_limbs
            )
            lo, cnt = probe(
                self.text, self.lengths, self.sa, self.tables, self.limbs,
                jnp.asarray(patterns), jnp.asarray(lengths),
            )
            return np.asarray(lo), np.asarray(cnt)
        if self._kind == 'ranked':
            cover = search_ops.ranked_cover_bytes(
                self.num_limbs, self._depth, self._bits
            )
        else:
            cover = search_ops.raw_cover_bytes(self.num_limbs, self._depth)
        probe = search_ops.phased_batch_jit(
            patterns.shape[1] > cover, self.num_limbs, self._bits
        )
        lo, cnt = probe(
            self.text, self.lengths, self.sa, self.tables, self.limbs,
            self.rank, self.present,
            jnp.asarray(patterns), jnp.asarray(lengths),
        )
        lo, cnt = np.asarray(lo), np.asarray(cnt)
        if self._kind == 'raw':
            jpos = np.arange(patterns.shape[1])[None, :]
            has_nul = np.any(
                (patterns == 0) & (jpos < np.asarray(lengths)[:, None]),
                axis=1,
            )
            if has_nul.any():
                lo = np.where(has_nul[None, :], 0, lo)
                cnt = np.where(has_nul[None, :], 0, cnt)
        return lo, cnt

    def _search_batch(self, patterns: typing.List[bytes]):
        if not patterns or not self._chunks:
            return [[] for _ in patterns]
        # Duplicate patterns are probed once (see api.Reader._search_batch).
        uniq: typing.Dict[bytes, int] = {}
        for p in patterns:
            uniq.setdefault(p, len(uniq))
        if len(uniq) < len(patterns):
            uniq_results = self._search_batch(list(uniq))
            return [uniq_results[uniq[p]] for p in patterns]
        if max(len(p) for p in patterns) > search_ops.PAD_MARGIN:
            out = []
            for pat in patterns:
                results: typing.List[str] = []
                for c, chunk in enumerate(self._chunks):
                    lo, cnt = search_ops.host_probe_bounds(
                        chunk.data.tobytes(), chunk.suffix_array, pat
                    )
                    positions = chunk.suffix_array[lo : lo + cnt]
                    results.extend(
                        self._tables[c].extract_unique_lines(positions)
                    )
                out.append(results)
            return out
        packed, lengths = search_ops.pack_patterns(patterns)
        lo, cnt = self._probe(packed, lengths)
        out: typing.List[typing.List[str]] = [[] for _ in patterns]
        for c, chunk in enumerate(self._chunks):
            per = self._tables[c].extract_lines_batch(
                chunk.suffix_array, lo[c], cnt[c]
            )
            for b, lines in per.items():
                out[b].extend(lines)
        return out

    def search(self, substring: str) -> typing.List[str]:
        return self._search_batch([substring.encode('utf-8')])[0]

    def search_multiple(self, substrings: typing.List[str]) -> typing.List[str]:
        per = self._search_batch([s.encode('utf-8') for s in substrings])
        results: typing.List[str] = []
        for r in per:
            results.extend(r)
        return results
