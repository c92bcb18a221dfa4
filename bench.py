"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: p50 wall time to answer a 10k-pattern batched substring query
against a device-resident index on one chip, compared against the reference's
published per-query latency (497 us for search('google') on its 500 MB index,
reference README.md:48-49 — i.e. 10k sequential queries would cost ~4.97 s).

Extra metrics (build throughput, per-phase timings) go to stderr.

Env knobs: BENCH_MB (corpus size, default 64), BENCH_QUERIES (default 10000),
BENCH_CHUNK_MB (chunk size, default 16).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(mb: int, seed: int = 0):
    """Synthetic word corpus in the spirit of the reference README's
    500mb.txt: random words, newline-separated lines."""
    rng = np.random.default_rng(seed)
    nwords = 10_000
    word_len = rng.integers(3, 12, size=nwords)
    words = [
        bytes(rng.integers(97, 123, size=l, dtype=np.uint8).tobytes())
        for l in word_len
    ]
    target = mb * 1024 * 1024
    parts = []
    size = 0
    widx = rng.integers(0, nwords, size=target // 4)
    i = 0
    line_words = []
    while size < target:
        line_words.append(words[widx[i]])
        i += 1
        if len(line_words) == 8:
            line = b' '.join(line_words)
            parts.append(line)
            size += len(line) + 1
            line_words = []
    return b'\n'.join(parts) + b'\n', words


def main():
    t_start = time.time()
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    log(f'backend: {jax.default_backend()}, devices: {jax.devices()}')

    import pysubstringsearch_tpu as pss
    from pysubstringsearch_tpu.ops.search import pack_patterns

    mb = int(os.environ.get('BENCH_MB', '64'))
    nq = int(os.environ.get('BENCH_QUERIES', '10000'))
    chunk_mb = int(os.environ.get('BENCH_CHUNK_MB', '16'))

    corpus, words = make_corpus(mb)
    log(f'corpus: {len(corpus) / 1e6:.1f} MB')

    import tempfile

    d = tempfile.mkdtemp()
    corpus_path = os.path.join(d, 'corpus.txt')
    with open(corpus_path, 'wb') as f:
        f.write(corpus)
    idx_path = os.path.join(d, 'bench.idx')

    # ---- index build (write path) ----
    t0 = time.time()
    w = pss.Writer(idx_path, max_chunk_len=chunk_mb * 1024 * 1024)
    w.add_entries_from_file_lines(corpus_path)
    w.finalize()
    t_build = time.time() - t0
    build_mbps = len(corpus) / 1e6 / t_build
    log(f'build: {t_build:.2f}s -> {build_mbps:.1f} MB/s '
        f'(index {os.path.getsize(idx_path) / 1e6:.1f} MB)')

    # ---- load ----
    t0 = time.time()
    r = pss.Reader(idx_path)
    _ = r._index  # force device residency
    log(f'load: {time.time() - t0:.2f}s')

    # ---- batched probe (query hot path) ----
    rng = np.random.default_rng(1)
    pats = [words[rng.integers(0, len(words))] for _ in range(nq)]
    packed, lengths = pack_patterns(pats)

    # warm up (compile)
    t0 = time.time()
    lo, cnt = r._index.probe(packed, lengths)
    log(f'probe warmup (compile): {time.time() - t0:.2f}s, '
        f'total hits {int(cnt.sum())}')

    times = []
    for _ in range(5):
        t0 = time.time()
        lo, cnt = r._index.probe(packed, lengths)
        times.append(time.time() - t0)
    p50 = sorted(times)[len(times) // 2]
    qps = nq / p50
    log(f'{nq} queries: p50 {p50 * 1e3:.2f} ms -> {qps / 1e6:.3f} M queries/s')

    # Reference equivalent: 497 us/query sequential (README.md:48-49).
    ref_10k = nq * 497e-6
    result = {
        'metric': f'{nq} batched substring queries, {mb}MB index, 1 chip',
        'value': round(p50 * 1e3, 3),
        'unit': 'ms',
        'vs_baseline': round(ref_10k / p50, 2),
    }
    log(f'extras: build_mbps={build_mbps:.2f} '
        f'total_wall={time.time() - t_start:.1f}s')
    print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
