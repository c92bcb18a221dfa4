"""Hardware coverage bench for the non-'ranked' limb kinds.

The headline bench corpus (lowercase words, sigma~27) always selects the
'ranked' limb encoding, so the 'raw' (big NUL-free alphabet, 4-byte packed
limbs) and 'digit' (NUL present, base-258 limbs) production paths never run
on the real chip at scale.  This script closes that gap: for each kind it

1. generates a corpus whose alphabet forces the kind (raw: bytes 33..126,
   sigma=94, no NUL; digit: the same plus '\\x00' sprinkled in),
2. builds a real index via the public Writer, loads it with the public
   Reader (device path), and
3. VERIFIES ~64 random pattern searches against a pure-host ground truth
   (multiset equality per pattern, matching the reference's
   assertCountEqual semantics), then
4. measures the batched probe p50 via the dispatch-slope method used by
   bench.py.

Writes benchmarks/kinds_results.json.  Run: python benchmarks/kinds_bench.py
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import pysubstringsearch_tpu as pss  # noqa: E402
from pysubstringsearch_tpu.ops.search import pack_patterns  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(kind: str, mb: int, seed: int = 0) -> bytes:
    """Newline-separated lines over an alphabet that forces ``kind``."""
    rng = np.random.default_rng(seed)
    n = mb * 1024 * 1024
    # sigma=94 printable bytes, no NUL, no \n -> ranked_bits() is None.
    body = rng.integers(33, 127, size=n, dtype=np.uint8)
    if kind == 'digit':
        # NUL present + sigma>62 -> 'digit'.  ~0.1% NULs.
        nul_at = rng.integers(0, n, size=n // 1000)
        body[nul_at] = 0
    # Line breaks every 40..120 bytes.
    pos = np.cumsum(rng.integers(40, 121, size=n // 40))
    pos = pos[pos < n - 1]
    body[pos] = 10
    if body[-1] == 10:
        body[-1] = 65
    return body.tobytes()


def ground_truth(corpus: bytes, pattern: bytes):
    """Lines of ``corpus`` containing ``pattern`` (dedup per line offset,
    multiplicity per distinct line occurrence) — the reference semantics."""
    starts = set()
    at = corpus.find(pattern)
    while at != -1:
        starts.add(corpus.rfind(b'\n', 0, at) + 1)
        at = corpus.find(pattern, at + 1)
    out = []
    for s in starts:
        e = corpus.find(b'\n', s)
        out.append(corpus[s:e if e != -1 else len(corpus)])
    return sorted(out)


def run_kind(kind: str, mb: int, d: str) -> dict:
    corpus = make_corpus(kind, mb)
    idx_path = os.path.join(d, f'kinds-{kind}.idx')
    t0 = time.time()
    w = pss.Writer(index_file_path=idx_path)
    for line in corpus.split(b'\n'):
        w.add_entry(line.decode('latin-1'))
    w.finalize()
    build_s = time.time() - t0
    # Writer appends '\n' per entry; reconstruct the exact indexed buffer.
    indexed = b'\n'.join(corpus.split(b'\n')) + b'\n'

    t0 = time.time()
    r = pss.Reader(idx_path)
    r.wait_device_ready()
    load_s = time.time() - t0
    idx = r._index
    assert idx.kind == kind, (idx.kind, kind)
    log(f'[{kind}] corpus {len(corpus) / 1e6:.0f} MB, build {build_s:.1f}s, '
        f'load {load_s:.1f}s, limbs={idx.num_limbs} base={idx._base}'
        f'^{idx._depth} pad={idx.n_pad >> 20} MiB')

    # ---- correctness vs ground truth ----
    rng = np.random.default_rng(7)
    offs = rng.integers(0, len(corpus) - 16, size=64)
    lens = rng.integers(3, 11, size=64)
    checked = 0
    for o, l in zip(offs, lens):
        pat = corpus[o:o + l].replace(b'\n', b'!')
        got = sorted(s.encode('latin-1') for s in
                     r.search(pat.decode('latin-1')))
        want = ground_truth(indexed[:-1], pat)
        assert got == want, (
            kind, pat, len(got), len(want), got[:3], want[:3])
        checked += 1
    log(f'[{kind}] {checked} random patterns verified vs host ground truth')

    # ---- batched probe p50 (dispatch-slope) ----
    nq = 2000
    offs = rng.integers(0, len(corpus) - 16, size=nq)
    lens = rng.integers(4, 13, size=nq)
    pats = [corpus[o:o + l].replace(b'\n', b'!') for o, l in zip(offs, lens)]
    packed, lengths = pack_patterns(pats)

    def run_k(k: int) -> float:
        t0 = time.time()
        for _ in range(k):
            parts = idx.probe_device_parts(packed, lengths)
        int(parts[-1][2][0, 0])
        return time.time() - t0

    K = 8
    run_k(1)  # compile
    run_k(K)
    t1s, tKs = [], []
    for _ in range(5):
        t1s.append(run_k(1))
        tKs.append(run_k(K))
    t1 = sorted(t1s)[len(t1s) // 2]
    tK = sorted(tKs)[len(tKs) // 2]
    p50 = max((tK - t1) / (K - 1), 1e-9)
    log(f'[{kind}] {nq} queries: p50 {p50 * 1e3:.2f} ms/batch '
        f'({nq / p50 / 1e6:.3f} M q/s)')
    return {
        'kind': kind, 'corpus_mb': mb, 'build_s': round(build_s, 2),
        'load_s': round(load_s, 2), 'num_limbs': idx.num_limbs,
        'verified_patterns': checked, 'batch': nq,
        'p50_ms': round(p50 * 1e3, 3),
    }


def main():
    mb = int(os.environ.get('KINDS_MB', '48'))
    log(f'backend: {jax.default_backend()}, devices: {jax.devices()}')
    d = '/dev/shm' if os.path.isdir('/dev/shm') else '/tmp'
    results = {
        'note': (
            'Raw/digit limb-kind production paths on real hardware: '
            'public Writer->Reader round trip, 64 searches verified vs host '
            'ground truth per kind, then batched-probe p50 via the '
            'dispatch-slope method.'),
        'backend': jax.default_backend(),
        'results': [run_kind(k, mb, d) for k in ('raw', 'digit')],
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'kinds_results.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=2)
    log(f'wrote {out}')
    print(json.dumps(results['results']))


if __name__ == '__main__':
    main()
