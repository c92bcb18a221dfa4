"""One-derive hardware session: slope-method p50, per-class decomposition,
and a guarded aux attach + re-measure (VERDICT r5 items 1 and 6).

Writes benchmarks/probe_session_r5.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from bench import make_corpus, log  # noqa: E402
import pysubstringsearch_tpu as pss  # noqa: E402
from pysubstringsearch_tpu.ops import search as search_ops  # noqa: E402
from pysubstringsearch_tpu.ops.search import pack_patterns  # noqa: E402

IDX = '/dev/shm/buildtest/aux_ab.idx'
corpus, _ = make_corpus(500)
rng = np.random.default_rng(1)  # SAME stream as bench.py
nq = 10000
offs = rng.integers(0, len(corpus) - 16, size=nq)
lens = rng.integers(4, 13, size=nq)
pats = [corpus[o: o + l].replace(b'\n', b'x') for o, l in zip(offs, lens)]
packed, lengths = pack_patterns(pats)

r = pss.Reader(IDX)
t0 = time.time()
r.wait_device_ready()
idx = r._index
log(f'ready {time.time()-t0:.1f}s; rows {idx.num_chunks} x {idx.n_pad>>20} MiB, '
    f'{idx.num_limbs} {idx.kind} limbs')
out = {'rows': idx.num_chunks, 'n_pad_mib': idx.n_pad >> 20,
       'num_limbs': idx.num_limbs, 'kind': idx.kind}

def slope(tag, K=8):
    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            parts = idx.probe_device_parts(packed, lengths)
        int(parts[-1][2][0, 0])
        return time.time() - t0
    run_k(K)
    t1s, tKs = [], []
    for _ in range(5):
        t1s.append(run_k(1))
        tKs.append(run_k(K))
    t1 = sorted(t1s)[2]
    tK = sorted(tKs)[2]
    p50 = (tK - t1) / (K - 1)
    log(f'{tag}: p50 {p50*1e3:.2f} ms (t1 {t1*1e3:.1f} tK {tK*1e3:.1f})')
    return p50 * 1e3

idx.probe_device_parts(packed, lengths)  # warm shapes
out['p50_aux_off_ms'] = slope('aux OFF')

# Per-class decomposition: time each class's dispatch stream separately.
spec = search_ops.class_spec(lengths, idx._depth, idx._limb_bytes,
                             idx.cover_bytes, idx.num_limbs)
log(f'classes: {[(Bk, w, dp) for (Bk, w, dp) in [(s[0], s[1], s[2]) for s in spec]]}')
flat = idx._flatten_classes(packed, lengths, spec) if hasattr(idx, '_flatten_classes') else None
out['classes'] = [[int(s[0]), int(s[1]), bool(s[2])] for s in spec]

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'probe_session_r5.json'), 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
sys.stdout.flush()
os._exit(0)
