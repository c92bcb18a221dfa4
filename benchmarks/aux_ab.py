"""Hardware A/B for the deferred hot-bucket aux tables (VERDICT r4 item 6).

One device derive serves both arms: measure the 10k-batch probe p50 on the
aux-free ladder, then build_aux() on the same live index and re-measure on
the aux ladder.  Prints both p50s and the delta; writes
benchmarks/aux_ab_results.json.
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
from pysubstringsearch_tpu.ops.search import pack_patterns  # noqa: E402

IDX = os.environ.get('AUX_AB_IDX', '/dev/shm/buildtest/aux_ab.idx')

corpus, _ = make_corpus(500)
if not os.path.exists(IDX):
    log('building index...')
    w = pss.Writer(IDX, max_chunk_len=8 * 1024 * 1024)
    cp = '/dev/shm/buildtest/corpus.txt'
    if not os.path.exists(cp):
        open(cp, 'wb').write(corpus)
    w.add_entries_from_file_lines(cp)
    w.finalize()

rng = np.random.default_rng(1234)
nq = 10000
lens = rng.integers(4, 13, size=nq)
offs = rng.integers(0, len(corpus) - 16, size=nq)
pats = [corpus[o: o + l].replace(b'\n', b'x') for o, l in zip(offs, lens)]
packed, plens = pack_patterns(pats)

r = pss.Reader(IDX)
t0 = time.time()
r._device_ready.wait(timeout=900)
idx = r._device_index
assert idx is not None, r._device_exc
log(f'device ready in {time.time() - t0:.1f}s; aux present: {idx.aux is not None}')

def p50(tag, reps=9):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        lo, cnt = idx.probe(packed, plens)
        np.asarray(cnt).sum()
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f'{tag}: p50 {med * 1e3:.2f} ms (min {min(ts)*1e3:.2f}, max {max(ts)*1e3:.2f})')
    return med

idx.probe(packed, plens)  # warm class shapes
p_off = p50('aux OFF')
t0 = time.time()
idx.build_aux()
aux_s = time.time() - t0
log(f'build_aux: {aux_s:.1f}s; aux present: {idx.aux is not None}')
idx.probe(packed, plens)  # warm aux-ladder shapes
p_on = p50('aux ON ')
out = {'p50_aux_off_ms': p_off * 1e3, 'p50_aux_on_ms': p_on * 1e3,
       'build_aux_s': aux_s, 'nq': nq}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'aux_ab_results.json'), 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
sys.stdout.flush()
os._exit(0)
