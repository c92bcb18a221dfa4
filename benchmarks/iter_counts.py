"""Iteration counts of the phased probe's while_loop per phase class, on the
real bench index — the probe's device cost is ~13 ns x lanes x iterations
(benchmarks/probe_decomp.py), and the while_loop bills every lane for the
slowest lane, so these numbers ARE the p50 decomposition."""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import pysubstringsearch_tpu as pss
    from bench import make_corpus
    from pysubstringsearch_tpu.ops import search as S

    mb = int(os.environ.get('BENCH_MB', '500'))
    nq = int(os.environ.get('BENCH_QUERIES', '10000'))
    cache = os.environ.get('BENCH_IDX_CACHE', '/root/bench_cache')
    chunk_mb = int(os.environ.get('BENCH_CHUNK_MB', '64'))
    idx_path = os.path.join(cache, f'bench-{mb}mb-{chunk_mb}chunk',
                            'bench.idx')
    corpus, _ = make_corpus(mb)
    rng = np.random.default_rng(1)
    offs = rng.integers(0, len(corpus) - 16, size=nq)
    lens = rng.integers(4, 13, size=nq)
    pats = [corpus[o:o + l].replace(b'\n', b'x') for o, l in zip(offs, lens)]
    packed, lengths = S.pack_patterns(pats)

    r = pss.Reader(idx_path)
    idx = r._index
    print(f'rows {idx.num_chunks} pad {idx.n_pad>>20}MiB '
          f'{idx.kind} limbs={idx.num_limbs} depth={idx._depth}',
          flush=True)
    spec, flat = idx._group_batch(packed, lengths)

    def diag(deep):
        def f(text, n, sa, table, limbs, rank, present, sub, sub_len):
            return S.probe_bounds_phased(
                text, n, sa, table, limbs, rank, present, sub, sub_len,
                idx.num_limbs, deep, idx._bits, count_iters=True,
            )
        return jax.jit(jax.vmap(
            f, in_axes=(0, 0, 0, 0, 0, None, None, None, None)))

    def diag_aux(deep):
        def f(text, n, sa, table, limbs, hot_id, aux, rank, present, sub,
              sub_len):
            return S.probe_bounds_phased(
                text, n, sa, table, limbs, rank, present, sub, sub_len,
                idx.num_limbs, deep, idx._bits, count_iters=True,
                hot_id=hot_id, aux=aux,
            )
        return jax.jit(jax.vmap(
            f, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None)))

    def slope(fn, force, K=8):
        def run_k(k):
            t0 = time.time()
            for _ in range(k):
                out = fn()
            force(out)
            return time.time() - t0
        run_k(K)
        t1s, tks = [], []
        for _ in range(5):
            t1s.append(run_k(1)); tks.append(run_k(K))
        t1 = sorted(t1s)[2]; tk = sorted(tks)[2]
        return max((tk - t1) / (K - 1), 1e-9)

    aux_ops = ()
    for (Bk, width, deep), (members, sub, sub_len) in zip(spec, flat):
        t0 = time.time()
        lo, cnt, iters = diag(deep)(
            idx.text, idx.lengths, idx.sa, idx.tables, idx.limbs,
            idx.rank, idx.present, sub, sub_len,
        )
        iters = np.asarray(iters)
        print(f'class Bk={Bk} width={width} deep={deep} real={members.size}: '
              f'NO-AUX limb-loop iters per row = {iters.tolist()} '
              f'(compile+run {time.time()-t0:.1f}s)', flush=True)
        if False:  # hot-bucket aux removed in round 5
            t0 = time.time()
            lo2, cnt2, iters2 = diag_aux(deep)(
                idx.text, idx.lengths, idx.sa, idx.tables, idx.limbs,
                idx.hot_id, idx.aux, idx.rank, idx.present, sub, sub_len,
            )
            print(f'  WITH-AUX iters per row = '
                  f'{np.asarray(iters2).tolist()} '
                  f'(compile+run {time.time()-t0:.1f}s)', flush=True)
            assert np.array_equal(np.asarray(cnt), np.asarray(cnt2))
        # per-class dispatch slope with the PRODUCTION executable
        key = (idx.num_limbs, idx._bits, deep, idx.num_chunks, idx.n_pad,
               idx._base ** idx._depth + 1, Bk, width)
        exe = S.phased_class_exec(*key)
        ops = (idx.text, idx.lengths, idx.sa, idx.tables, idx.limbs)
        if False:  # hot-bucket aux removed in round 5
            ops += (idx.hot_id, idx.aux)
        s = slope(lambda: exe(*ops, idx.rank, idx.present, sub, sub_len),
                  lambda o: int(o[1][0, 0]))
        print(f'  production class slope: {s*1e3:.2f} ms', flush=True)

    # dispatch overhead of a TRIVIAL program at steady state
    import jax.numpy as jnp
    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    triv(x).block_until_ready()
    s = slope(lambda: triv(x), lambda o: int(o[0]), K=16)
    print(f'trivial dispatch slope: {s*1e3:.3f} ms', flush=True)


if __name__ == '__main__':
    main()
