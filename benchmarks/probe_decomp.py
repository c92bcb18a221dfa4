"""Probe cost decomposition on real TPU hardware.

Answers the round-2 performance questions with measurements, not estimates:

1. Per-bisection-step cost of the production loop probe, decomposed into a
   fixed per-step component and a per-gathered-element component (vary the
   step count with a TRACED fori bound so one compiled program covers every
   step count; vary gathered volume via pattern width -> k_used and via B).
2. Raw flat-element-gather throughput (ns/element) for int32 and int64 at
   probe-realistic index counts -- decides whether 7-byte int64 "superlimb"
   keys (1 gather/lane/step) beat the current 3-byte int32 limbs
   (k_used gathers/lane/step).
3. lax.while_loop / fori_loop per-iteration overhead with a trivial body.

All data is GENERATED ON DEVICE (no 64 MB H2D through the ~10 MB/s tunnel);
timings use the dispatch-slope method (see bench.py) because the remote
runtime is fully asynchronous.
"""

import functools
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def log(*a):
    print(*a, flush=True)


def slope(fn, force, lo_k=1, hi_k=8, trials=5):
    """Per-dispatch seconds via dispatch slope: (t_hi - t_lo)/(hi - lo)."""
    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            out = fn()
        force(out)
        return time.time() - t0

    run_k(hi_k)  # steady-state
    t1s, tks = [], []
    for _ in range(trials):
        t1s.append(run_k(lo_k))
        tks.append(run_k(hi_k))
    t1 = sorted(t1s)[len(t1s) // 2]
    tk = sorted(tks)[len(tks) // 2]
    return max((tk - t1) / (hi_k - lo_k), 1e-9)


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pysubstringsearch_tpu.ops import search as S

    log(f'backend={jax.default_backend()} devices={jax.devices()}')
    results = []

    N = (64 << 20)  # padded length, margin included
    n = N - 4096
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    text = jax.random.randint(key, (N,), 97, 123, dtype=jnp.int32).astype(jnp.uint8)
    iota_mask = (jnp.arange(N, dtype=jnp.int32) < n)
    text = jnp.where(iota_mask, text, 0)
    text.block_until_ready()
    log(f'text gen {time.time()-t0:.1f}s')

    t0 = time.time()
    sa, _poisoned = S.derive_sa(text, jnp.int32(n))
    sa.block_until_ready()
    log(f'derive sa {time.time()-t0:.1f}s')

    NUM_LIMBS = 5
    t0 = time.time()
    limbs, table = S.derive_aux_jit(NUM_LIMBS, 3)(text, jnp.int32(n), sa)
    limbs.block_until_ready()
    log(f'derive aux {time.time()-t0:.1f}s')

    rng = np.random.default_rng(1)

    def make_patterns(nq, lmin, lmax, L):
        pats = [bytes(rng.integers(97, 123, size=int(l), dtype=np.uint8))
                for l in rng.integers(lmin, lmax + 1, size=nq)]
        packed, lengths = S.pack_patterns(pats, max_len=L)
        return jnp.asarray(packed), jnp.asarray(lengths)

    # ---- 1. production while_loop probe (the r01 baseline shape) ----
    for (L, lmin, lmax, B) in ((14, 4, 12, 10000),):
        pats, lens = make_patterns(B, lmin, lmax, L)
        probe = S.limbs_loop_batch_jit(False, NUM_LIMBS)
        t0 = time.time()
        out = probe(text[None], jnp.asarray([n]), sa[None], table[None],
                    limbs[None], pats, lens)
        out[0].block_until_ready()
        log(f'while-probe warmup {time.time()-t0:.1f}s')
        s = slope(lambda: probe(text[None], jnp.asarray([n]), sa[None],
                                table[None], limbs[None], pats, lens),
                  lambda o: int(o[1][0, 0]))
        log(f'WHILE-PROBE L={L} B={B}: {s*1e3:.3f} ms')
        results.append({'what': 'while_probe', 'L': L, 'B': B, 'ms': s * 1e3})

    # ---- 2. forced-step fori probe: one program, traced step count ----
    def probe_forced(text, n, sa, table, limbs_flat, patterns, lengths,
                     steps, num_limbs):
        n = jnp.asarray(n, jnp.int32)
        both, both_len, thresholds = S._duplex(patterns, lengths)
        L = patterns.shape[1]
        k_used = max(1, min(num_limbs, -(-(L - 2) // 3)))
        bucket, tgt = S._pattern_limb_targets(
            jnp.concatenate([patterns, patterns], axis=0).astype(jnp.uint8),
            both_len, thresholds, k_used,
            bucket_depth=S._bucket_depth(table.shape[0]),
        )
        lo0 = jnp.take(table, bucket, axis=0)
        hi0 = jnp.take(table, bucket + 1, axis=0)

        def body(i, state):
            lo, hi = state
            mid = (lo + hi) // 2
            cmp = S._limb_cmp3(limbs_flat, mid, tgt, num_limbs, k_used)
            pred = cmp >= thresholds
            active = lo < hi
            hi = jnp.where(jnp.logical_and(active, pred), mid, hi)
            lo = jnp.where(jnp.logical_and(active, ~pred), mid + 1, lo)
            return lo, hi

        lo, _ = lax.fori_loop(0, steps, body, (lo0, hi0))
        B = patterns.shape[0]
        return lo[:B], lo[B:] - lo[:B]

    forced_jit = jax.jit(probe_forced, static_argnums=(8,))

    for (L, lmin, lmax, B) in ((14, 4, 12, 10000), (8, 4, 6, 10000),
                               (14, 4, 12, 1000)):
        pats, lens = make_patterns(B, lmin, lmax, L)
        xs, ys = [], []
        for steps in (4, 8, 16, 32):
            st = jnp.int32(steps)
            t0 = time.time()
            out = forced_jit(text, n, sa, table, limbs, pats, lens, st,
                             NUM_LIMBS)
            out[0].block_until_ready()
            warm = time.time() - t0
            s = slope(lambda: forced_jit(text, n, sa, table, limbs, pats,
                                         lens, st, NUM_LIMBS),
                      lambda o: int(o[1][0]))
            log(f'FORCED L={L} B={B} steps={steps}: {s*1e3:.3f} ms '
                f'(warm {warm:.1f}s)')
            xs.append(steps)
            ys.append(s)
        A = np.vstack([np.array(xs), np.ones(len(xs))]).T
        coef, _, _, _ = np.linalg.lstsq(A, np.array(ys), rcond=None)
        k_used = max(1, min(NUM_LIMBS, -(-(L - 2) // 3)))
        per_elem = coef[0] / (2 * B * k_used)
        log(f'  -> per-step {coef[0]*1e6:.1f} us, intercept '
            f'{coef[1]*1e6:.1f} us, per-elem {per_elem*1e9:.2f} ns '
            f'(k_used={k_used})')
        results.append({'what': 'forced_probe', 'L': L, 'B': B,
                        'per_step_us': coef[0] * 1e6,
                        'intercept_us': coef[1] * 1e6,
                        'per_elem_ns': per_elem * 1e9})

    # ---- 3. raw flat gather: int32 ----
    def gather_reps(arr, idx, reps):
        size = arr.shape[0]

        def body(i, acc):
            rows = jnp.take(arr, (idx + i) % size, axis=0)
            return acc + jnp.sum(rows)

        return lax.fori_loop(0, reps, body, jnp.zeros((), arr.dtype))

    gather_jit = jax.jit(gather_reps)
    for cnt in (20480, 81920):
        idx = jnp.asarray(
            rng.integers(0, NUM_LIMBS * N, size=cnt).astype(np.int32))
        for reps in (64,):
            t0 = time.time()
            out = gather_jit(limbs, idx, jnp.int32(1))
            out.block_until_ready()
            warm = time.time() - t0
            t_lo = slope(lambda: gather_jit(limbs, idx, jnp.int32(1)),
                         lambda o: int(o))
            t_hi = slope(lambda: gather_jit(limbs, idx, jnp.int32(reps)),
                         lambda o: int(o))
            per_rep = (t_hi - t_lo) / (reps - 1)
            log(f'GATHER int32 cnt={cnt}: {per_rep*1e6:.1f} us/rep '
                f'= {per_rep/cnt*1e9:.2f} ns/elem (warm {warm:.1f}s)')
            results.append({'what': 'gather_i32', 'cnt': cnt,
                            'ns_per_elem': per_rep / cnt * 1e9})

    # ---- 4. raw flat gather: int64 (superlimb candidate) ----
    try:
        with jax.enable_x64(True):
            arr64 = jax.random.randint(
                jax.random.PRNGKey(2), (2 * N,), 0, 1 << 55, dtype=jnp.int64)
            arr64.block_until_ready()
            g64 = jax.jit(gather_reps)
            for cnt in (20480,):
                idx = jnp.asarray(
                    rng.integers(0, 2 * N, size=cnt).astype(np.int32))
                t0 = time.time()
                out = g64(arr64, idx, 1)
                out.block_until_ready()
                warm = time.time() - t0
                t_lo = slope(lambda: g64(arr64, idx, 1), lambda o: int(o))
                t_hi = slope(lambda: g64(arr64, idx, 64), lambda o: int(o))
                per_rep = (t_hi - t_lo) / 63
                log(f'GATHER int64 cnt={cnt}: {per_rep*1e6:.1f} us/rep '
                    f'= {per_rep/cnt*1e9:.2f} ns/elem (warm {warm:.1f}s)')
                results.append({'what': 'gather_i64', 'cnt': cnt,
                                'ns_per_elem': per_rep / cnt * 1e9})
            del arr64
    except Exception as e:
        log(f'int64 gather failed: {e!r}')
        results.append({'what': 'gather_i64', 'error': repr(e)})

    # ---- 5. loop overhead: trivial body ----
    def trivial(x, steps):
        def body(i, acc):
            return acc + 1
        return lax.fori_loop(0, steps, body, x)

    triv_jit = jax.jit(trivial)
    x = jnp.zeros((20480,), jnp.int32)
    t_lo = slope(lambda: triv_jit(x, jnp.int32(4)), lambda o: int(o[0]))
    t_hi = slope(lambda: triv_jit(x, jnp.int32(128)), lambda o: int(o[0]))
    per_step = (t_hi - t_lo) / 124
    log(f'LOOP overhead [20480] body: {per_step*1e6:.2f} us/step')
    results.append({'what': 'loop_overhead', 'us_per_step': per_step * 1e6})

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'probe_decomp_results.json'), 'w') as f:
        json.dump(results, f, indent=1)
    log('DONE')


if __name__ == '__main__':
    main()
