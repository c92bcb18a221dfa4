"""Flat-gather cost vs array size and index locality, on real TPU.

Decides the round-2 probe redesign: if gathers from small (VMEM-scale)
arrays are much cheaper than from HBM-scale arrays, a sampled hierarchical
bisection wins; if sorted/clustered indices are cheaper than uniform ones,
sorting the per-step mids pays; if neither, the lever is gathering fewer
elements (phased limb search + deeper bucket seeding).
"""

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
    def run_k(k):
        t0 = time.time()
        for _ in range(k):
            out = fn()
        force(out)
        return time.time() - t0

    run_k(hi_k)
    t1s, tks = [], []
    for _ in range(trials):
        t1s.append(run_k(lo_k))
        tks.append(run_k(hi_k))
    t1 = sorted(t1s)[len(t1s) // 2]
    tk = sorted(tks)[len(tks) // 2]
    return max((tk - t1) / (hi_k - lo_k), 1e-9)


def gather_reps(arr, idx, reps):
    size = arr.shape[0]

    def body(i, acc):
        rows = jnp.take(arr, (idx + i) % size, axis=0)
        return acc + jnp.sum(rows)

    return lax.fori_loop(0, reps, body, jnp.zeros((), arr.dtype))


def main():
    log(f'backend={jax.default_backend()}')
    results = []
    rng = np.random.default_rng(0)
    gj = jax.jit(gather_reps)
    CNT = 20480
    REPS = 64

    for size_mi in (0.25, 2, 16, 64, 420):
        size = int(size_mi * (1 << 20))
        arr = jax.random.randint(jax.random.PRNGKey(1), (size,), 0,
                                 1 << 30, dtype=jnp.int32)
        arr.block_until_ready()
        uniform = rng.integers(0, size, size=CNT).astype(np.int32)
        cases = {
            'uniform': uniform,
            'sorted': np.sort(uniform),
        }
        # Clustered: 640 random 32-element runs (bisection-tail locality).
        base = rng.integers(0, max(size - 1024, 1), size=CNT // 32)
        cases['clustered'] = (
            base[:, None] + np.arange(32) * 4
        ).reshape(-1).astype(np.int32) % size
        for name, idx_h in cases.items():
            idx = jnp.asarray(idx_h)
            t0 = time.time()
            out = gj(arr, idx, jnp.int32(1))
            out.block_until_ready()
            warm = time.time() - t0
            t_lo = slope(lambda: gj(arr, idx, jnp.int32(1)), lambda o: int(o))
            t_hi = slope(lambda: gj(arr, idx, jnp.int32(REPS)),
                         lambda o: int(o))
            per_rep = (t_hi - t_lo) / (REPS - 1)
            ns = per_rep / CNT * 1e9
            log(f'GATHER size={size_mi}Mi {name}: {per_rep*1e6:.1f} us/rep '
                f'= {ns:.2f} ns/elem (warm {warm:.1f}s)')
            results.append({'size_mi': size_mi, 'case': name,
                            'ns_per_elem': ns})
        del arr

    # Smaller index counts on a big array: is there a fixed floor?
    size = 420 << 20
    arr = jax.random.randint(jax.random.PRNGKey(1), (size,), 0,
                             1 << 30, dtype=jnp.int32)
    arr.block_until_ready()
    for cnt in (2048, 8192, 20480, 81920):
        idx = jnp.asarray(rng.integers(0, size, size=cnt).astype(np.int32))
        t_lo = slope(lambda: gj(arr, idx, jnp.int32(1)), lambda o: int(o))
        t_hi = slope(lambda: gj(arr, idx, jnp.int32(REPS)), lambda o: int(o))
        per_rep = (t_hi - t_lo) / (REPS - 1)
        log(f'GATHER 420Mi cnt={cnt}: {per_rep*1e6:.1f} us/rep '
            f'= {per_rep/cnt*1e9:.2f} ns/elem')
        results.append({'size_mi': 420, 'cnt': cnt,
                        'ns_per_elem': per_rep / cnt * 1e9})

    # uint8 gather (text-window alternative costing).
    arr8 = (arr % 256).astype(jnp.uint8)
    idx = jnp.asarray(rng.integers(0, size, size=CNT).astype(np.int32))

    def gather8(arr, idx, reps):
        def body(i, acc):
            rows = jnp.take(arr, (idx + i) % size, axis=0)
            return acc + jnp.sum(rows.astype(jnp.int32))
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))

    g8 = jax.jit(gather8)
    t_lo = slope(lambda: g8(arr8, idx, jnp.int32(1)), lambda o: int(o))
    t_hi = slope(lambda: g8(arr8, idx, jnp.int32(REPS)), lambda o: int(o))
    per_rep = (t_hi - t_lo) / (REPS - 1)
    log(f'GATHER uint8 420Mi cnt={CNT}: {per_rep/CNT*1e9:.2f} ns/elem')
    results.append({'size_mi': 420, 'case': 'uint8',
                    'ns_per_elem': per_rep / CNT * 1e9})

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'gather_sweep_results.json'), 'w') as f:
        json.dump(results, f, indent=1)
    log('DONE')


if __name__ == '__main__':
    main()
