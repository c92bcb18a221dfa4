"""Micro-benchmarks for the device kernels, using the slope methodology.

Why slopes: this environment's remote-attach TPU runtime is fully
asynchronous — ``block_until_ready`` can return before device completion —
and its first device->host readback adds a large constant per-dispatch
transport penalty.  Single-call wall times are therefore meaningless in both
directions.  True device time is the slope between a 1-rep and a K-rep
in-jit repetition of the op (pattern-varied to defeat CSE), each forced to
completion by a scalar checksum readback; the constant overheads cancel.

Run:  python benchmarks/microbench.py [probe|sort|build|all]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def slope_time(make_jit, args, ks=(1, 8), trials=3):
    """Device seconds per repetition of the op encoded by ``make_jit(k)``."""
    walls = {}
    for k in ks:
        f = make_jit(k)
        int(f(*args))  # compile + enter observable mode
        ts = []
        for _ in range(trials):
            t0 = time.time()
            int(f(*args))
            ts.append(time.time() - t0)
        walls[k] = min(ts)
    return (walls[ks[1]] - walls[ks[0]]) / (ks[1] - ks[0])


def bench_probe():
    from pysubstringsearch_tpu.ops import search as S
    from pysubstringsearch_tpu.ops.suffix_array import _pad_len

    rng = np.random.default_rng(0)
    n = 1 << 24
    data = rng.integers(97, 123, size=n, dtype=np.uint8)
    N = _pad_len(n + S.PAD_MARGIN)
    text = np.zeros(N, np.uint8); text[:n] = data
    sa = np.zeros(N, np.int32)
    sa[:n] = rng.permutation(n).astype(np.int32)  # timing only
    table = S.build_bucket_table_host(data, sa[:n])
    steps = S.steps_for_width(int(np.diff(table).max()))
    B = 10000
    pats = [bytes(rng.integers(97, 123, 6, dtype=np.uint8)) for _ in range(B)]
    packed, lengths = S.pack_patterns(pats)
    args = (
        jnp.asarray(text)[None], jnp.asarray([n], jnp.int32),
        jnp.asarray(sa)[None], jnp.asarray(table)[None],
        jnp.asarray(packed), jnp.asarray(lengths),
    )

    def make(k):
        return S.repeated_bucketed_probe_jit(steps, k)

    s = slope_time(make, args)
    print(f'probe[{B} queries, 16MB chunk, steps={steps}]: '
          f'{s * 1e3:.2f} ms -> {B / s / 1e6:.2f} M queries/s')


def bench_sort():
    rng = np.random.default_rng(0)
    for logn in [23, 24, 25]:
        N = 1 << logn
        r1 = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))
        r2 = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))

        def make(k):
            def f(a, b):
                iota = lax.broadcasted_iota(jnp.int32, (N,), 0)
                acc = jnp.int32(0)
                x, y = a, b
                for i in range(k):
                    s1, s2, si = lax.sort(
                        (x, y, iota), num_keys=2, is_stable=False
                    )
                    acc = acc + s1[0] + si[-1]
                    x = jnp.roll(s1, i + 1)
                    y = jnp.roll(s2, -(i + 1))
                return acc
            return jax.jit(f)

        s = slope_time(make, (r1, r2), ks=(1, 4))
        print(f'sort[(r1,r2,idx) 2^{logn}]: {s * 1e3:.1f} ms '
              f'-> {N / s / 1e6:.0f} M elem/s')


def _bench_corpus(mb: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    n = mb << 20
    words = rng.integers(97, 123, size=(1000, 6), dtype=np.uint8)
    idx = rng.integers(0, 1000, size=n // 7 + 1)
    return np.concatenate(
        [np.concatenate([words[i], [10]]) for i in idx]
    )[:n].astype(np.uint8)


def bench_build():
    from pysubstringsearch_tpu.ops.suffix_array import suffix_array_jax

    for mb in [16]:
        data = _bench_corpus(mb)
        for algorithm in ('full', 'segmented'):
            t0 = time.time()
            sa = suffix_array_jax(data, algorithm=algorithm)
            dt = time.time() - t0
            print(f'build[{mb}MB {algorithm}, wall incl transfers]: {dt:.2f}s '
                  f'-> {mb / dt:.1f} MB/s   (sa[0]={sa[0]})')


def bench_sa_device():
    """Device-only SA kernel time via the slope method: full vs segmented."""
    from pysubstringsearch_tpu.ops import suffix_array as SA

    for mb in [16]:
        data = _bench_corpus(mb)
        n = data.size
        N = SA._pad_len(n)
        padded = np.zeros(N, np.uint8)
        padded[:n] = data
        x = jnp.asarray(padded)

        for name, kernel in (
            ('full', SA._doubling_kernel),
            ('segmented', SA._segmented_kernel),
        ):
            def make(k, kernel=kernel):
                def f(xx):
                    acc = jnp.int32(0)
                    for i in range(k):
                        # vary n slightly to defeat CSE across reps
                        sa_full = kernel(xx, jnp.int32(n - i))
                        acc = acc + sa_full[-1] + sa_full[0]
                    return acc
                return jax.jit(f)

            s = slope_time(make, (x,), ks=(1, 3))
            print(f'sa-device[{mb}MB {name}]: {s * 1e3:.1f} ms '
                  f'-> {mb / s:.0f} MB/s')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print(f'backend: {jax.default_backend()}')
    if which in ('probe', 'all'):
        bench_probe()
    if which in ('sort', 'all'):
        bench_sort()
    if which in ('build', 'all'):
        bench_build()
    if which in ('sa', 'all'):
        bench_sa_device()
