"""Time-to-first-query decomposition with honest barriers.

On the remote-attach platform, ``block_until_ready`` can return before
transfers/compute have run, so each stage is forced with a pre-AOT-compiled
checksum program (compiled from ShapeDtypeStructs before the load so the
compile cost never pollutes the stage being measured).

Stages: container parse -> DeviceIndex derive dispatch (blocking part) ->
forced completion of each derive artifact (text/sa/tables/limbs/aux) ->
first probe dispatch per class -> first probe result readback.

Run: python benchmarks/ttfq_decomp.py [idx_path]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    idx_path = sys.argv[1] if len(sys.argv) > 1 else \
        '/dev/shm/benchcache/bench-500mb-64chunk/bench.idx'
    import pysubstringsearch_tpu as pss
    from pysubstringsearch_tpu.models.index import DeviceIndex
    from pysubstringsearch_tpu.ops import search as search_ops
    from pysubstringsearch_tpu.ops.search import pack_patterns

    t0 = time.time()
    r = pss.Reader(idx_path)
    parse_s = time.time() - t0
    log(f'parse: {parse_s:.1f}s')

    plan = DeviceIndex.plan(r._chunks)
    C, n_pad = plan.num_chunks, plan.n_pad
    tlen = plan._base ** plan._depth + 1

    # AOT checksum programs per artifact shape (compiled BEFORE the load).
    def cksum(shape, dtype):
        return jax.jit(
            lambda a: jnp.sum(a, dtype=jnp.int32)
        ).lower(jax.ShapeDtypeStruct(shape, dtype)).compile()

    t0 = time.time()
    sums = {
        'text': cksum((C, n_pad), jnp.uint8),
        'sa': cksum((C, n_pad), jnp.int32),
        'tables': cksum((C, tlen), jnp.int32),
        'limbs': cksum((C, n_pad * plan.num_limbs), jnp.int32),
    }
    log(f'checksum programs ready: {time.time() - t0:.1f}s')

    # Bench batch + AOT probe warm on a thread (mirrors bench.py).
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    import bench

    corpus, _ = bench.make_corpus(int(os.environ.get('BENCH_MB', '500')))
    rng = np.random.default_rng(1)
    nq = int(os.environ.get('BENCH_QUERIES', '10000'))
    offs = rng.integers(0, len(corpus) - 16, size=nq)
    lens = rng.integers(4, 13, size=nq)
    pats = [corpus[o: o + l].replace(b'\n', b'x')
            for o, l in zip(offs, lens)]
    del corpus
    packed, lengths = pack_patterns(pats)
    keys = plan.probe_class_keys(lengths)
    warm_s = {}

    def warm():
        tw = time.time()
        search_ops.warm_phased_classes(keys)
        warm_s['s'] = time.time() - tw

    th = threading.Thread(target=warm, daemon=True)
    th.start()

    t0 = time.time()
    idx = r._index
    load_s = time.time() - t0
    th.join()
    log(f'derive dispatch (blocking part): {load_s:.1f}s, '
        f'probe AOT warm {warm_s.get("s", 0):.1f}s')

    for name, exe in sums.items():
        arr = getattr(idx, name)
        t0 = time.time()
        v = int(exe(arr))
        log(f'  force {name:8s} {time.time() - t0:7.2f}s (cksum {v})')

    t0 = time.time()
    parts = idx.probe_device_parts(packed, lengths)
    dispatch_s = time.time() - t0
    t0 = time.time()
    checksum = int(parts[-1][2][0, 0]) + int(parts[-1][1][0, 0])
    readback_s = time.time() - t0
    log(f'first probe: dispatch {dispatch_s:.2f}s, result readback '
        f'{readback_s:.2f}s (checksum {checksum})')
    t0 = time.time()
    parts = idx.probe_device_parts(packed, lengths)
    int(parts[-1][2][0, 0])
    log(f'second probe: {time.time() - t0:.2f}s')


if __name__ == '__main__':
    main()
