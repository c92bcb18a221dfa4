"""Which pass-2 derive program eats the TTFQ tail?

Pass 1 (text upload + SA doubling) blocks via the poison flag; pass 2
(seed tables, hot-bucket aux, digit packing, limb planes) is enqueued
async and the whole tail lands on the first later barrier
(benchmarks/ttfq_decomp.py measured the tail at ~203 s but attributes it
to one artifact because the stream drains in order).  This script forces
completion after EVERY stage with pre-AOT-compiled checksum programs.

Run: python benchmarks/derive_pass2_decomp.py [idx_path]
"""

import os
import sys
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
    from pysubstringsearch_tpu import container
    from pysubstringsearch_tpu.models.index import DeviceIndex
    from pysubstringsearch_tpu.ops import search as search_ops

    chunks = container.read_chunks(idx_path)
    plan = DeviceIndex.plan(chunks)
    n_pad, depth, bits = plan.n_pad, plan._depth, plan._bits
    base = plan._base
    tlen = base ** depth + 1
    log(f'rows {plan.num_chunks} x pad {n_pad >> 20} MiB, '
        f'base {base}^{depth}')

    def cksum(shape, dtype):
        return jax.jit(
            lambda a: jnp.sum(a, dtype=jnp.int32)
        ).lower(jax.ShapeDtypeStruct(shape, dtype)).compile()

    ck_row_u8 = cksum((n_pad,), jnp.uint8)
    ck_row_i32 = cksum((n_pad,), jnp.int32)
    ck_tab = cksum((tlen,), jnp.int32)
    ck_hot = cksum((tlen - 1,), jnp.int32)

    rank_d = jnp.asarray(plan._rank_host)
    pack0 = search_ops.ranked_pack_jit(bits)
    table_into = search_ops.derive_table_raw_jit(base, depth)
    tables = jnp.zeros((plan.num_chunks, tlen), jnp.int32)

    for i, d in enumerate(plan.row_data[:1]):  # one row tells the story
        row = np.zeros((n_pad,), dtype=np.uint8)
        row[: d.size] = d
        n_i = jnp.int32(d.size)
        t0 = time.time()
        t = jax.device_put(row)
        int(ck_row_u8(t))
        log(f'  h2d-text     +{time.time() - t0:7.2f}s')
        t0 = time.time()
        sa, poisoned = search_ops.derive_sa(t, n_i)
        bool(poisoned)
        int(ck_row_i32(sa))
        log(f'  sa-derive    +{time.time() - t0:7.2f}s')
        t0 = time.time()
        tables = table_into(tables, jnp.int32(i), t, n_i, sa, rank_d)
        int(ck_tab(tables[i]))
        log(f'  table        +{time.time() - t0:7.2f}s')
        t0 = time.time()
        packed0 = pack0(t, n_i, rank_d)
        int(ck_row_i32(packed0))
        log(f'  pack0        +{time.time() - t0:7.2f}s')
        t0 = time.time()
        # (hot-bucket aux removed in round 5)
        int(ck_hot(h_i))
        log(f'  hot-aux      +{time.time() - t0:7.2f}s')
        plane = search_ops.derive_limb_ranked_jit(depth, bits)
        limbs = jnp.zeros((plan.num_chunks, n_pad * plan.num_limbs),
                          jnp.int32)
        ck_limbrow = cksum((n_pad * plan.num_limbs,), jnp.int32)
        for j in range(plan.num_limbs):
            t0 = time.time()
            limbs = plane(limbs, jnp.int32(i), jnp.int32(j), packed0,
                          n_i, sa)
            int(ck_limbrow(limbs[i]))
            log(f'  limb{j}        +{time.time() - t0:7.2f}s')


if __name__ == '__main__':
    main()
