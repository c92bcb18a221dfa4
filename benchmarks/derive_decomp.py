"""Per-stage timing of the derive-mode device load (the TTFQ tail).

DeviceIndex._init_derive dispatches text upload, SA doubling, seed-table,
hot-aux, and limb-plane programs; only the SA derive blocks (poison flag),
so bench 'derive' time hides the async tail in the first probe.  This
script reproduces the derive stage-by-stage with a block_until_ready after
each, against the cached bench container.

Run: python benchmarks/derive_decomp.py [idx_path]
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

    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    idx_path = sys.argv[1] if len(sys.argv) > 1 else \
        '/dev/shm/benchcache/bench-500mb-64chunk/bench.idx'
    from pysubstringsearch_tpu import container
    from pysubstringsearch_tpu.models.index import DeviceIndex
    from pysubstringsearch_tpu.ops import search as search_ops

    t0 = time.time()
    chunks = container.read_chunks(idx_path)
    log(f'parse: {time.time() - t0:.1f}s, {len(chunks)} chunks')

    plan = DeviceIndex.plan(chunks)
    n_pad, depth, bits = plan.n_pad, plan._depth, plan._bits
    base = plan._base
    log(f'geometry: rows {plan.num_chunks} x pad {n_pad >> 20} MiB, '
        f'base {base}^{depth}, bits {bits}, limbs {plan.num_limbs}, '
        f'h_pad {plan.h_pad}, kind {plan.kind}')

    rank_d = jnp.asarray(plan._rank_host)
    stage = {}

    def force(out):
        """block_until_ready through the remote-attach tunnel can return
        before the computation ran (measured); a scalar D2H readback of
        every leaf is the reliable barrier."""
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, 'shape'):
                np.asarray(jax.device_get(
                    leaf if leaf.ndim == 0 else leaf.ravel()[-1:]
                ))
        return out

    def timed(name, fn):
        t0 = time.time()
        out = force(fn())
        dt = time.time() - t0
        stage[name] = stage.get(name, 0.0) + dt
        log(f'  {name:12s} +{dt:7.2f}s')
        return out

    derive_sa = search_ops.derive_sa
    pack0 = search_ops.ranked_pack_jit(bits)
    table_into = search_ops.derive_table_raw_jit(base, depth)
    hot_aux = search_ops.derive_hot_aux_jit(
        search_ops.AUX_TH, plan.h_pad, depth, bits
    )
    plane = search_ops.derive_limb_ranked_jit(depth, bits)
    tlen = base ** depth + 1
    C = plan.num_chunks
    tables = jnp.zeros((C, tlen), jnp.int32)
    limbs = jnp.zeros((C, n_pad * plan.num_limbs), jnp.int32)
    set_row = search_ops.set_row_jit()

    for i, d in enumerate(plan.row_data):
        row = np.zeros((n_pad,), dtype=np.uint8)
        row[: d.size] = d
        n_i = jnp.int32(d.size)
        t = timed('h2d-text', lambda: jnp.asarray(row))
        sa_p = timed('sa-derive', lambda: derive_sa(t, n_i))
        sa = sa_p[0]
        tables = timed('table', lambda: table_into(
            tables, jnp.int32(i), t, n_i, sa, rank_d))
        packed0 = timed('pack0', lambda: pack0(t, n_i, rank_d))
        if plan.h_pad > 0:
            timed('hot-aux', lambda: hot_aux(tables[i], packed0, sa, n_i))
        src = packed0
        for j in range(plan.num_limbs):
            limbs = timed(f'limb{j}', lambda: plane(
                limbs, jnp.int32(i), jnp.int32(j), src, n_i, sa))
    total = sum(stage.values())
    log(f'TOTAL {total:.1f}s')
    for k, v in sorted(stage.items(), key=lambda kv: -kv[1]):
        log(f'  {k:12s} {v:7.2f}s')


if __name__ == '__main__':
    main()
