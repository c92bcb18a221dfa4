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
        f'kind {plan.kind}')

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
    plane = search_ops.derive_limb_ranked_jit(depth, bits)
    tlen = base ** depth + 1
    C = plan.num_chunks
    set_row = search_ops.set_row_jit()

    # Mirror _init_derive's HBM pass discipline exactly: the stacked limb
    # planes (4 * num_limbs * n_pad per row) are NOT allocated until every
    # row's SA-build scratch has come and gone — allocating them up front
    # OOMs the 16 GB chip at 2 x 272 Mi rows (measured: this script's
    # previous shape died in pass 1).
    texts = jnp.zeros((C, n_pad), jnp.uint8)
    sas = jnp.zeros((C, n_pad), jnp.int32)
    for i, d in enumerate(plan.row_data):
        row = np.zeros((n_pad,), dtype=np.uint8)
        row[: d.size] = d
        n_i = jnp.int32(d.size)
        t = timed('h2d-text', lambda: jnp.asarray(row))
        texts = set_row(texts, jnp.int32(i), t)
        sa_p = timed('sa-derive', lambda: derive_sa(t, n_i))
        sas = set_row(sas, jnp.int32(i), sa_p[0])
        del t, sa_p
    tables = jnp.zeros((C, tlen), jnp.int32)
    for i, d in enumerate(plan.row_data):
        n_i = jnp.int32(d.size)
        tables = timed('table', lambda: table_into(
            tables, jnp.int32(i), texts[i], n_i, sas[i], rank_d))
    packed = []
    for i, d in enumerate(plan.row_data):
        n_i = jnp.int32(d.size)
        packed0 = timed('pack0', lambda: pack0(texts[i], n_i, rank_d))
        del packed0
    limbs = jnp.zeros((C, n_pad * plan.num_limbs), jnp.int32)
    for i, d in enumerate(plan.row_data):
        n_i = jnp.int32(d.size)
        src = timed('pack0', lambda: pack0(texts[i], n_i, rank_d))
        for j in range(plan.num_limbs):
            limbs = timed(f'limb{j}', lambda: plane(
                limbs, jnp.int32(i), jnp.int32(j), src, n_i, sas[i]))
        del src
    total = sum(stage.values())
    log(f'TOTAL {total:.1f}s')
    for k, v in sorted(stage.items(), key=lambda kv: -kv[1]):
        log(f'  {k:12s} {v:7.2f}s')


if __name__ == '__main__':
    main()
