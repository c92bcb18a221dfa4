"""lax.sort vs a Pallas radix building block, measured (SURVEY §7 step 4).

The candidate "speed-of-light" replacement for the doubling build's
``lax.sort`` is an LSD radix sort.  Its irreducible core is the scatter
pass: every element stored to a data-dependent destination.  This bench
measures, on the real chip:

1. ``lax.sort`` (2-key, int32) at 16/64 Mi — the incumbent.
2. XLA scatter (``.at[idx].set``) of N int32 to random destinations — the
   radix pass expressed as XLA.
3. A Pallas kernel doing the same per-element scatter from VMEM tiles into
   an HBM-resident output via dynamic stores — the radix pass expressed as
   a hand kernel (grid over tiles; destinations precomputed, so this is a
   pure store-throughput measurement, generous to radix).

A 4-pass byte radix needs 4x the winner's scatter time plus histogram +
scan; if even ONE pass costs more than the whole comparator sort, the
radix path is refuted with data.  Results are recorded in ARCHITECTURE.md
("Why not a Pallas radix sort").

Run: python benchmarks/pallas_sort_bench.py [log2n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(out):
    """Force completion observably: a one-element D2H readback.  On this
    remote-attach runtime ``block_until_ready`` can return before device
    completion, so timings must end on a readback (see microbench.py)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def slope(fn, reps=4):
    """Warm wall-clock per call via the dispatch-slope method (bench.py):
    the constant readback transport cancels between the 1-rep and K-rep
    timings; calls on one stream serialize, so forcing the last forces all."""
    force(fn())

    def run_k(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn()
        force(o)
        return time.time() - t0

    run_k(reps + 1)  # steady-state
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(3))
    return max((tk - t1) / reps, 1e-9)


TILE = 8192


def pallas_scatter(values, dests):
    """Per-element scatter values[i] -> out[dests[i]], tile-at-a-time.

    Each grid step loads a TILE of (value, dest) into VMEM and issues TILE
    dynamic single-element stores into a VMEM-resident output block — the
    inner loop of a radix-sort distribution pass, measured at a size whose
    output fits VMEM (stores to HBM/ANY refs are rejected by Mosaic; a real
    HBM-sized pass would additionally pay per-element async copies, so the
    VMEM number would be a LOWER bound on the radix pass's cost).

    In practice (pallas_sort_results.json, measured on the v5e chip) Mosaic
    rejects even this VMEM variant — scalar dynamic stores to a VMEM ref do
    not lower — so the except branch below recording the rejection is the
    EXPECTED outcome and the extrapolated lower-bound log line never runs.
    The committed result file's 'error' field is that Mosaic message; no
    measured scatter number was ever produced on hardware.
    """
    n = values.shape[0]

    def kernel(v_ref, d_ref, out_ref):
        def body(i, _):
            out_ref[d_ref[i]] = v_ref[i]
            return 0

        lax.fori_loop(0, TILE, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(values, dests)


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << log2n
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    vals = jnp.asarray(np.arange(n, dtype=np.int32))
    dests = jnp.asarray(rng.permutation(n).astype(np.int32))

    sort2 = jax.jit(lambda k, v: lax.sort((k, v), num_keys=1))
    t = slope(lambda: sort2(keys, vals))
    log(f'lax.sort 2-op {n >> 20} Mi: {t * 1e3:.1f} ms '
        f'({n / t / 1e6:.0f} M elem/s)')

    xla_scatter = jax.jit(
        lambda v, d: jnp.zeros((n,), jnp.int32).at[d].set(v)
    )
    t = slope(lambda: xla_scatter(vals, dests))
    log(f'XLA scatter {n >> 20} Mi: {t * 1e3:.1f} ms '
        f'({n / t / 1e6:.0f} M elem/s)')

    # Pallas at a VMEM-fitting size (1 Mi int32 out = 4 MB); per-element
    # cost extrapolates linearly and only grows for an HBM-sized pass.
    pn = 1 << 20
    pvals = vals[:pn]
    pdests = jnp.asarray(rng.permutation(pn).astype(np.int32))
    try:
        pk = jax.jit(pallas_scatter)
        t = slope(lambda: pk(pvals, pdests))
        log(f'Pallas per-element scatter {pn >> 20} Mi (VMEM-resident): '
            f'{t * 1e3:.1f} ms ({pn / t / 1e6:.0f} M elem/s; '
            f'x{n // pn} -> {t * (n // pn) * 1e3:.0f} ms per {n >> 20} Mi pass)')
    except Exception as e:  # Mosaic rejections count as a result here
        log(f'Pallas per-element scatter: FAILED TO LOWER: {type(e).__name__}: {e}')


if __name__ == '__main__':
    main()
