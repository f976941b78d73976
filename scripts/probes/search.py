"""On-chip microbench: compile + run cost of act-scale search variants.

Isolates one production-size activation tensor (256x32x32x128 = 33.5M) and
times: exact candidate scoring, histogram search (sort-based), the raw sort,
and a scatter-add histogram — to direct the scale-init graph design.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1 - t0:.2f}s, run {t2 - t1:.3f}s",
          flush=True)


def main():
    from eda_dm_tpu.quant import search

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256 * 32 * 32 * 128,))
    side = jnp.asarray(search.ONE_SIDE_NO, jnp.int32)

    timed("exact 1d search",
          jax.jit(lambda a: search.search_range_1d(a, 256, side)), x)
    timed("hist 1d search",
          jax.jit(lambda a: search.search_range_1d_hist(a, 256, side)), x)
    timed("sort only", jax.jit(jnp.sort), x)
    timed("minmax only", jax.jit(lambda a: (jnp.min(a), jnp.max(a))), x)

    def scatter_hist(a):
        lo, hi = jnp.min(a), jnp.max(a)
        bw = jnp.maximum((hi - lo) / 4096, 1e-8)
        idx = jnp.clip(((a - lo) / bw).astype(jnp.int32), 0, 4095)
        return jnp.zeros((4096,), jnp.float32).at[idx].add(1.0), lo, hi

    timed("scatter hist", jax.jit(scatter_hist), x)

    def searchsorted_hist(a):
        lo, hi = jnp.min(a), jnp.max(a)
        xs = jnp.sort(a)
        edges = lo + (hi - lo) * jnp.arange(4097, dtype=a.dtype) / 4096
        return jnp.diff(jnp.searchsorted(xs, edges)), lo, hi

    timed("sort+searchsorted hist", jax.jit(searchsorted_hist), x)


if __name__ == "__main__":
    main()
