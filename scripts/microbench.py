"""Micro-benchmarks of the XLA primitives the pipeline leans on (TPU).

Informs the optimization design: gather cost vs row width, sort strategies
(XLA variadic sort vs hand-rolled bitonic network), scatter cost, and
gather cost vs lane count.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bitonic_sort(x):
    """Ascending bitonic sort along the last axis (power-of-2 width)."""
    n = x.shape[-1]
    assert n & (n - 1) == 0
    idx = np.arange(n)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            partner = idx ^ j
            up = ((idx & k) == 0)
            take_min = np.where(partner > idx, up, ~up)
            px = jnp.take(x, jnp.asarray(partner), axis=-1)
            lo = jnp.minimum(x, px)
            hi = jnp.maximum(x, px)
            x = jnp.where(jnp.asarray(take_min), lo, hi)
            j //= 2
        k *= 2
    return x


def main():
    rng = np.random.default_rng(0)

    # sort (8192, 64) u32
    x = jnp.asarray(rng.integers(0, 2**32, (8192, 64), dtype=np.uint32))
    print(f"jnp.sort (8192,64) u32       {timed(jnp.sort, x)*1e3:8.2f} ms")
    print(f"bitonic  (8192,64) u32       {timed(bitonic_sort, x)*1e3:8.2f} ms")
    bad = int(jnp.sum(bitonic_sort(x) != jnp.sort(x)))
    print(f"  bitonic parity errors: {bad}")

    # flat sort 65536 u32 and 2-key lexicographic lax.sort
    y = jnp.asarray(rng.integers(0, 2**32, (65536,), dtype=np.uint32))
    y2 = jnp.asarray(rng.integers(0, 2**32, (65536,), dtype=np.uint32))
    print(f"jnp.sort 65536 u32           {timed(jnp.sort, y)*1e3:8.2f} ms")

    def lex2(a, b):
        return jax.lax.sort((a, b), num_keys=2)

    print(f"lax.sort 2-key 65536         {timed(lex2, y, y2)*1e3:8.2f} ms")
    yb = y.reshape(1, -1)
    print(f"bitonic 65536 flat           {timed(bitonic_sort, yb)*1e3:8.2f} ms")

    # scatter 524288 -> 65536
    src = jnp.asarray(rng.integers(0, 2**32, (524288,), dtype=np.uint32))
    dst_idx = jnp.asarray(rng.integers(0, 65536, (524288,), dtype=np.int32))

    def scat(src, di):
        return jnp.zeros(65537, jnp.uint32).at[di].set(src, mode="drop")

    print(f"scatter 524k->65k            {timed(scat, src, dst_idx)*1e3:8.2f} ms")

    def scat_min(src, di):
        return jnp.full(4097, 0xFFFFFFFF, jnp.uint32).at[di % 4096].min(src)

    print(f"scatter-min 524k->4k         {timed(scat_min, src, dst_idx)*1e3:8.2f} ms")

    sm_src = src[:65536]
    sm_idx = dst_idx[:65536]
    print(f"scatter-min 65k->4k          {timed(scat_min, sm_src, sm_idx)*1e3:8.2f} ms")

    # gather: rows of width 1, 4, 17 u32 from a 1.3M-row table
    for width in (1, 4, 17):
        table = jnp.asarray(
            rng.integers(0, 2**32, (1_400_000, width), dtype=np.uint32))
        for n in (65536, 262144, 1048576):
            gi = jnp.asarray(rng.integers(0, 1_400_000, (n,), dtype=np.int32))

            def gath(t, i):
                return t[i]

            print(f"gather {n:>8} rows w={width:<3}      "
                  f"{timed(gath, table, gi)*1e3:8.2f} ms")

    # cumsum 524288 i32
    c = jnp.asarray(rng.integers(0, 3, (524288,), dtype=np.int32))
    print(f"cumsum 524k                  {timed(jnp.cumsum, c)*1e3:8.2f} ms")

    # searchsorted 65536 in 65536
    s = jnp.sort(y)

    def ss(s, q):
        return jnp.searchsorted(s, q)

    print(f"searchsorted 65k/65k         {timed(ss, s, y2)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
