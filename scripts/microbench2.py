"""Distinguish per-dispatch overhead from per-op cost on the axon TPU."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)

    # dispatch floor: trivial elementwise
    a = jnp.asarray(rng.integers(0, 100, (65536,), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 100, (8192, 64), dtype=np.uint32))
    print(f"x+1 (65536,)    {timed(lambda x: x + 1, a)*1e3:8.2f} ms")
    print(f"x+1 (8192,64)   {timed(lambda x: x + 1, b)*1e3:8.2f} ms")

    table = jnp.asarray(rng.integers(0, 2**32, (1_400_000, 17),
                                     dtype=np.uint32))
    gi = jnp.asarray(rng.integers(0, 1_400_000, (65536,), dtype=np.int32))

    def g1(i):
        return table[i].sum(dtype=jnp.uint32)

    def g2(i):
        r = table[i]
        s = r.sum(dtype=jnp.uint32)
        r2 = table[(i + s.astype(jnp.int32)) % 1_400_000]
        return r2.sum(dtype=jnp.uint32)

    def g4(i):
        acc = jnp.uint32(0)
        for _ in range(4):
            r = table[(i + acc.astype(jnp.int32)) % 1_400_000]
            acc = acc + r.sum(dtype=jnp.uint32)
        return acc

    def g8(i):
        acc = jnp.uint32(0)
        for _ in range(8):
            r = table[(i + acc.astype(jnp.int32)) % 1_400_000]
            acc = acc + r.sum(dtype=jnp.uint32)
        return acc

    t1 = timed(g1, gi)
    t2 = timed(g2, gi)
    t4 = timed(g4, gi)
    t8 = timed(g8, gi)
    print(f"1 chained gather 65k rows w=17   {t1*1e3:8.2f} ms")
    print(f"2 chained gathers                {t2*1e3:8.2f} ms")
    print(f"4 chained gathers                {t4*1e3:8.2f} ms")
    print(f"8 chained gathers                {t8*1e3:8.2f} ms")
    print(f"  marginal per extra gather:     {(t8-t1)/7*1e3:8.2f} ms")

    # 2D-shaped gather: does a (512,128) index shape help?
    gi2 = gi.reshape(512, 128)

    def g2d(i):
        return table[i].sum(dtype=jnp.uint32)

    print(f"gather 2D idx (512,128) w=17     {timed(g2d, gi2)*1e3:8.2f} ms")

    # gather via one-hot matmul? too big. via take with clip mode
    def gtake(i):
        return jnp.take(table, i, axis=0, mode="clip").sum(dtype=jnp.uint32)

    print(f"jnp.take clip 65k w=17           {timed(gtake, gi)*1e3:8.2f} ms")

    # sort inside a fused program: does sort cost persist when chained?
    y = jnp.asarray(rng.integers(0, 2**32, (65536,), dtype=np.uint32))

    def s1(x):
        return jnp.sort(x)[::1000].sum(dtype=jnp.uint32)

    def s2(x):
        a = jnp.sort(x)
        c = jnp.sort(x + a[0])
        return c[::1000].sum(dtype=jnp.uint32)

    ts1, ts2 = timed(s1, y), timed(s2, y)
    print(f"1 sort 65k   {ts1*1e3:8.2f} ms ; 2 sorts {ts2*1e3:8.2f} ms")

    # scatter chained
    src = jnp.asarray(rng.integers(0, 2**32, (524288,), dtype=np.uint32))
    di = jnp.asarray(rng.integers(0, 65536, (524288,), dtype=np.int32))

    def sc1(s, i):
        return jnp.zeros(65537, jnp.uint32).at[i].set(s, mode="drop").sum(dtype=jnp.uint32)

    def sc2(s, i):
        a = jnp.zeros(65537, jnp.uint32).at[i].set(s, mode="drop")
        b = jnp.zeros(65537, jnp.uint32).at[
            (i + a[0].astype(jnp.int32)) % 65536].set(s, mode="drop")
        return b.sum(dtype=jnp.uint32)

    t1, t2 = timed(sc1, src, di), timed(sc2, src, di)
    print(f"1 scatter 524k {t1*1e3:8.2f} ms ; 2 scatters {t2*1e3:8.2f} ms")

    # smaller scatter
    src2, di2 = src[:65536], di[:65536]

    def sc_small(s, i):
        return jnp.zeros(65537, jnp.uint32).at[i].set(s, mode="drop").sum(dtype=jnp.uint32)

    print(f"scatter 65k->65k  {timed(sc_small, src2, di2)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
