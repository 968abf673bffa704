"""Amortized op costs: repeat each op inside one jitted fori_loop so the
~29ms axon sync round-trip is paid once, not per measurement."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 50


def timed_loop(step, init, iters=3):
    """Time REPS executions of `step` (carry-chained) inside one jit."""

    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, REPS, step, c0)

    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(init)
        jax.block_until_ready(out)
    total = (time.perf_counter() - t0) / iters
    return total / REPS


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, (1_400_000, 17),
                                     dtype=np.uint32))
    tab1 = table[:, 0].copy()

    for n in (8192, 32768, 65536, 262144, 1048576):
        gi = jnp.asarray(rng.integers(0, 1_400_000, (n,), dtype=np.int32))

        def step_w17(t, i):
            r = table[(gi + i.sum(dtype=jnp.int32)) % 1_400_000]
            return (i + r[:, 0].astype(jnp.int32)) % 1_000_000

        def step_w1(t, i):
            r = tab1[(gi + i.sum(dtype=jnp.int32)) % 1_400_000]
            return (i + r.astype(jnp.int32)) % 1_000_000

        t17 = timed_loop(step_w17, gi)
        t1 = timed_loop(step_w1, gi)
        print(f"gather n={n:>8}: w=17 {t17*1e3:7.3f} ms ({t17/n*1e9:6.1f} ns/row)"
              f"   w=1 {t1*1e3:7.3f} ms ({t1/n*1e9:6.1f} ns/row)")

    # rowwise sort (8192, 64)
    x = jnp.asarray(rng.integers(0, 2**32, (8192, 64), dtype=np.uint32))

    def step_sort(t, c):
        return jnp.sort(c + t.astype(jnp.uint32), axis=-1)

    print(f"rowwise sort (8192,64): {timed_loop(step_sort, x)*1e3:7.3f} ms")

    # flat sort 65536
    y = jnp.asarray(rng.integers(0, 2**32, (65536,), dtype=np.uint32))

    def step_fsort(t, c):
        return jnp.sort(c + t.astype(jnp.uint32))

    print(f"flat sort 65536:        {timed_loop(step_fsort, y)*1e3:7.3f} ms")

    # 2-key flat sort 65536
    y2 = jnp.asarray(rng.integers(0, 2**32, (65536,), dtype=np.uint32))

    def step_lex(t, c):
        a, b = jax.lax.sort((c[0] + t.astype(jnp.uint32), c[1]), num_keys=2)
        return jnp.stack([a, b])

    print(f"lex2 sort 65536:        "
          f"{timed_loop(step_lex, jnp.stack([y, y2]))*1e3:7.3f} ms")

    # scatter 524288 -> 65536
    src = jnp.asarray(rng.integers(0, 2**32, (524288,), dtype=np.uint32))
    di = jnp.asarray(rng.integers(0, 65536, (524288,), dtype=np.int32))

    def step_scat(t, c):
        out = jnp.zeros(65537, jnp.uint32).at[
            (di + t) % 65536].set(src, mode="drop")
        return c + out[:524288 // 8].repeat(8)[:524288]

    print(f"scatter 524k->65k:      {timed_loop(step_scat, src)*1e3:7.3f} ms")

    def step_scat_small(t, c):
        out = jnp.zeros(65537, jnp.uint32).at[
            (di[:65536] + t) % 65536].set(src[:65536], mode="drop")
        return c + out[:65536]

    print(f"scatter 65k->65k:       "
          f"{timed_loop(step_scat_small, src[:65536])*1e3:7.3f} ms")

    # cumsum 524288
    cs = jnp.asarray(rng.integers(0, 3, (524288,), dtype=np.int32))

    def step_cum(t, c):
        return jnp.cumsum(c + t) % 7

    print(f"cumsum 524k:            {timed_loop(step_cum, cs)*1e3:7.3f} ms")

    def step_cum2(t, c):
        return jnp.cumsum(c + t, axis=-1) % 7

    cs2 = cs.reshape(8192, 64)
    print(f"cumsum (8192,64) rows:  {timed_loop(step_cum2, cs2)*1e3:7.3f} ms")

    # popcount throughput (VPU op over big array)
    p = jnp.asarray(rng.integers(0, 2**32, (4096, 2048), dtype=np.uint32))

    def step_pop(t, c):
        return c ^ jax.lax.population_count(c + t.astype(jnp.uint32))

    tp = timed_loop(step_pop, p)
    print(f"popcount 8M u32:        {tp*1e3:7.3f} ms "
          f"({p.size/tp/1e9:5.1f} G u32/s)")


if __name__ == "__main__":
    main()
