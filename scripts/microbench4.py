"""Gather locality/duplication microbench (round 2, VERDICT item 3).

Question: does XLA's TPU row gather get cheaper when many indices repeat
(e.g. point at row 0) or concentrate in a small window?  If yes, the
backward-search step can fetch the ep-endpoint row only when it differs
from the sp row (same 448-bp checkpoint block), replacing ~half the
seeding gather traffic with duplicate-index fetches.

Uses the carry-chained pattern from microbench3: each gather's indices
depend on the previous gather's data, so XLA cannot batch, hoist, or fold
the repetitions (independent gathers were measured "free" -- the compiler
overlaps or eliminates them).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

ROWS = 1_500_000        # ~102 MB at 17 u32/row (100 Mbp scale)
W = 17
R = 131_072
REPS = 30


def timed(step, init, iters=3):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, REPS, step, c0)

    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(init)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / REPS


def main():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.integers(0, 2**32, (ROWS, W), dtype=np.uint64)
                        .astype(np.uint32))
    gi = jnp.asarray(rng.integers(0, ROWS, (R,), dtype=np.int32))

    def bench(make_idx, label):
        def step(t, i):
            idx = make_idx((gi + i.sum(dtype=jnp.int32)) % ROWS)
            r = table[idx]
            return (i + r[:, 0].astype(jnp.int32)) % 1_000_000

        dt = timed(step, gi)
        print(f"{label:44s} {dt*1e3:7.3f} ms  {dt/R*1e9:6.1f} ns/row",
              flush=True)

    bench(lambda idx: idx, "uniform random")
    mask50 = jnp.asarray(np.random.default_rng(2).random(R) < 0.5)
    mask85 = jnp.asarray(np.random.default_rng(2).random(R) < 0.85)
    bench(lambda idx: jnp.where(mask50, 0, idx), "50% duplicated at row 0")
    bench(lambda idx: jnp.where(mask85, 0, idx), "85% duplicated at row 0")
    bench(lambda idx: jnp.zeros_like(idx), "all row 0")
    bench(lambda idx: idx % 1024, "uniform in 1024-row window (68 KB)")
    bench(lambda idx: idx % 16384, "uniform in 16384-row window (1 MB)")
    bench(lambda idx: jnp.repeat(idx[:R // 2], 2),
          "adjacent-duplicate pairs, same R")
    bench(lambda idx: idx[:R // 2], "half lanes (R/2 uniform)")


if __name__ == "__main__":
    main()
