"""Gather locality experiment at the 3 Gbp checkpoint-table shape
(VERDICT r4 #5a: PERF.md's model says 8-30 ns/row DEPENDING ON LOCALITY;
nobody ever measured whether locality-sorting the rows recovers it).

Three variants over an HBM-resident (48M, 17) u32 table (3.3 GB -- the
exact stacked cp_rows shape of the 3.08 Gbp index):
  random  -- rows in arrival order (the pipeline today)
  sorted  -- rows pre-sorted (locality ceiling; not deployable as-is)
  s+g+u   -- argsort rows, gather, invert the permutation (the deployable
             transform; its sort/scatter overhead is included in the time)

Methodology: microbench3 harness (REPS inside one jit, carry-dependent
row sets so nothing can be elided, block on the single carry output).
Run on the real chip: python scripts/gather_locality.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30
NROWS = 48_000_000          # 2 blocks x 24M rows (3 Gbp at CP_BLOCK=256)
W = 17


def timed_loop(step, init, table, iters=3):
    # table is an ARGUMENT, not a closure: a 3.3 GB captured constant
    # bloats lowering and duplicates HBM
    @jax.jit
    def run(tab, c0):
        return jax.lax.fori_loop(0, REPS, lambda t, c: step(tab, t, c), c0)

    out = run(table, init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(table, init)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / REPS


def main():
    rng = np.random.default_rng(0)
    print(f"allocating ({NROWS}, {W}) u32 table "
          f"({NROWS * W * 4 / 1e9:.2f} GB) in HBM", flush=True)
    # build on-device (host->device of 3.3 GB through the tunnel is slow)
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (NROWS, W), 0, 2**31 - 1,
                               dtype=jnp.int32).astype(jnp.uint32)
    jax.block_until_ready(table)

    for n in (65_536, 262_144, 1_048_576):
        gi = jnp.asarray(rng.integers(0, NROWS, (n,), dtype=np.int32))
        gi_sorted = jnp.sort(gi)

        def mix(i):
            # carry-dependent shift; mod keeps sortedness as 2 runs
            return jnp.abs(gi + i.sum(dtype=jnp.int32)) % NROWS

        def mix_sorted(i):
            return jnp.abs(gi_sorted + i.sum(dtype=jnp.int32)) % NROWS

        def step_random(tab, t, i):
            r = tab[mix(i)]
            return (i + r[:, 0].astype(jnp.int32)) % 1_000_000

        def step_sorted(tab, t, i):
            r = tab[mix_sorted(i)]
            return (i + r[:, 0].astype(jnp.int32)) % 1_000_000

        def step_sgu(tab, t, i):
            rows = mix(i)
            order = jnp.argsort(rows)
            r = tab[rows[order]]
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(n, dtype=order.dtype))
            r = r[inv]   # back to arrival order
            return (i + r[:, 0].astype(jnp.int32)) % 1_000_000

        tr = timed_loop(step_random, gi, table)
        ts = timed_loop(step_sorted, gi, table)
        tg = timed_loop(step_sgu, gi, table)
        print(f"n={n:>8}: random {tr*1e3:7.3f} ms ({tr/n*1e9:5.1f} ns/row)"
              f"  sorted {ts*1e3:7.3f} ms ({ts/n*1e9:5.1f} ns/row)"
              f"  sort+gather+unsort {tg*1e3:7.3f} ms ({tg/n*1e9:5.1f} ns/row)",
              flush=True)


if __name__ == "__main__":
    main()
