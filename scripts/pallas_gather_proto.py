"""Pallas row-gather prototype vs XLA gather (VERDICT round-1 item 3).

microbench4.py established XLA's TPU gather is a flat ~37 ns/row
independent of locality (even a 68 KB window!), i.e. issue-rate bound at
~1.8 GB/s effective -- 400x under HBM bandwidth.  This prototypes a Pallas
kernel that streams per-lane async DMAs (HBM row -> VMEM out block) with a
deep in-flight window, to see if the copy engine can beat the gather unit.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1_500_000
R = 131_072
REPS = 20


def make_pallas_gather(W, TILE, NBUF):
    def kernel(idx_ref, table_ref, out_ref, sem):
        def get(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], out_ref.at[i], sem.at[i % NBUF])

        def body(i, _):
            @pl.when(i >= NBUF)
            def _():
                get(i - NBUF).wait()
            get(i).start()
            return 0

        jax.lax.fori_loop(0, TILE, body, 0, unroll=True)

        def drain(i, _):
            get(TILE - NBUF + i).wait()
            return 0

        jax.lax.fori_loop(0, NBUF, drain, 0, unroll=True)

    @jax.jit
    def gather(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(idx.shape[0] // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((TILE, W), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((idx.shape[0], W), table.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    return gather


def timed_chain(fn, table, gi, iters=3):
    """Carry-chain REPS calls so indices depend on previous output."""

    @jax.jit
    def run(table, i0):
        def step(t, i):
            out = fn(table, (gi + i.sum(dtype=jnp.int32)) % ROWS)
            return (i + out[:, 0].astype(jnp.int32)) % 1_000_000

        return jax.lax.fori_loop(0, REPS, step, i0)

    np.asarray(run(table, gi))   # warm; sync by materialization (the
    t0 = time.perf_counter()     # tunnel's block_until_ready can return
    for _ in range(iters):       # early -- see bench.py timing note)
        np.asarray(run(table, gi))
    return (time.perf_counter() - t0) / iters / REPS


def main():
    rng = np.random.default_rng(1)
    gi = jnp.asarray(rng.integers(0, ROWS, (R,), dtype=np.int32))
    for W in (17, 32):
        table = jnp.asarray(
            rng.integers(0, 2**32, (ROWS, W), dtype=np.uint64)
            .astype(np.uint32))

        dt = timed_chain(jax.jit(lambda t, i: t[i]), table, gi)
        print(f"W={W:2d} XLA gather                  {dt*1e3:7.3f} ms  "
              f"{dt/R*1e9:6.1f} ns/row", flush=True)

        for TILE, NBUF in ((256, 8), (256, 16), (512, 16), (512, 32),
                           (1024, 32)):
            try:
                fn = make_pallas_gather(W, TILE, NBUF)
                dt = timed_chain(fn, table, gi)
                # verify once
                got = np.asarray(fn(table, gi[:TILE * 4]))
                want = np.asarray(table[gi[:TILE * 4]])
                ok = "OK " if (got == want).all() else "BAD"
                print(f"W={W:2d} pallas TILE={TILE:4d} NBUF={NBUF:2d} "
                      f"{ok} {dt*1e3:7.3f} ms  {dt/R*1e9:6.1f} ns/row",
                      flush=True)
            except Exception as e:
                print(f"W={W:2d} pallas TILE={TILE} NBUF={NBUF} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        del table


if __name__ == "__main__":
    main()
