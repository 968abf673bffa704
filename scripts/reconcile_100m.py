"""Reconcile the 100 Mbp throughput numbers (VERDICT r4 #8).

Four different 100 Mbp figures exist in the docs (36.5k, 48.9k, 50.6k,
49.9k) with no pinned config distinguishing them.  This measures the
idx_100m artifact at explicitly pinned configs in ONE session with the
bench.py methodology (distinct input batches, materialization sync,
builder SIGSTOPped), so every future 100 Mbp figure can cite one row.

Run: python scripts/reconcile_100m.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _pause_builders():
    # reuse bench.py's exact pause logic (repo root is on sys.path)
    import bench
    bench._pause_background_builder()


def main():
    _pause_builders()
    import jax
    import jax.numpy as jnp

    from bitmapperbs_tpu.utils.artifacts import artifacts_dir, find_artifact
    jax.config.update("jax_compilation_cache_dir",
                      artifacts_dir() + "/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from bitmapperbs_tpu.config import AlignerConfig
    from bitmapperbs_tpu.index.build import load_index
    from bitmapperbs_tpu.index.device import upload_index
    from bitmapperbs_tpu.models.aligner import map_batch_device
    from bitmapperbs_tpu.models.host import prepare_batch
    from bitmapperbs_tpu.utils.simulate import simulate_reads_bulk

    cache = find_artifact("idx_100m")
    if cache is None:
        sys.exit("no idx_100m artifact")
    idx = load_index(cache)
    dix = upload_index(idx)
    sa_rate = idx.blocks[0].sa_rate
    print(f"idx_100m: sa_rate={sa_rate} klt_k={idx.blocks[0].klt_k} "
          f"{idx.nbytes() / 1e9:.2f} GB", flush=True)

    from bitmapperbs_tpu.utils.simulate import simulate_reads

    def run(batch, label, indel=0.005, iters=6, **cfg_kw):
        cfg = AlignerConfig(max_errors=4, indels=True, read_len_bucket=96,
                            batch_size=batch, **cfg_kw)
        timed = []
        for i in range(iters):
            sims = simulate_reads(idx.genome, batch, read_len=90,
                                  seed=300 + i, sub_rate=0.01,
                                  indel_rate=indel)
            a, ln = prepare_batch([s.codes for s in sims], 96, batch)
            timed.append((jnp.asarray(a), jnp.asarray(ln)))
        out = map_batch_device(dix, cfg, *timed[0])
        np.asarray(out["best_score"])   # warm + compile
        t0 = time.perf_counter()
        outs = [map_batch_device(dix, cfg, a, l) for (a, l) in timed]
        for o in outs:
            np.asarray(o["best_score"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {batch / dt:.0f} reads/s/chip ({dt * 1e3:.1f} ms) "
              f"[batch={batch} indel_sim={indel} {cfg_kw or 'defaults'} "
              f"sa_rate={sa_rate}]", flush=True)

    # the bench.py at-scale row config (BENCH_r04's 48.9k setup)
    run(4096, "100M SE b=4096")
    run(16384, "100M SE b=16384")
    run(4096, "100M SE b=4096 sub-only", indel=0.0)


if __name__ == "__main__":
    main()
