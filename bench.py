"""Driver benchmark: single-chip mapping throughput (reads/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
BASELINE.json's `published` is empty (reference tree unavailable at survey
time), so vs_baseline is measured against this repo's own NumPy oracle
throughput on the same workload -- the honest available baseline
(BASELINE.md "baseline ladder", stage 1 vs stage 2).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _probe_device(timeout_s: int = 240) -> None:
    """Fail fast (nonzero exit) when the accelerator tunnel is down.

    jax backend init blocks indefinitely on a dead tunnel; probing in a
    killable subprocess turns a silent multi-hour hang into an immediate,
    honest failure."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; import jax.numpy as jnp; "
             "jnp.ones(4).sum().block_until_ready()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        sys.stderr.write("[bench] accelerator unavailable (device probe "
                         f"failed within {timeout_s}s); no metric emitted\n")
        raise SystemExit(3)


def _pause_background_builder() -> None:
    """SIGSTOP running at-scale builders for the bench's duration.

    The at-scale index builders (pidfile /tmp/build_big.pid, one pid per
    line -- several can run in a round) have cache-evicting multi-GB
    working sets; host-side stages measure ~4x slower under that
    contention.  Every pid is verified against /proc/<pid>/cmdline (exact
    process, never a pattern) and resumed at exit."""
    import atexit
    import os
    import signal

    try:
        lines = open("/tmp/build_big.pid").read().split()
    except OSError:
        return
    # "lowmem_bench" (no .py) also matches its python -c build children,
    # whose argv carries the /tmp/lowmem_bench/... output prefix
    builders = (b"build_big.py", b"build_repeat.py", b"build_repeat3g.py",
                b"lowmem_bench")
    for tok in lines:
        try:
            pid = int(tok)
            cmdline = open(f"/proc/{pid}/cmdline", "rb").read()
        except (OSError, ValueError):
            continue
        if not any(b in cmdline for b in builders):
            continue
        os.kill(pid, signal.SIGSTOP)
        atexit.register(lambda p=pid: os.kill(p, signal.SIGCONT))


def main():
    _probe_device()
    _pause_background_builder()
    import jax
    import jax.numpy as jnp

    # persistent compilation cache (verified working through the axon
    # tunnel, round 4): the big-pipeline compile measured 6+ min on a busy
    # compile server; a warm cache makes it seconds on every later run
    from bitmapperbs_tpu.utils.artifacts import artifacts_dir
    jax.config.update("jax_compilation_cache_dir",
                      artifacts_dir() + "/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from bitmapperbs_tpu.config import AlignerConfig
    from bitmapperbs_tpu.index.build import build_index
    from bitmapperbs_tpu.index.device import upload_index
    from bitmapperbs_tpu.models.aligner import map_batch_device
    from bitmapperbs_tpu.models.host import prepare_batch
    from bitmapperbs_tpu.oracle.pipeline import map_batch_se
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads)

    rng = np.random.default_rng(0)
    genome_bp = 10_000_000
    idx = build_index(random_genome_fasta(
        rng, contigs=(genome_bp // 2, genome_bp // 2)))
    dix = upload_index(idx)

    # 16k-read batches: throughput-optimal (PERF.md; aligners stream
    # millions of reads, so the large batch is the realistic regime)
    bucket, batch = 96, 16384
    cfg = AlignerConfig(max_errors=4, indels=True, read_len_bucket=bucket,
                        batch_size=batch)
    sims = simulate_reads(idx.genome, batch, read_len=90, seed=1,
                          sub_rate=0.01, indel_rate=0.005)
    reads = [s.codes for s in sims]
    arr, lengths = prepare_batch(reads, bucket, batch)
    arr_d, len_d = jnp.asarray(arr), jnp.asarray(lengths)

    # compile + warm up (sync by materializing: see timing note below)
    out = map_batch_device(dix, cfg, arr_d, len_d)
    np.asarray(out["best_score"])

    # TIMING METHODOLOGY (round 3): jax.block_until_ready on a *list* of
    # outputs returns early on the current axon tunnel runtime -- the old
    # dispatch-8-identical-batches-and-block loop measured a fake
    # 183M reads/s (~1200x reality).  Two fixes, robust on any runtime:
    # every timed iteration gets a DISTINCT input batch (so no caching
    # layer can elide a repeat), and the sync is np.asarray() of one
    # per-batch output (materialization cannot return early).  Dispatch
    # stays back-to-back, so device compute still overlaps host work
    # exactly like the streaming pipeline in models/host.py.
    iters = 8
    timed_batches = []
    e2e_reads = []   # distinct read lists reused by the e2e section below
    for i in range(iters):
        sims_i = simulate_reads(idx.genome, batch, read_len=90, seed=10 + i,
                                sub_rate=0.01, indel_rate=0.005)
        rl_i = [s.codes for s in sims_i]
        if i < 4:
            e2e_reads.extend(rl_i)
        a_i, l_i = prepare_batch(rl_i, bucket, batch)
        timed_batches.append((jnp.asarray(a_i), jnp.asarray(l_i)))
    t0 = time.perf_counter()
    outs = [map_batch_device(dix, cfg, a_i, l_i)
            for (a_i, l_i) in timed_batches]
    for o in outs:
        np.asarray(o["best_score"])
    dt = (time.perf_counter() - t0) / iters
    device_rps = batch / dt

    # paired-end throughput (stderr; the driver metric line stays SE)
    import sys

    from bitmapperbs_tpu.models.paired import map_batch_pe_device
    from bitmapperbs_tpu.utils.simulate import simulate_pairs

    pe_batch = 4096   # PE pairs (simulation cost); metric line is SE
    pe_cfg = cfg.replace(paired=True, min_insert=0, max_insert=500,
                         batch_size=pe_batch)

    def _pe_args(seed):
        prs = simulate_pairs(idx.genome, pe_batch, read_len=90, seed=seed,
                             sub_rate=0.01, indel_rate=0.005,
                             min_insert=150, max_insert=480)
        a1, l1 = prepare_batch([p[0].codes for p in prs], bucket, pe_batch)
        a2, l2 = prepare_batch([p[1].codes for p in prs], bucket, pe_batch)
        return tuple(jnp.asarray(x) for x in (a1, l1, a2, l2))

    pe_batches = [_pe_args(seed) for seed in (2, 20, 21, 22, 23)]
    out = map_batch_pe_device(dix, pe_cfg, *pe_batches[0])   # warm
    np.asarray(out["pair_sum"])
    t0 = time.perf_counter()
    outs = [map_batch_pe_device(dix, pe_cfg, *a) for a in pe_batches[1:]]
    for o in outs:
        np.asarray(o["pair_sum"])
    pe_rps = 2 * pe_batch / ((time.perf_counter() - t0) / 4)
    sys.stderr.write(f"[bench] paired-end: {pe_rps:.0f} reads/s/chip "
                     f"({pe_rps / 2:.0f} pairs/s)\n")

    # end-to-end throughput: device map + host finalize -> SamRecords
    # (the full production path of models/host.map_batch_tpu, minus disk).
    # Published next to the device rate so the host-bound gap is visible
    # (this VM exposes ONE core; real TPU hosts scale finalize with -t).
    from bitmapperbs_tpu.models.host import map_batch_tpu

    quals = ["I" * len(r) for r in reads]
    qnames = [f"r{i}" for i in range(len(reads))]
    recs = map_batch_tpu(idx, dix, cfg, reads, quals, qnames)  # warm
    # steady state: one call spanning 4 distinct device batches, so the
    # in-flight window (models/host.MAX_INFLIGHT) overlaps device compute
    # with host finalize -- the production streaming shape (round-4 e2e
    # study: single-batch calls serialize device+host and read ~45% low)
    quals4 = ["I" * len(r) for r in e2e_reads]
    qnames4 = [f"e{i}" for i in range(len(e2e_reads))]
    t0 = time.perf_counter()
    recs = map_batch_tpu(idx, dix, cfg, e2e_reads, quals4, qnames4)
    e2e_rps = len(e2e_reads) / (time.perf_counter() - t0)
    n_mapped = sum(1 for r in recs if not r.flag & 0x4)
    sys.stderr.write(f"[bench] end-to-end (map+finalize->records): "
                     f"{e2e_rps:.0f} reads/s/core-limited "
                     f"({n_mapped}/{len(e2e_reads)} mapped)\n")

    # oracle throughput on a subsample (extrapolated)
    n_o = 16
    t0 = time.perf_counter()
    map_batch_se(idx, cfg, reads[:n_o])
    oracle_rps = n_o / (time.perf_counter() - t0)

    # the driver metric line prints BEFORE the at-scale add-on: the 3 Gbp
    # rows recompile in every fresh process (~5 min each; the remote AOT
    # path bypasses the persistent cache -- PERF.md round 5), so a driver
    # timeout there must not cost the metric itself
    print(json.dumps({
        "metric": "reads_per_second_per_chip",
        "value": round(device_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(device_rps / oracle_rps, 2),
    }), flush=True)

    # realistic-genome-scale numbers (stderr; the driver metric line stays
    # the 10 Mbp workload for round-over-round comparability).  Uses the
    # persistent artifact caches when present -- a 100 Mbp or 3.08 Gbp
    # SA-IS build does not fit in a bench run.  The 3 Gbp upload is ~2-3
    # min since round 4 (mmap-direct stitched puts + genome-plane cache,
    # index/device.py), so it is no longer env-gated.
    from bitmapperbs_tpu.index.build import load_index
    from bitmapperbs_tpu.utils.artifacts import find_artifact

    del dix
    # 3 Gbp: prefer the sa_rate-4 artifact (+23% measured, round 4);
    # the repeat-structured artifact is the honest adaptive-seeding class
    # (round 5) -- same contig profile, so its pipeline compile is shared
    big3g = ("idx_3g_r4" if find_artifact("idx_3g_r4") else "idx_3g")
    for name, label in (("idx_100m", "100 Mbp"),
                        (big3g, "3.08 Gbp human-scale"),
                        ("idx_3g_rep_r4", "3.08 Gbp repeat-structured")):
        cache = find_artifact(name)
        if cache is None:
            continue
        try:
            big = load_index(cache)
            dix_b = upload_index(big)
            cfg_b = cfg.replace(batch_size=4096)
            if sum(big.genome.lengths) > 512_000_000:
                # Gbp auto-tune (cli.autotune_for_genome / PERF.md round-3
                # study): adaptive seed extension + Kc128
                cfg_b = cfg_b.replace(seed_ext_max=20, seed_ext_occ=4,
                                      max_candidates=128)
            big_batches = []
            for i in range(5):   # distinct batches (timing note above)
                sims_b = simulate_reads(big.genome, 4096, read_len=90,
                                        seed=3 + i, sub_rate=0.01,
                                        indel_rate=0.005)
                a_b, l_b = prepare_batch([s.codes for s in sims_b], 96, 4096)
                big_batches.append((jnp.asarray(a_b), jnp.asarray(l_b)))
            warm = map_batch_device(dix_b, cfg_b, *big_batches[0])
            np.asarray(warm["best_score"])
            t0 = time.perf_counter()
            outs = [map_batch_device(dix_b, cfg_b, a_b, l_b)
                    for (a_b, l_b) in big_batches[1:]]
            for o in outs:
                np.asarray(o["best_score"])
            rps = 4096 / ((time.perf_counter() - t0) / 4)
            sys.stderr.write(f"[bench] {label} genome "
                             f"({big.nbytes() / 1e9:.2f} GB index): "
                             f"{rps:.0f} reads/s/chip SE\n")
            # paired-end at scale (round-5: the BASELINE metric is SE+PE;
            # bench.py:226-231 was SE-only through round 4 -- VERDICT r4 #2)
            pe_b = 2048
            cfg_pe_b = cfg_b.replace(paired=True, min_insert=0,
                                     max_insert=500, batch_size=pe_b)

            def _pe_args_b(seed):
                prs = simulate_pairs(big.genome, pe_b, read_len=90,
                                     seed=seed, sub_rate=0.01,
                                     indel_rate=0.005, min_insert=150,
                                     max_insert=480)
                a1, l1 = prepare_batch([p[0].codes for p in prs], 96, pe_b)
                a2, l2 = prepare_batch([p[1].codes for p in prs], 96, pe_b)
                return tuple(jnp.asarray(x) for x in (a1, l1, a2, l2))

            pe_bb = [_pe_args_b(seed) for seed in (40, 41, 42, 43)]
            warm_pe = map_batch_pe_device(dix_b, cfg_pe_b, *pe_bb[0])
            np.asarray(warm_pe["pair_sum"])
            t0 = time.perf_counter()
            outs = [map_batch_pe_device(dix_b, cfg_pe_b, *a) for a in pe_bb[1:]]
            for o in outs:
                np.asarray(o["pair_sum"])
            pe_rps_b = 2 * pe_b / ((time.perf_counter() - t0) / 3)
            sys.stderr.write(f"[bench] {label} genome: "
                             f"{pe_rps_b:.0f} reads/s/chip PE "
                             f"({pe_rps_b / 2:.0f} pairs/s)\n")
            # PBAT on the repeat artifact only (the honest 4-frame class;
            # runs LAST so a driver timeout cannot cost earlier rows)
            if name == "idx_3g_rep_r4":
                cfg_nb = cfg_b.replace(non_directional=True,
                                       locate_flat_cap=192, flat_chunks=3)
                nb_batches = []
                for i in range(4):
                    sims_n = simulate_reads(big.genome, 4096, read_len=90,
                                            seed=50 + i, sub_rate=0.01,
                                            indel_rate=0.005,
                                            protocols=("OT", "OB", "CTOT",
                                                       "CTOB"))
                    a_n, l_n = prepare_batch([s.codes for s in sims_n],
                                             96, 4096)
                    nb_batches.append((jnp.asarray(a_n), jnp.asarray(l_n)))
                warm_nb = map_batch_device(dix_b, cfg_nb, *nb_batches[0])
                np.asarray(warm_nb["best_score"])
                t0 = time.perf_counter()
                outs = [map_batch_device(dix_b, cfg_nb, a_n, l_n)
                        for (a_n, l_n) in nb_batches[1:]]
                for o in outs:
                    np.asarray(o["best_score"])
                nb_rps = 4096 / ((time.perf_counter() - t0) / 3)
                sys.stderr.write(f"[bench] {label} genome: "
                                 f"{nb_rps:.0f} reads/s/chip PBAT\n")
            del dix_b, big
        except Exception as err:   # at-scale add-on must never kill the metric
            sys.stderr.write(f"[bench] {label} bench skipped: {err}\n")


if __name__ == "__main__":
    main()
