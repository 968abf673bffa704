"""Rebuild the at-scale index caches (/tmp/idx_100m, /tmp/idx_3g*).

The driver VM's /tmp is wiped between sessions; bench.py's at-scale stderr
lines and scripts/human_bench.py both need these artifacts.  This script is
the single reproducible builder:

  1. 100 Mbp, 2x50 Mbp contigs, seed 7  -> /tmp/idx_100m
     (same recipe as scripts/crossdiff.py so the caches are interchangeable)
  2. 3.08 Gbp, 24 GRCh38-length contigs, seed 3:
     one SA-IS pass per block (the expensive part, ~1.5-2 h/block on one
     core), then BOTH sampling rates packed from the same suffix array:
       sa_rate 8 -> /tmp/idx_3g     (~9.5 GB, the proven-upload artifact)
       sa_rate 4 -> /tmp/idx_3g_r4  (~12.6 GB, half the locate LF steps)

Run detached:  nohup nice -n 19 python scripts/build_big.py > /tmp/build3g.log 2>&1 &
A `<prefix>.done` marker is written after each artifact is fully serialized.
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.index.build import (BSIndex, INDEX_VERSION, CONTIG_PAD,
                                         build_block, build_index,
                                         default_klt_k, parse_fasta,
                                         save_index)
from bitmapperbs_tpu.index import sais
from bitmapperbs_tpu.utils import dna
from bitmapperbs_tpu.utils.simulate import random_genome_fasta

T0 = time.time()

# GRCh38 chr1..22,X,Y assembly lengths (public constants) -- a human-scale
# contig profile for the random genome; sum = 3.088 Gbp.
GRCH38_LENGTHS = (
    248956422, 242193529, 198295559, 190214555, 181538259, 170805979,
    159345973, 145138636, 138394717, 133797422, 135086622, 133275309,
    114364328, 107043718, 101991189, 90338345, 83257441, 80373285,
    58617616, 64444167, 46709983, 50818468, 156040895, 57227415,
)


def log(msg: str) -> None:
    print(f"[{time.time() - T0:8.0f}s] {msg}", flush=True)


def mark_done(prefix: str) -> None:
    with open(prefix + ".done", "w") as f:
        f.write("ok\n")


def build_100m() -> None:
    prefix = "/tmp/idx_100m"
    if os.path.exists(prefix + ".json"):
        log(f"{prefix} already present; skipping")
        mark_done(prefix)
        return
    rng = np.random.default_rng(7)
    log("100 Mbp: generating genome")
    fa = random_genome_fasta(rng, contigs=(50_000_000, 50_000_000))
    log("100 Mbp: building index (SA-IS both blocks)")
    idx = build_index(fa, build_mode="sais")
    save_index(idx, prefix)
    mark_done(prefix)
    log(f"100 Mbp: saved {prefix} ({idx.nbytes() / 1e9:.2f} GB)")


def build_3g() -> None:
    if os.path.exists("/tmp/idx_3g.done") and os.path.exists(
            "/tmp/idx_3g_r4.done"):
        log("3.08 Gbp artifacts already present; skipping")
        return
    rng = np.random.default_rng(3)
    log("3.08 Gbp: generating 24-contig genome")
    fa = random_genome_fasta(rng, contigs=GRCH38_LENGTHS)
    log("3.08 Gbp: parsing")
    genome = parse_fasta(fa)
    del fa
    log(f"3.08 Gbp: {sum(genome.lengths) / 1e9:.3f} Gbp, "
        f"{len(genome.lengths)} contigs; converting")
    ct_fwd = dna.ct_convert(genome.codes)
    ct_rc = dna.ct_convert(dna.revcomp(genome.codes))
    klt_k = default_klt_k(len(genome.codes) + 1)
    sha = hashlib.sha256(genome.codes.tobytes()).hexdigest()

    blocks = {4: [], 8: []}
    for name, conv in (("fwd", ct_fwd), ("rc", ct_rc)):
        text = np.concatenate([np.ascontiguousarray(conv, dtype=np.uint8),
                               np.zeros(1, dtype=np.uint8)])
        t0 = time.time()
        log(f"3.08 Gbp: SA-IS on block {name} (n={len(text)})")
        sa = sais.suffix_array(text)
        log(f"3.08 Gbp: SA-IS {name} done in {time.time() - t0:.0f}s")
        del text
        for rate in (8, 4):
            t0 = time.time()
            blk = build_block(conv, sa=sa, sa_rate=rate, klt_k=klt_k)
            blocks[rate].append(blk)
            log(f"3.08 Gbp: packed block {name} sa_rate={rate} "
                f"in {time.time() - t0:.0f}s")
        del sa

    for rate, prefix in ((8, "/tmp/idx_3g"), (4, "/tmp/idx_3g_r4")):
        meta = {
            "version": INDEX_VERSION,
            "genome_sha256": sha,
            "cp_block": K.CP_BLOCK,
            "sa_sample_rate": rate,
            "klt_k": klt_k,
            "contig_pad": CONTIG_PAD,
        }
        idx = BSIndex(genome=genome, blocks=blocks[rate], meta=meta)
        save_index(idx, prefix)
        mark_done(prefix)
        log(f"3.08 Gbp: saved {prefix} ({idx.nbytes() / 1e9:.2f} GB)")


def main() -> None:
    # pidfile lets bench.py SIGSTOP this exact builder during its timed
    # sections (the SA-IS working set evicts every cache and host-side
    # numbers drop ~4x under contention -- PERF.md round 3)
    with open("/tmp/build_big.pid", "w") as f:
        f.write(str(os.getpid()))
    build_100m()
    build_3g()
    log("all artifacts built")


if __name__ == "__main__":
    main()
