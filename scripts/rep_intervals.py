"""Recover the planted-repeat intervals of the idx_1g_rep genome by replay.

plant_repeats' interval recording consumes no rng draws (verified in
tests/test_simulate_repeats.py), so re-running build_repeat's exact
generation sequence with record= reproduces the checkpointed genome
bit-for-bit AND yields every planted interval.  The replay is verified
against the ckpt_1g_rep_codes.bin memmap before anything is written.

Output: artifacts/rep_intervals.npz with the DISJOINT union of planted
intervals in genome text coordinates (starts/ends int64, sorted), plus the
raw per-kind intervals.  occupancy_study.py --intervals consumes it to
condition true-locus survival on repeat membership.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bitmapperbs_tpu.index.build import CONTIG_PAD
from bitmapperbs_tpu.utils.artifacts import artifacts_dir
from bitmapperbs_tpu.utils.simulate import plant_repeats

CONTIG_LEN = 257_500_000   # must match scripts/build_repeat.py
N_CONTIGS = 4
SEED = 11
KINDS = {"dispersed": 0, "line": 1, "tandem": 2, "segdup": 3}


def merge(starts: np.ndarray, ends: np.ndarray):
    """Overlapping intervals -> disjoint sorted union."""
    order = np.argsort(starts, kind="stable")
    s, e = starts[order], ends[order]
    out_s, out_e = [], []
    cs, ce = int(s[0]), int(e[0])
    for i in range(1, len(s)):
        if s[i] <= ce:
            ce = max(ce, int(e[i]))
        else:
            out_s.append(cs)
            out_e.append(ce)
            cs, ce = int(s[i]), int(e[i])
    out_s.append(cs)
    out_e.append(ce)
    return np.asarray(out_s, dtype=np.int64), np.asarray(out_e, dtype=np.int64)


def main() -> None:
    d = artifacts_dir()
    cpath = os.path.join(d, "ckpt_1g_rep_codes.bin")
    with open(os.path.join(d, "ckpt_1g_rep_genome.json")) as f:
        meta = json.load(f)
    ref = np.memmap(cpath, dtype=np.uint8, mode="r")

    rng = np.random.default_rng(SEED)
    gc = 0.42
    p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    starts, ends, kinds = [], [], []
    for i in range(N_CONTIGS):
        codes = rng.choice(4, size=CONTIG_LEN, p=p).astype(np.uint8)
        rec: list = []
        plant_repeats(rng, codes, record=rec)
        off = int(meta["offsets"][i])
        chk = ref[off:off + CONTIG_LEN]
        # full compare is one linear pass over 257 MB -- cheap vs a wrong map
        if not np.array_equal(codes, chk):
            raise SystemExit(f"replay mismatch on contig {i + 1}: the "
                             "generator changed; intervals would be wrong")
        for (s, e, k) in rec:
            starts.append(off + s)
            ends.append(off + e)
            kinds.append(KINDS[k])
        print(f"contig {i + 1}: replay verified, {len(rec)} intervals",
              flush=True)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    kinds = np.asarray(kinds, dtype=np.int8)
    u_s, u_e = merge(starts, ends)
    frac = (u_e - u_s).sum() / (N_CONTIGS * CONTIG_LEN)
    out = os.path.join(d, "rep_intervals.npz")
    np.savez(out, starts=starts, ends=ends, kinds=kinds,
             union_starts=u_s, union_ends=u_e)
    print(f"saved {out}: {len(starts)} intervals, union covers "
          f"{frac:.3f} of the genome")


if __name__ == "__main__":
    main()
