"""Simulated-WGBS read generator with ground truth (SURVEY.md section 4:
simulated reads with known positions are the de-facto oracle for accuracy).

Simulates: fragment sampling from contigs, per-cytosine methylation,
bisulfite conversion, sequencing errors (substitutions and optional indels),
all four strand protocols, and paired-end fragments.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.index.build import Genome
from bitmapperbs_tpu.utils import dna


@dataclasses.dataclass
class SimRead:
    codes: np.ndarray        # as-sequenced read codes
    qual: str
    contig: int
    coord: int               # 0-based true leftmost fwd coordinate
    strand: str              # OT / OB / CTOT / CTOB
    n_subs: int
    n_indels: int

    @property
    def is_reverse(self) -> bool:
        return self.strand in ("OB", "CTOT")


def _bisulfite(fragment: np.ndarray, rng, meth_rate: float) -> np.ndarray:
    """C -> T unless methylated (in the fragment's own strand space)."""
    out = fragment.copy()
    cs = np.flatnonzero(out == K.C)
    unmeth = cs[rng.random(len(cs)) >= meth_rate]
    out[unmeth] = K.T
    return out


def _add_errors(read: np.ndarray, rng, sub_rate: float, indel_rate: float):
    out = read.copy()
    subs = np.flatnonzero(rng.random(len(out)) < sub_rate)
    for i in subs:
        out[i] = (out[i] + rng.integers(1, 4)) % 4
    n_ind = 0
    if indel_rate > 0:
        lst = list(out)
        i = 0
        while i < len(lst):
            r = rng.random()
            if r < indel_rate / 2 and len(lst) > 20:
                del lst[i]
                n_ind += 1
            elif r < indel_rate and len(lst) > 0:
                lst.insert(i, int(rng.integers(0, 4)))
                n_ind += 1
                i += 2
            else:
                i += 1
        out = np.array(lst, dtype=np.uint8)
    return out, len(subs), n_ind


def simulate_reads(genome: Genome, n: int, read_len: int = 100, *,
                   seed: int = 0, meth_rate: float = 0.3,
                   sub_rate: float = 0.005, indel_rate: float = 0.0,
                   protocols=("OT", "OB")) -> list[SimRead]:
    """Directional default (OT/OB); pass all four protocols for PBAT-style."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ci = int(rng.integers(0, len(genome.names)))
        clen = int(genome.lengths[ci])
        if clen < read_len + 2:
            continue
        coord = int(rng.integers(0, clen - read_len))
        start = int(genome.offsets[ci]) + coord
        frag = genome.codes[start:start + read_len]
        strand = protocols[int(rng.integers(0, len(protocols)))]
        if strand == "OT":
            r = _bisulfite(frag, rng, meth_rate)
        elif strand == "OB":
            r = _bisulfite(dna.revcomp(frag), rng, meth_rate)
        elif strand == "CTOT":
            r = dna.revcomp(_bisulfite(frag, rng, meth_rate))
        else:  # CTOB
            r = dna.revcomp(_bisulfite(dna.revcomp(frag), rng, meth_rate))
        r, n_subs, n_ind = _add_errors(r, rng, sub_rate, indel_rate)
        qual = "I" * len(r)
        out.append(SimRead(codes=r, qual=qual, contig=ci, coord=coord,
                           strand=strand, n_subs=n_subs, n_indels=n_ind))
    return out


def simulate_pairs(genome: Genome, n: int, read_len: int = 100, *,
                   seed: int = 0, min_insert: int = 150, max_insert: int = 500,
                   meth_rate: float = 0.3, sub_rate: float = 0.005,
                   indel_rate: float = 0.0):
    """FR paired-end fragments: R1 from the fragment 5' end (OT or OB),
    R2 from the opposite strand's 5' end.  Returns list of (SimRead, SimRead)
    with true coordinates for both mates."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ci = int(rng.integers(0, len(genome.names)))
        clen = int(genome.lengths[ci])
        insert = int(rng.integers(min_insert, max_insert + 1))
        if clen < insert + 2:
            continue
        coord = int(rng.integers(0, clen - insert))
        start = int(genome.offsets[ci]) + coord
        frag = genome.codes[start:start + insert]
        from_ot = bool(rng.integers(0, 2))
        # bisulfite-convert the whole fragment on its originating strand
        if from_ot:
            conv = _bisulfite(frag, rng, meth_rate)
            r1, s1 = conv[:read_len], "OT"
            r2, s2 = dna.revcomp(conv)[:read_len], "CTOT"
            c1, c2 = coord, coord + insert - read_len
        else:
            conv = _bisulfite(dna.revcomp(frag), rng, meth_rate)
            r1, s1 = conv[:read_len], "OB"
            r2, s2 = dna.revcomp(conv)[:read_len], "CTOB"
            c1, c2 = coord + insert - read_len, coord
        pair = []
        for r, s, c in ((r1, s1, c1), (r2, s2, c2)):
            r, n_subs, n_ind = _add_errors(r, rng, sub_rate, indel_rate)
            pair.append(SimRead(codes=r, qual="I" * len(r), contig=ci,
                                coord=c, strand=s, n_subs=n_subs,
                                n_indels=n_ind))
        out.append((pair[0], pair[1]))
    return out


def simulate_reads_bulk(genome: Genome, n: int, read_len: int = 100, *,
                        seed: int = 0, meth_rate: float = 0.3,
                        sub_rate: float = 0.005,
                        protocols=("OT", "OB")):
    """Vectorized bulk simulator (no indels): ~100x the per-read generator.

    For sustained-throughput runs that need millions of reads.  Returns
    (codes uint8[n, read_len], contig int32[n], coord int64[n],
    strand_idx int8[n] indexing `protocols`).
    """
    rng = np.random.default_rng(seed)
    eligible = np.flatnonzero(genome.lengths >= read_len + 2)
    ci = eligible[rng.integers(0, len(eligible), n)]
    coord = rng.integers(0, genome.lengths[ci] - read_len)
    start = genome.offsets[ci] + coord
    frag = genome.codes[start[:, None] + np.arange(read_len)]
    si = rng.integers(0, len(protocols), n).astype(np.int8)

    out = np.empty((n, read_len), dtype=np.uint8)
    for k, proto in enumerate(protocols):
        sel = si == k
        f = frag[sel]
        if proto in ("OB", "CTOB"):
            f = 3 - f[:, ::-1]
            f[frag[sel][:, ::-1] == K.N_CODE] = K.N_CODE
        conv = f.copy()
        cs = conv == K.C
        conv[cs & (rng.random(conv.shape) >= meth_rate)] = K.T
        if proto in ("CTOT", "CTOB"):
            rcv = 3 - conv[:, ::-1]
            rcv[conv[:, ::-1] == K.N_CODE] = K.N_CODE
            conv = rcv
        out[sel] = conv
    subs = rng.random(out.shape) < sub_rate
    out[subs] = (out[subs] + rng.integers(1, 4, int(subs.sum()))) % 4
    return out, ci.astype(np.int32), coord.astype(np.int64), si


def random_genome_fasta(rng, contigs=(2000, 1500), gc: float = 0.42) -> str:
    """Random FASTA text for tests (vectorized; fine for 10^7+ bp)."""
    p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    parts = []
    for i, ln in enumerate(contigs):
        codes = rng.choice(4, size=ln, p=p).astype(np.uint8)
        chars = np.frombuffer(b"ACGT", dtype=np.uint8)[codes]
        width = 70
        nrows = -(-ln // width)
        rows = np.full((nrows, width + 1), ord("\n"), dtype=np.uint8)
        pad = nrows * width - ln
        flat = np.concatenate([chars, np.full(pad, ord("\n"), np.uint8)])
        rows[:, :width] = flat.reshape(nrows, width)
        body = rows.tobytes().decode().rstrip("\n")
        parts.append(f">chr{i + 1}\n{body}\n")
    return "".join(parts)
