"""Batched finalizer vs the per-read spec (oracle/pipeline.finalize_hit):
records must be byte-identical, including MD/XM/flags and rejections."""
import numpy as np
import pytest

from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.models.finalize import finalize_batch
from bitmapperbs_tpu.oracle.pipeline import finalize_hit, map_read_se
from bitmapperbs_tpu.utils import dna
from bitmapperbs_tpu.utils.simulate import random_genome_fasta, simulate_reads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    idx = build_index(random_genome_fasta(rng, contigs=(4000, 1500)))
    return idx, dna.revcomp(idx.genome.codes)


@pytest.mark.parametrize("nd,indels", [(False, True), (True, True),
                                       (False, False)])
def test_batch_matches_per_read(setup, rng, nd, indels):
    idx, rc_ref = setup
    cfg = AlignerConfig(max_errors=4, indels=indels, non_directional=nd,
                        read_len_bucket=96)
    protos = ("OT", "OB", "CTOT", "CTOB") if nd else ("OT", "OB")
    sims = simulate_reads(idx.genome, 80, read_len=80, seed=41,
                          sub_rate=0.03, indel_rate=0.01 if indels else 0.0,
                          protocols=protos)
    for s, cut in zip(sims, rng.integers(55, 81, len(sims))):
        s.codes = s.codes[:cut]
        s.qual = s.qual[:cut]
    reads = [s.codes for s in sims]
    quals = [s.qual for s in sims]
    qnames = [f"r{i}" for i in range(len(sims))]
    hits = [map_read_se(idx, rc_ref, cfg, np.asarray(r))[:2] for r in reads]

    got = finalize_batch(idx, rc_ref, cfg, reads, quals, qnames, hits)
    n_mapped = 0
    for i, (best, second) in enumerate(hits):
        want = None
        if best is not None:
            want = finalize_hit(idx, rc_ref, cfg, np.asarray(reads[i]),
                                quals[i], qnames[i], best, second)
        if want is None:
            assert got[i] is None, (i, got[i])
        else:
            n_mapped += 1
            assert got[i] is not None, i
            assert got[i].line() == want.line(), (
                i, "\n" + got[i].line() + "\n" + want.line())
    assert n_mapped > 50


def test_batch_indel_heavy_lockstep_traceback(setup, rng):
    """Stress the lockstep batched backtrace (models/finalize.py slow path):
    multi-indel reads, gaps near read ends, tie-prone windows.  Every record
    must byte-match the per-read spec walk (oracle/align.traceback)."""
    idx, rc_ref = setup
    cfg = AlignerConfig(max_errors=4, indels=True, read_len_bucket=96)
    sims = simulate_reads(idx.genome, 150, read_len=85, seed=97,
                          sub_rate=0.02, indel_rate=0.05)
    for s, cut in zip(sims, rng.integers(55, 86, len(sims))):
        s.codes = s.codes[:cut]
        s.qual = s.qual[:cut]
    reads = [s.codes for s in sims]
    quals = [s.qual for s in sims]
    qnames = [f"g{i}" for i in range(len(sims))]
    hits = [map_read_se(idx, rc_ref, cfg, np.asarray(r))[:2] for r in reads]

    got = finalize_batch(idx, rc_ref, cfg, reads, quals, qnames, hits)
    n_gapped = 0
    for i, (best, second) in enumerate(hits):
        want = None
        if best is not None:
            want = finalize_hit(idx, rc_ref, cfg, np.asarray(reads[i]),
                                quals[i], qnames[i], best, second)
        if want is None:
            assert got[i] is None, (i, got[i])
        else:
            assert got[i] is not None, i
            assert got[i].line() == want.line(), (
                i, "\n" + got[i].line() + "\n" + want.line())
            if got[i].cigar != f"{len(reads[i])}M":
                n_gapped += 1
    assert n_gapped > 20   # the slow path must actually be exercised


def test_batch_near_contig_edges(setup):
    """Reads at pad boundaries exercise context N-fill and rejection."""
    idx, rc_ref = setup
    cfg = AlignerConfig(max_errors=2, indels=True, read_len_bucket=64)
    reads, hits = [], []
    for coord in (0, 1, int(idx.genome.lengths[0]) - 50):
        start = int(idx.genome.offsets[0]) + coord
        frag = idx.genome.codes[start:start + 50]
        read = np.where(frag == 1, 3, frag).astype(np.uint8)  # OT converted
        reads.append(read)
        best, second, _ = map_read_se(idx, rc_ref, cfg, read)
        hits.append((best, second))
    quals = [""] * len(reads)
    qnames = [f"e{i}" for i in range(len(reads))]
    got = finalize_batch(idx, rc_ref, cfg, reads, quals, qnames, hits)
    for i, (best, second) in enumerate(hits):
        want = None
        if best is not None:
            want = finalize_hit(idx, rc_ref, cfg, reads[i], quals[i],
                                qnames[i], best, second)
        if want is None:
            assert got[i] is None
        else:
            assert got[i].line() == want.line()


def test_banded_dp_tandem_repeat_ties(setup):
    """Adversarial tie-break stress for the banded slow-path DP.

    Tandem-repeat windows (periods 1-8) put equal-scoring shifted
    alignments at many diagonals; the banded DP must still reproduce the
    full-matrix end-column choice and traceback tie-breaks byte-for-byte.
    """
    import numpy as np

    from bitmapperbs_tpu import constants as K
    from bitmapperbs_tpu.config import AlignerConfig
    from bitmapperbs_tpu.index.build import build_index
    from bitmapperbs_tpu.models.finalize import finalize_batch
    from bitmapperbs_tpu.oracle import align as A
    from bitmapperbs_tpu.oracle.pipeline import Hit, finalize_hit
    from bitmapperbs_tpu.utils import dna

    rng = np.random.default_rng(99)
    parts = []
    for period in (1, 2, 3, 4, 5, 6, 8):
        unit = rng.integers(0, 4, period)
        parts.append(np.tile(unit, 1500 // period + 1)[:1500])
        parts.append(rng.integers(0, 4, 100))
    codes = np.concatenate(parts).astype(np.uint8)
    fa = ">chr1\n" + "".join("ACGT"[c] for c in codes) + "\n"
    idx = build_index(fa)
    rc_ref = dna.revcomp(idx.genome.codes)
    cfg = AlignerConfig(max_errors=4, indels=True, read_len_bucket=96)
    e = cfg.max_errors
    L = idx.genome.length

    reads, quals, qnames, hits = [], [], [], []
    for t in range(800):
        m = int(rng.integers(40, 91))
        pos = int(rng.integers(260, L - 300))
        r = list(idx.genome.codes[pos:pos + m])
        for _ in range(int(rng.integers(0, 4))):
            k = int(rng.integers(0, len(r)))
            op = rng.integers(0, 3)
            if op == 0:
                r[k] = int(rng.integers(0, 4))
            elif op == 1 and len(r) > 30:
                del r[k]
            else:
                r.insert(k, int(rng.integers(0, 4)))
        r = np.array(r[:96], np.uint8)
        if (r == K.N_CODE).any() or len(r) < 30:
            continue
        rr = dna.ct_convert(r)
        sc = A.edit_distance(idx.genome.codes[pos - e: pos + len(r) + e], rr)
        if sc > e:
            continue
        reads.append(rr)
        quals.append("I" * len(rr))
        qnames.append(f"t{t}")
        hits.append((Hit(sc, pos, K.BLOCK_FWD, K.PAT_CT, pos), None))
    assert len(reads) > 150
    got = finalize_batch(idx, rc_ref, cfg, reads, quals, qnames, hits)
    n_gapped = 0
    for i in range(len(reads)):
        ref = finalize_hit(idx, rc_ref, cfg, np.asarray(reads[i], np.uint8),
                           quals[i], qnames[i], hits[i][0], hits[i][1])
        a = None if got[i] is None else got[i].line()
        b = None if ref is None else ref.line()
        assert a == b, (i, a, b)
        if a and ("I" in got[i].cigar or "D" in got[i].cigar):
            n_gapped += 1
    assert n_gapped > 50
