"""Oracle end-to-end pipeline tests on simulated reads (SURVEY.md section 4).

Ground truth = simulator coordinates; these tests freeze the behavioral spec
the device pipeline must reproduce.
"""
import numpy as np
import pytest

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.oracle import align
from bitmapperbs_tpu.oracle.pipeline import map_batch_se
from bitmapperbs_tpu.utils import dna
from bitmapperbs_tpu.utils.simulate import random_genome_fasta, simulate_reads


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(7)
    return build_index(random_genome_fasta(rng, contigs=(3000, 2000)))


def _check_truth(idx, recs, sims, allow_miss=0):
    missed = 0
    for rec, sim in zip(recs, sims):
        if rec.flag & K.FLAG_UNMAPPED:
            missed += 1
            continue
        assert rec.rname == idx.genome.names[sim.contig], rec
        assert rec.pos - 1 == sim.coord, (rec, sim.strand, sim.coord)
        want_rev = sim.strand in ("OB", "CTOT")
        assert bool(rec.flag & K.FLAG_REVERSE) == want_rev, (rec, sim.strand)
    assert missed <= allow_miss, f"{missed} unmapped"


def test_clean_directional_reads_map_exactly(idx):
    sims = simulate_reads(idx.genome, 60, read_len=80, seed=1, sub_rate=0.0)
    cfg = AlignerConfig(max_errors=3, indels=False)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims],
                        [s.qual for s in sims])
    _check_truth(idx, recs, sims)
    for rec in recs:
        assert rec.cigar == "80M"
        assert rec.nm == 0
        assert rec.md == "80"
        assert rec.mapq == K.MAPQ_MAX
        assert (rec.xr, rec.xg) in (("CT", "CT"), ("CT", "GA"))


def test_reads_with_substitutions(idx):
    sims = simulate_reads(idx.genome, 60, read_len=80, seed=2, sub_rate=0.02)
    cfg = AlignerConfig(max_errors=4, indels=False)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims],
                        [s.qual for s in sims])
    _check_truth(idx, recs, sims, allow_miss=2)
    for rec, sim in zip(recs, sims):
        if not rec.flag & K.FLAG_UNMAPPED:
            # NM never exceeds budget; subs that hit a converted C may vanish
            assert rec.nm <= 4


def test_reads_with_indels(idx):
    sims = simulate_reads(idx.genome, 50, read_len=80, seed=3,
                          sub_rate=0.003, indel_rate=0.01)
    cfg = AlignerConfig(max_errors=4, indels=True)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims],
                        [s.qual for s in sims])
    n_mapped = n_correct = 0
    for rec, sim in zip(recs, sims):
        if rec.flag & K.FLAG_UNMAPPED:
            continue
        n_mapped += 1
        if rec.rname == idx.genome.names[sim.contig] and \
                abs(rec.pos - 1 - sim.coord) <= 4:
            n_correct += 1
    assert n_mapped >= 45
    assert n_correct == n_mapped


def test_pbat_protocols_need_non_directional(idx):
    sims = simulate_reads(idx.genome, 40, read_len=80, seed=4, sub_rate=0.0,
                          protocols=("CTOT", "CTOB"))
    reads = [s.codes for s in sims]
    cfg_d = AlignerConfig(max_errors=2, indels=False, non_directional=False)
    cfg_nd = cfg_d.replace(non_directional=True)
    recs_d = map_batch_se(idx, cfg_d, reads)
    recs_nd = map_batch_se(idx, cfg_nd, reads)
    # directional mode leaves most PBAT reads unmapped; ND mode maps them
    unmapped_d = sum(bool(r.flag & K.FLAG_UNMAPPED) for r in recs_d)
    assert unmapped_d >= 35
    _check_truth(idx, recs_nd, sims)
    tags = {(r.xr, r.xg) for r in recs_nd if not r.flag & K.FLAG_UNMAPPED}
    assert tags <= {("GA", "CT"), ("GA", "GA")}
    assert len(tags) == 2


def test_methylation_xm_tag(idx):
    sims = simulate_reads(idx.genome, 30, read_len=60, seed=5, sub_rate=0.0,
                          meth_rate=1.0)  # fully methylated: no conversion
    cfg = AlignerConfig(max_errors=2, indels=False)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims])
    for rec in recs:
        assert not any(c in rec.xm for c in "zxhu")   # nothing unmethylated
        # every cytosine position on the XG strand is called methylated
        ref_c = "G" if rec.xg == "GA" else "C"
        n_meth = sum(rec.xm.count(c) for c in "ZXHU")
        assert n_meth == rec.seq.count(ref_c)


def test_methylation_context_calls(idx):
    """XM context letters agree with the genome context (Bismark semantics)."""
    from bitmapperbs_tpu import constants as K2
    sims = simulate_reads(idx.genome, 25, read_len=60, seed=8, sub_rate=0.0,
                          meth_rate=0.5)
    cfg = AlignerConfig(max_errors=2, indels=False)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims])
    g = idx.genome.codes
    for rec in recs:
        if rec.flag & K2.FLAG_UNMAPPED:
            continue
        ci = idx.genome.names.index(rec.rname)
        start = int(idx.genome.offsets[ci]) + rec.pos - 1
        ga = rec.xg == "GA"
        for k, ch in enumerate(rec.xm):
            if ch == ".":
                continue
            q = start + k
            if not ga:
                assert g[q] == K2.C
                want = ("z" if g[q + 1] == K2.G
                        else "x" if g[q + 2] == K2.G else "h")
            else:
                assert g[q] == K2.G
                want = ("z" if g[q - 1] == K2.C
                        else "x" if g[q - 2] == K2.C else "h")
            assert ch.lower() == want, (rec.qname, k, ch, want)


def test_mapq_spec_values():
    """Pin the round-5 CALIBRATED gap table (constants.py: measured
    wrong-call rates on repeat genomes, scripts/mapq_calibration.py).
    Oracle and device share this one table, so golden differentials alone
    would not catch an accidental edit to it."""
    from bitmapperbs_tpu.constants import mapq_from_gap

    assert mapq_from_gap(2, 2) == 0        # tie = ambiguous
    assert mapq_from_gap(1, 2) == 10       # gap 1 -> phred ~11 measured
    assert mapq_from_gap(1, 3) == 20       # gap 2 -> phred ~17-21
    assert mapq_from_gap(0, 3) == 30       # gap 3
    assert mapq_from_gap(0, 4) == 42       # gap >= 4 -> cap
    assert mapq_from_gap(0, None) == 42    # no second-best -> cap


def test_ambiguous_repeat_gets_mapq0():
    rng = np.random.default_rng(11)
    unit = dna.decode(rng.choice(4, size=300).astype(np.uint8))
    fasta = f">chrR\n{unit}{unit}\n"     # exact 300bp tandem repeat
    idx2 = build_index(fasta)
    read = np.asarray(dna.encode(unit[50:130]))
    read[read == K.C] = K.T
    cfg = AlignerConfig(max_errors=2, indels=False)
    recs = map_batch_se(idx2, cfg, [read])
    assert recs[0].mapq == 0
    assert not recs[0].flag & K.FLAG_UNMAPPED
    cfg2 = cfg.replace(report_ambiguous=False)
    recs2 = map_batch_se(idx2, cfg2, [read])
    assert recs2[0].flag & K.FLAG_UNMAPPED


def test_determinism(idx):
    sims = simulate_reads(idx.genome, 25, read_len=80, seed=6, sub_rate=0.01)
    cfg = AlignerConfig(max_errors=3, indels=True)
    reads = [s.codes for s in sims]
    a = [r.line() for r in map_batch_se(idx, cfg, reads)]
    b = [r.line() for r in map_batch_se(idx, cfg, reads)]
    assert a == b


def test_traceback_md_nm_roundtrip(rng):
    """MD+CIGAR reconstruct the reference; NM == asym mismatch count."""
    for _ in range(20):
        ref = rng.integers(0, 4, size=40).astype(np.uint8)
        read = ref.copy()
        read[read == K.C] = np.where(rng.random((read == K.C).sum()) < 0.5,
                                     K.T, K.C)
        for _ in range(2):
            i = int(rng.integers(0, 40))
            read[i] = (read[i] + 1) % 4
        dist, ref_start, cigar = align.traceback(ref, read)
        md, nm, xm = align.cigar_md_nm(ref, read, ref_start, cigar)
        assert nm <= dist + 2
        assert len(xm) == len(read)
        span = align.cigar_ref_span(cigar)
        assert ref_start + span <= len(ref)


def test_bulk_simulator_reads_map_correctly():
    """Vectorized bulk simulator produces reads that map to their truth
    positions under the oracle (validates its strand/conversion math)."""
    import numpy as np
    from bitmapperbs_tpu import constants as K
    from bitmapperbs_tpu.config import AlignerConfig
    from bitmapperbs_tpu.index.build import build_index
    from bitmapperbs_tpu.oracle.pipeline import map_read_se
    from bitmapperbs_tpu.utils import dna
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads_bulk)

    rng = np.random.default_rng(33)
    idx = build_index(random_genome_fasta(rng, contigs=(6000,)))
    rc_ref = dna.revcomp(idx.genome.codes)
    cfg = AlignerConfig(max_errors=3, indels=True, read_len_bucket=64)
    protos = ("OT", "OB", "CTOT", "CTOB")
    codes, ci, coord, si = simulate_reads_bulk(
        idx.genome, 40, read_len=60, seed=9, sub_rate=0.01, protocols=protos)
    cfg = cfg.replace(non_directional=True)
    correct = 0
    for i in range(len(codes)):
        best, _, _ = map_read_se(idx, rc_ref, cfg, codes[i])
        if best is None:
            continue
        true_fwd = int(idx.genome.offsets[ci[i]]) + int(coord[i])
        correct += abs(best.fwd_anchor - true_fwd) <= cfg.max_errors
    assert correct >= 36


def test_edit_matrix_matches_naive(rng):
    """The row-vectorized prefix-min DP is bit-identical to the naive
    three-way recurrence (the frozen spec definition)."""
    from bitmapperbs_tpu.oracle.align import asym_match, edit_matrix

    def naive(window, read):
        m, w = len(read), len(window)
        match = asym_match(window[None, :], read[:, None])
        D = np.zeros((m + 1, w + 1), dtype=np.int32)
        D[:, 0] = np.arange(m + 1)
        for i in range(1, m + 1):
            for j in range(1, w + 1):
                D[i, j] = min(
                    D[i - 1, j - 1] + (0 if match[i - 1, j - 1] else 1),
                    D[i - 1, j] + 1,
                    D[i, j - 1] + 1)
        return D

    for _ in range(40):
        m = int(rng.integers(1, 40))
        w = int(rng.integers(1, 56))
        read = rng.integers(0, 5, m).astype(np.uint8)
        window = rng.integers(0, 5, w).astype(np.uint8)
        np.testing.assert_array_equal(edit_matrix(window, read),
                                      naive(window, read))
