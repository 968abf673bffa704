"""Paired-end oracle tests (SURVEY.md call stack 3.3, BASELINE config 3)."""
import numpy as np
import pytest

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.oracle.paired import map_batch_pe
from bitmapperbs_tpu.utils.simulate import random_genome_fasta, simulate_pairs


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(17)
    return build_index(random_genome_fasta(rng, contigs=(6000, 3000)))


def cfg_pe(**kw):
    base = dict(max_errors=3, indels=False, paired=True,
                min_insert=120, max_insert=400)
    base.update(kw)
    return AlignerConfig(**base)


def test_proper_pairs_map_to_truth(idx):
    pairs = simulate_pairs(idx.genome, 40, read_len=80, seed=2,
                           min_insert=150, max_insert=350, sub_rate=0.005)
    cfg = cfg_pe()
    recs = map_batch_pe(idx, cfg, [(a.codes, b.codes) for a, b in pairs])
    assert len(recs) == 2 * len(pairs)
    n_proper = 0
    for k, (s1, s2) in enumerate(pairs):
        r1, r2 = recs[2 * k], recs[2 * k + 1]
        for r, s in ((r1, s1), (r2, s2)):
            assert r.flag & K.FLAG_PAIRED
            if r.flag & K.FLAG_UNMAPPED:
                continue
            assert r.rname == idx.genome.names[s.contig]
            assert r.pos - 1 == s.coord, (r, s.strand, s.coord)
        if r1.flag & r2.flag & K.FLAG_PROPER:
            n_proper += 1
            assert r1.rnext == "=" and r2.rnext == "="
            assert r1.pnext == r2.pos and r2.pnext == r1.pos
            assert r1.tlen == -r2.tlen and abs(r1.tlen) >= 120
            assert (r1.flag & K.FLAG_REVERSE == 0) != (r2.flag & K.FLAG_REVERSE == 0)
            assert r1.flag & K.FLAG_READ1 and r2.flag & K.FLAG_READ2
    assert n_proper >= 38


def test_mate_rescue_recovers_bad_mate(idx):
    pairs = simulate_pairs(idx.genome, 20, read_len=80, seed=3,
                           min_insert=150, max_insert=350, sub_rate=0.0)
    rng = np.random.default_rng(0)
    mangled = []
    for s1, s2 in pairs:
        r2 = s2.codes.copy()
        # destroy every seed of mate 2 (one substitution per seed slice)
        # but keep total errors within budget of a rescue scan at e=3... use 3
        for j in (5, 30, 60):
            r2[j] = (r2[j] + 1 + rng.integers(0, 3)) % 4
        mangled.append((s1.codes, r2))
    cfg = cfg_pe(max_errors=3)
    # seeds = 4 slices of 20bp; 3 errors spread over slices kills 3 of 4
    # seeds but rescue scans the window regardless of seeding
    recs = map_batch_pe(idx, cfg, mangled)
    n_proper = sum(1 for r in recs if r.flag & K.FLAG_PROPER) // 2
    assert n_proper >= 18
    for k, (s1, s2) in enumerate(pairs):
        r2 = recs[2 * k + 1]
        if r2.flag & K.FLAG_PROPER:
            assert r2.pos - 1 == s2.coord


def test_discordant_falls_back_to_se(idx):
    pairs = simulate_pairs(idx.genome, 10, read_len=70, seed=4,
                           min_insert=150, max_insert=350, sub_rate=0.0)
    # force insert violation: demand tiny inserts so true pairs fail
    cfg = cfg_pe(min_insert=0, max_insert=60)
    recs = map_batch_pe(idx, cfg, [(a.codes, b.codes) for a, b in pairs])
    for k, (s1, s2) in enumerate(pairs):
        r1, r2 = recs[2 * k], recs[2 * k + 1]
        assert not (r1.flag & K.FLAG_PROPER)
        # rescue also constrained to <=60 insert, cannot rescue; SE fallback
        if not r1.flag & K.FLAG_UNMAPPED:
            assert r1.pos - 1 == s1.coord
        if not r2.flag & K.FLAG_UNMAPPED:
            assert r2.pos - 1 == s2.coord


def test_pe_determinism(idx):
    pairs = simulate_pairs(idx.genome, 15, read_len=80, seed=5,
                           sub_rate=0.01, min_insert=150, max_insert=350)
    cfg = cfg_pe(indels=True)
    inp = [(a.codes, b.codes) for a, b in pairs]
    a = [r.line() for r in map_batch_pe(idx, cfg, inp)]
    b = [r.line() for r in map_batch_pe(idx, cfg, inp)]
    assert a == b
