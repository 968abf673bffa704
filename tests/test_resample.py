"""SA-sample densification (index/resample.py): halving sa_rate post-hoc
must produce the SAME artifact a direct build at that rate produces --
cp_rows (mark planes + cumulative counts), sa_samples, cbase all
byte-identical -- and locate must stay correct at the new walk bound."""
import numpy as np
import pytest

from bitmapperbs_tpu.index import packed
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.index.resample import halve_sa_rate
from bitmapperbs_tpu.utils.simulate import random_genome_fasta


@pytest.fixture(scope="module")
def fasta():
    rng = np.random.default_rng(7)
    return random_genome_fasta(rng, contigs=(40_000, 25_000))


def _assert_blocks_equal(a, b):
    assert a.sa_rate == b.sa_rate
    assert a.n == b.n
    np.testing.assert_array_equal(a.cbase, b.cbase)
    np.testing.assert_array_equal(a.cp_rows, b.cp_rows)
    np.testing.assert_array_equal(a.sa_samples, b.sa_samples)


def test_halve_matches_direct_build(fasta):
    coarse = build_index(fasta, sa_rate=8, build_mode="sais")
    direct = build_index(fasta, sa_rate=4, build_mode="sais")
    halve_sa_rate(coarse, 4)
    assert coarse.meta["sa_sample_rate"] == 4
    for bc, bd in zip(coarse.blocks, direct.blocks):
        _assert_blocks_equal(bc, bd)


def test_halve_twice_to_rate_2(fasta):
    coarse = build_index(fasta, sa_rate=8, build_mode="sais")
    direct = build_index(fasta, sa_rate=2, build_mode="sais")
    halve_sa_rate(coarse, 2)
    for bc, bd in zip(coarse.blocks, direct.blocks):
        _assert_blocks_equal(bc, bd)


def test_locate_correct_after_halving(fasta):
    idx = build_index(fasta, sa_rate=8, build_mode="sais")
    halve_sa_rate(idx, 4)
    rng = np.random.default_rng(3)
    for block in idx.blocks:
        rows = rng.integers(0, block.n, size=512).astype(np.uint64)
        got = packed.locate(block, rows)
        # ground truth: walk LF to row 0 (SA[0] = n-1) is O(n); instead
        # verify via the un-densified index built directly
        assert got.max() < block.n
    ref = build_index(fasta, sa_rate=4, build_mode="sais")
    for block, rblock in zip(idx.blocks, ref.blocks):
        rows = rng.integers(0, block.n, size=512).astype(np.uint64)
        np.testing.assert_array_equal(packed.locate(block, rows),
                                      packed.locate(rblock, rows))


def test_odd_rate_rejected(fasta):
    idx = build_index(fasta, sa_rate=8, build_mode="sais")
    with pytest.raises(ValueError):
        halve_sa_rate(idx, 3)
