"""FM-index unit tests: packed runtime vs naive oracle vs brute force.

SURVEY.md section 4 item 2: occ/rank vs naive cumsum rank; backward search vs
brute force; locate vs full SA; property-style tests on random small genomes.
"""
import numpy as np
import pytest

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.index import packed, sais
from bitmapperbs_tpu.index.build import build_block
from bitmapperbs_tpu.oracle.fm import NaiveFM
from bitmapperbs_tpu.utils import dna


def random_conv_text(rng, n):
    """Random converted-space text (codes 1..3)."""
    return rng.integers(1, 4, size=n).astype(np.uint8)


# ---------------------------------------------------------------- suffix array
@pytest.mark.parametrize("n", [1, 2, 5, 100, 1000])
def test_sais_numpy_matches_sorted(rng, n):
    t = np.concatenate([random_conv_text(rng, n), np.zeros(1, np.uint8)])
    sa = sais.suffix_array_numpy(t)
    suffixes = sorted(range(len(t)), key=lambda i: t[i:].tobytes())
    np.testing.assert_array_equal(sa, suffixes)


# ------------------------------------------------------------------- occ/rank
@pytest.mark.parametrize("n", [3, 130, 1000, 5000])
def test_packed_occ_matches_naive(rng, n):
    t = random_conv_text(rng, n)
    blk = build_block(t)
    ora = NaiveFM(t)
    i = rng.integers(0, blk.n + 1, size=300)
    for c in range(K.CONV_ALPHA):
        got = packed.occ(blk, np.full(300, c), i)
        want = ora.occ_matrix[i, c]
        np.testing.assert_array_equal(got.astype(np.int64), want)


def test_packed_bwt_symbol(rng):
    t = random_conv_text(rng, 777)
    blk = build_block(t)
    ora = NaiveFM(t)
    i = np.arange(blk.n)
    np.testing.assert_array_equal(packed.bwt_symbol(blk, i), ora.bwt)


# ------------------------------------------------------------- backward search
@pytest.mark.parametrize("n,m", [(1000, 1), (1000, 5), (1000, 20), (200, 8)])
def test_count_matches_bruteforce(rng, n, m):
    t = random_conv_text(rng, n)
    blk = build_block(t)
    ora = NaiveFM(t)
    for _ in range(50):
        if rng.random() < 0.7:
            start = rng.integers(0, n - m)
            pat = t[start:start + m]          # guaranteed present
        else:
            pat = random_conv_text(rng, m)    # possibly absent
        sp, ep = packed.count(blk, pat)
        osp, oep = ora.count(pat)
        assert (sp, ep) == (osp, oep)
        assert ep - sp == ora.count_bruteforce(pat)


# ---------------------------------------------------------------------- locate
@pytest.mark.parametrize("n", [50, 1000, 4097])
def test_locate_matches_sa(rng, n):
    t = random_conv_text(rng, n)
    blk = build_block(t)
    ora = NaiveFM(t)
    i = rng.integers(0, blk.n, size=min(500, blk.n))
    got = packed.locate(blk, i)
    np.testing.assert_array_equal(got.astype(np.int64), ora.sa[i])


def test_locate_full_roundtrip(rng):
    """Every SA row locates correctly (covers every walk length)."""
    t = random_conv_text(rng, 700)
    blk = build_block(t)
    ora = NaiveFM(t)
    i = np.arange(blk.n)
    np.testing.assert_array_equal(packed.locate(blk, i).astype(np.int64), ora.sa)


# ------------------------------------------------------- end-to-end seed sanity
def test_seed_find_known_position(rng):
    """A read substring's converted form is found at its true position."""
    genome = dna.encode("".join(rng.choice(list("ACGT"), size=2000)))
    conv = dna.ct_convert(genome)
    blk = build_block(conv)
    for _ in range(20):
        pos = int(rng.integers(0, 1970))
        pat = conv[pos:pos + 24]
        sp, ep = packed.count(blk, pat)
        assert ep > sp
        hits = packed.locate(blk, np.arange(sp, ep))
        assert pos in hits.astype(np.int64)
