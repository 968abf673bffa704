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


# -------------------------------------------------------- artifact round-trip
def test_save_load_v4_roundtrip(rng, tmp_path):
    """v4 .bin+manifest round-trips bit-exactly, mmap'd or copied."""
    from bitmapperbs_tpu.index.build import (INDEX_VERSION, build_index,
                                             load_index, save_index)
    from bitmapperbs_tpu.utils.simulate import random_genome_fasta

    fasta = random_genome_fasta(rng, contigs=(3000, 1200))
    idx = build_index(fasta, sa_rate=4, klt_k=5)
    prefix = str(tmp_path / "g.btidx")
    save_index(idx, prefix)
    assert (tmp_path / "g.btidx.bin").exists()
    assert not (tmp_path / "g.btidx.npz").exists()
    for mmap in (True, False):
        back = load_index(prefix, mmap=mmap)
        assert back.meta["version"] == INDEX_VERSION
        assert back.genome.names == idx.genome.names
        np.testing.assert_array_equal(back.genome.codes, idx.genome.codes)
        for a, b in zip(idx.blocks, back.blocks):
            assert a.n == b.n and a.sa_rate == b.sa_rate and a.klt_k == b.klt_k
            np.testing.assert_array_equal(a.cbase, b.cbase)
            np.testing.assert_array_equal(a.cp_rows, b.cp_rows)
            np.testing.assert_array_equal(a.sa_samples, b.sa_samples)
            np.testing.assert_array_equal(a.klt, b.klt)
    # segment alignment: every array starts on a 64-byte boundary
    import json as _json
    man = _json.loads((tmp_path / "g.btidx.json").read_text())
    assert all(seg["offset"] % 64 == 0 for seg in man["segments"].values())


def test_load_legacy_v3_npz(rng, tmp_path):
    """Round-1/2 .npz artifacts (version 3) must stay loadable."""
    from bitmapperbs_tpu.index.build import (LEGACY_NPZ_VERSION, _index_arrays,
                                             build_index, load_index)
    from bitmapperbs_tpu.utils.simulate import random_genome_fasta
    import json as _json

    fasta = random_genome_fasta(rng, contigs=(2500,))
    idx = build_index(fasta, sa_rate=4, klt_k=5)
    prefix = str(tmp_path / "old.btidx")
    np.savez(prefix + ".npz", **_index_arrays(idx))
    manifest = dict(idx.meta)
    manifest["version"] = LEGACY_NPZ_VERSION
    manifest["names"] = idx.genome.names
    manifest["block_n"] = [b.n for b in idx.blocks]
    (tmp_path / "old.btidx.json").write_text(_json.dumps(manifest))
    back = load_index(prefix)
    np.testing.assert_array_equal(back.genome.codes, idx.genome.codes)
    for a, b in zip(idx.blocks, back.blocks):
        np.testing.assert_array_equal(a.cp_rows, b.cp_rows)
        np.testing.assert_array_equal(a.sa_samples, b.sa_samples)


def test_parallel_block_build(rng):
    """jobs=2 spawned block build is byte-identical to the sequential path."""
    from bitmapperbs_tpu.index.build import build_index
    from bitmapperbs_tpu.utils.simulate import random_genome_fasta

    fasta = random_genome_fasta(rng, contigs=(4000, 1500))
    seq = build_index(fasta, sa_rate=4, klt_k=6)
    par = build_index(fasta, sa_rate=4, klt_k=6, jobs=2)
    assert len(seq.blocks) == len(par.blocks)
    for a, b in zip(seq.blocks, par.blocks):
        assert a.n == b.n and a.sa_rate == b.sa_rate and a.klt_k == b.klt_k
        assert (a.cbase == b.cbase).all()
        assert (a.cp_rows == b.cp_rows).all()
        assert (a.sa_samples == b.sa_samples).all()
        assert (a.klt is None) == (b.klt is None)
        if a.klt is not None:
            assert (a.klt == b.klt).all()


def test_random_genome_matches_fasta_round_trip(rng):
    """random_genome (direct codes, used by the at-scale rebuild) is
    bit-identical to parse_fasta(random_genome_fasta) at the same seed:
    same rng stream, same CONTIG_PAD layout (scripts/build_big.py)."""
    from bitmapperbs_tpu.index.build import parse_fasta
    from bitmapperbs_tpu.utils.simulate import (random_genome,
                                                random_genome_fasta)

    seed = int(rng.integers(1 << 30))
    contigs = (5000, 3777, 211)
    g1 = random_genome(np.random.default_rng(seed), contigs=contigs)
    g2 = parse_fasta(random_genome_fasta(np.random.default_rng(seed),
                                         contigs=contigs))
    assert g1.names == g2.names
    np.testing.assert_array_equal(g1.offsets, g2.offsets)
    np.testing.assert_array_equal(g1.lengths, g2.lengths)
    np.testing.assert_array_equal(g1.codes, g2.codes)
