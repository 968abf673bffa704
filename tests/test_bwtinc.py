"""Low-memory (dynamic-BWT) index build vs the SA-IS path (SURVEY.md C4:
the pSAscan-role bounded-RAM mode must produce byte-identical artifacts)."""
import numpy as np
import pytest

from bitmapperbs_tpu.index import sais
from bitmapperbs_tpu.index.build import build_block

needs_native = pytest.mark.skipif(
    sais._native_lib() is None or not hasattr(sais._native_lib(), "bwtinc_build"),
    reason="libsais.so with bwtinc_build not built")


@needs_native
@pytest.mark.parametrize("n,rate", [(100, 4), (5000, 4), (40000, 8),
                                    (130000, 16)])
def test_lowmem_block_identical(rng, n, rate):
    conv = rng.integers(1, 4, size=n).astype(np.uint8)
    a = build_block(conv, sa_rate=rate, klt_k=5, mode="sais")
    b = build_block(conv, sa_rate=rate, klt_k=5, mode="lowmem")
    assert a.n == b.n and a.sa_rate == b.sa_rate
    np.testing.assert_array_equal(a.cbase, b.cbase)
    np.testing.assert_array_equal(a.cp_rows, b.cp_rows)
    np.testing.assert_array_equal(a.sa_samples, b.sa_samples)
    np.testing.assert_array_equal(a.klt, b.klt)


@needs_native
def test_lowmem_repetitive_text(rng):
    unit = rng.integers(1, 4, size=37).astype(np.uint8)
    conv = np.tile(unit, 700)
    a = build_block(conv, sa_rate=8, klt_k=6, mode="sais")
    b = build_block(conv, sa_rate=8, klt_k=6, mode="lowmem")
    np.testing.assert_array_equal(a.cp_rows, b.cp_rows)
    np.testing.assert_array_equal(a.sa_samples, b.sa_samples)


@needs_native
def test_lowmem_end_to_end_mapping(rng):
    """A lowmem-built index must map reads identically to a sais-built one."""
    from bitmapperbs_tpu.config import AlignerConfig
    from bitmapperbs_tpu.index.build import build_index
    from bitmapperbs_tpu.oracle.pipeline import map_batch_se
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads)

    fasta = random_genome_fasta(rng, contigs=(4000,))
    ia = build_index(fasta, build_mode="sais")
    ib = build_index(fasta, build_mode="lowmem")
    for ba, bb in zip(ia.blocks, ib.blocks):
        np.testing.assert_array_equal(ba.cp_rows, bb.cp_rows)
    cfg = AlignerConfig(max_errors=3, indels=True, read_len_bucket=64,
                        batch_size=30)
    sims = simulate_reads(ia.genome, 30, read_len=60, seed=3, sub_rate=0.01)
    sa = [r.line() for r in map_batch_se(ia, cfg, [s.codes for s in sims])]
    sb = [r.line() for r in map_batch_se(ib, cfg, [s.codes for s in sims])]
    assert sa == sb
