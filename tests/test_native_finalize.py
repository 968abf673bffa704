"""Native finalize (finalize.cpp) == numpy finalize_batch_device, record for
record, on randomized device outputs: substitutions, indels, Ns, reverse /
PBAT frames, ambiguity, contig edges, unmapped rows, phred reversal."""
import os

import numpy as np
import pytest

from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.models import native_finalize
from bitmapperbs_tpu.models.finalize import finalize_batch_device
from bitmapperbs_tpu.utils import dna
from bitmapperbs_tpu.utils.simulate import random_genome_fasta, simulate_reads

pytestmark = pytest.mark.skipif(
    not native_finalize.available(),
    reason="native finalize library not built")


def _compare(idx, rc_ref, cfg, arr, lengths, quals, qnames, out_np):
    want = finalize_batch_device(idx, rc_ref, cfg, arr, lengths, quals,
                                 qnames, out_np)
    got = native_finalize.finalize_se_native(idx, rc_ref, cfg, arr, lengths,
                                             quals, qnames, out_np)
    assert got is not None
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        if w is None:
            assert g is None, (i, g)
            continue
        assert g is not None, (i, w)
        assert g.line() == w.line(), (i, g.line(), w.line())


def _device_outputs(idx, cfg, reads):
    import jax.numpy as jnp

    from bitmapperbs_tpu.index.device import upload_index
    from bitmapperbs_tpu.models.aligner import map_batch_device
    from bitmapperbs_tpu.models.host import prepare_batch

    dix = upload_index(idx)
    m_pad = cfg.read_len_bucket
    arr, lengths = prepare_batch(reads, m_pad, cfg.batch_size)
    out = map_batch_device(dix, cfg, jnp.asarray(arr), jnp.asarray(lengths))
    return arr, lengths, {k: np.asarray(v) for k, v in out.items()}


def test_native_matches_numpy_pipeline(rng):
    """Real device outputs (CPU backend): subs + indels, both strands."""
    idx = build_index(random_genome_fasta(rng, contigs=(8000, 5000)))
    rc_ref = dna.revcomp(idx.genome.codes)
    n = 96
    cfg = AlignerConfig(max_errors=4, indels=True, read_len_bucket=96,
                        batch_size=n)
    sims = simulate_reads(idx.genome, n, read_len=88, seed=11, sub_rate=0.03,
                          indel_rate=0.02)
    reads = [s.codes for s in sims]
    arr, lengths, out_np = _device_outputs(idx, cfg, reads)
    quals = ["".join(chr(33 + (j % 40)) for j in range(len(r)))
             for r in reads]
    qnames = [f"r{i}" for i in range(n)]
    _compare(idx, rc_ref, cfg, arr, lengths, quals, qnames, out_np)
    # and with ambiguity suppression + indels off
    cfg2 = cfg.replace(report_ambiguous=False, indels=False)
    arr2, lengths2, out2 = _device_outputs(idx, cfg2, reads)
    _compare(idx, rc_ref, cfg2, arr2, lengths2, quals, qnames, out2)


def test_native_matches_numpy_synthetic(rng):
    """Synthetic hit fields sweep the edge cases faster than the pipeline:
    contig edges (rejects), Ns in reads and genome, ambiguous ties,
    unmapped rows, all four (block, pat) frames, degenerate fallbacks."""
    # salt the genome with N runs (FASTA text surgery keeps simulate simple)
    fa = random_genome_fasta(rng, contigs=(3000, 2000))
    body = list(fa)
    base_pos = [k for k, ch in enumerate(fa) if ch in "ACGT"]
    for k in rng.choice(len(base_pos), size=40, replace=False):
        body[base_pos[int(k)]] = "N"
    idx = build_index("".join(body))
    rc_ref = dna.revcomp(idx.genome.codes)
    L = idx.genome.length
    n = 256
    m = 60
    cfg = AlignerConfig(max_errors=3, indels=True, read_len_bucket=64,
                        batch_size=n)
    arr = rng.integers(0, 4, size=(n, 64)).astype(np.uint8)
    arr[:, m:] = 4
    # sprinkle Ns into reads
    nmask = rng.random((n, m)) < 0.02
    arr[:, :m][nmask] = 4
    lengths = np.full(n, m, dtype=np.int64)
    bs = rng.integers(0, cfg.max_errors + 1, n).astype(np.int64)
    bp = rng.integers(0, 4, n).astype(np.int64)
    ba = rng.integers(0, L - m, n).astype(np.int64)
    ss = np.where(rng.random(n) < 0.3, bs,
                  np.where(rng.random(n) < 0.3, bs + rng.integers(1, 4, n),
                           np.int64(1 << 20))).astype(np.int64)
    # force some unmapped rows and contig-edge anchors
    bs[:8] = 1 << 20
    ba[8:16] = np.arange(8)              # near text start
    ba[16:24] = L - m - np.arange(8)     # near text end
    out_np = {"best_score": bs, "best_bp": bp, "best_anchor": ba,
              "second_score": ss}
    quals = ["I" * m] * n
    qnames = [f"s{i}" for i in range(n)]
    _compare(idx, rc_ref, cfg, arr, lengths, quals, qnames, out_np)
    cfg2 = cfg.replace(report_ambiguous=False)
    _compare(idx, rc_ref, cfg2, arr, lengths, quals, qnames, out_np)
