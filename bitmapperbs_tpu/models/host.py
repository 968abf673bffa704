"""Host side of the device pipeline: batch prep, dispatch, finalize, SAM.

The device returns per-read (best, second) tuples; this module rebuilds
oracle Hit objects from them and reuses oracle/pipeline.finalize_hit, so a
device batch and an oracle batch produce byte-identical SAM lines whenever
the tuples agree (which the parity tests assert).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import BSIndex
from bitmapperbs_tpu.index.device import DeviceIndex
from bitmapperbs_tpu.io.sam import SamRecord, unmapped_record
from bitmapperbs_tpu.models.aligner import INF, map_batch_device
from bitmapperbs_tpu.oracle.pipeline import Hit, finalize_hit
from bitmapperbs_tpu.utils import dna


def prepare_batch(reads, m_pad: int, batch: int | None = None):
    """List of code arrays -> (uint8[B, m_pad] N-padded, int32[B] lengths)."""
    B = len(reads) if batch is None else batch
    arr = np.full((B, m_pad), K.N_CODE, dtype=np.uint8)
    lengths = np.full(B, m_pad, dtype=np.int32)  # dummy rows: full-length A
    arr[len(reads):] = K.A
    for i, r in enumerate(reads):
        r = np.asarray(r, dtype=np.uint8)
        if len(r) > m_pad:
            raise ValueError(f"read {i} longer than bucket {m_pad}")
        arr[i, :len(r)] = r
        lengths[i] = len(r)
    return arr, lengths


def device_results_to_hits(cfg: AlignerConfig, genome_len: int, lengths,
                           out) -> list[tuple[Hit | None, Hit | None]]:
    """Device output dict -> per-read (best, second) oracle Hits."""
    bs = np.asarray(out["best_score"])
    bp = np.asarray(out["best_bp"])
    ba = np.asarray(out["best_anchor"])
    ss = np.asarray(out["second_score"])
    res = []
    for i in range(len(bs)):
        if bs[i] >= int(INF):
            res.append((None, None))
            continue
        b, p = int(bp[i]) >> 1, int(bp[i]) & 1
        a = int(ba[i])
        fwd = a if b == K.BLOCK_FWD else genome_len - a - int(lengths[i])
        best = Hit(int(bs[i]), fwd, b, p, a)
        second = None
        if ss[i] < int(INF):
            second = Hit(int(ss[i]), 0, 0, 0, 0)  # only .score is consumed
        res.append((best, second))
    return res


def map_batch_tpu(idx: BSIndex, dix: DeviceIndex, cfg: AlignerConfig,
                  reads, quals=None, qnames=None) -> list[SamRecord]:
    """End-to-end device mapping of a list of reads -> SAM records."""
    quals = quals or [""] * len(reads)
    qnames = qnames or [f"r{i}" for i in range(len(reads))]
    rc_ref = dna.revcomp(idx.genome.codes)
    m_pad = cfg.read_len_bucket
    out_recs: list[SamRecord] = []
    bs = cfg.batch_size
    for lo in range(0, len(reads), bs):
        chunk = reads[lo:lo + bs]
        arr, lengths = prepare_batch(chunk, m_pad, batch=min(bs, len(chunk)))
        out = map_batch_device(dix, cfg, jnp.asarray(arr),
                               jnp.asarray(lengths))
        hits = device_results_to_hits(cfg, idx.genome.length, lengths, out)
        for i, (best, second) in enumerate(hits[:len(chunk)]):
            read = np.asarray(chunk[i], dtype=np.uint8)
            qual, qname = quals[lo + i], qnames[lo + i]
            rec = None
            if best is not None:
                rec = finalize_hit(idx, rc_ref, cfg, read, qual, qname,
                                   best, second)
            if rec is None:
                rec = unmapped_record(qname, read, qual)
            out_recs.append(rec)
    return out_recs
