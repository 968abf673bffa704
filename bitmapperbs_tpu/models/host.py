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
from bitmapperbs_tpu.models.finalize import finalize_batch
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


MAX_INFLIGHT = 3  # device batches dispatched ahead of host finalize


def map_batch_tpu(idx: BSIndex, dix: DeviceIndex, cfg: AlignerConfig,
                  reads, quals=None, qnames=None, stats=None) -> list[SamRecord]:
    """End-to-end device mapping of a list of reads -> SAM records.

    Batches are dispatched ahead of host-side finalization (JAX async
    dispatch; SURVEY.md hard-part 7: host I/O must overlap device compute),
    with a bounded in-flight window; output order is preserved.
    stats: optional io.stats.MapStats -- device capacity-overflow flags are
    accumulated into stats.overflow_reads (SURVEY.md 5.5: silent caps eat
    recall, so they must be counted).
    """
    quals = quals or [""] * len(reads)
    qnames = qnames or [f"r{i}" for i in range(len(reads))]
    rc_ref = dna.revcomp(idx.genome.codes)
    m_pad = cfg.read_len_bucket
    out_recs: list[SamRecord] = []
    bs = cfg.batch_size

    def drain(item):
        lo, chunk, arr, lengths, out = item
        out = _gdrop_fallback_se(dix, cfg, arr, lengths, out)
        if stats is not None:
            stats.overflow_reads += int(
                np.asarray(out["overflow"])[:len(chunk)].sum())
        hits = device_results_to_hits(cfg, idx.genome.length, lengths, out)
        recs = finalize_batch(idx, rc_ref, cfg, chunk,
                              quals[lo:lo + len(chunk)],
                              qnames[lo:lo + len(chunk)], hits[:len(chunk)])
        for i, rec in enumerate(recs):
            if rec is None:
                rec = unmapped_record(qnames[lo + i],
                                      np.asarray(chunk[i], np.uint8),
                                      quals[lo + i])
            out_recs.append(rec)

    pending = []
    for lo in range(0, len(reads), bs):
        chunk = reads[lo:lo + bs]
        arr, lengths = prepare_batch(chunk, m_pad, batch=min(bs, len(chunk)))
        out = map_batch_device(dix, cfg, jnp.asarray(arr),
                               jnp.asarray(lengths))   # async dispatch
        pending.append((lo, chunk, arr, lengths, out))
        if len(pending) >= MAX_INFLIGHT:
            drain(pending.pop(0))
    for item in pending:
        drain(item)
    return out_recs


def _merge_where(sel, dense, fast):
    """Per-read merge of (possibly nested) device output dicts."""
    out = {}
    for k, v in fast.items():
        if isinstance(v, dict):
            out[k] = _merge_where(sel, dense[k], v)
        else:
            out[k] = np.where(sel, np.asarray(dense[k]), np.asarray(v))
    return out


def _gdrop_fallback_se(dix, cfg: AlignerConfig, arr, lengths, out):
    """Re-run flat-buffer-overflow reads through the dense path.

    The compacted pipeline (aligner.candidate_grids_compact) drops candidate
    entries batch-dependently when its flat buffer fills; to keep output
    deterministic across batch compositions and shardings, every flagged
    read's result is replaced by the dense path's (the spec).  Unflagged
    reads are bit-identical between the two, so merging per read is exact.
    """
    gdrop = np.asarray(out["gdrop"])
    if not (cfg.compact and gdrop.any()):
        return out
    dense = map_batch_device(dix, cfg.replace(compact=False),
                             jnp.asarray(arr), jnp.asarray(lengths))
    return _merge_where(gdrop, dense, out)


# --------------------------------------------------------------------------
# paired-end host assembly (decision order mirrors oracle/paired.map_pair)
# --------------------------------------------------------------------------

def map_batch_pe_tpu(idx: BSIndex, dix: DeviceIndex, cfg: AlignerConfig,
                     pairs, quals=None, qnames=None,
                     stats=None) -> list[SamRecord]:
    """End-to-end device PE mapping -> SAM records (2 per pair)."""
    from bitmapperbs_tpu.models.paired import map_batch_pe_device
    from bitmapperbs_tpu.oracle import paired as opaired
    from bitmapperbs_tpu import constants as K2

    rc_ref = dna.revcomp(idx.genome.codes)
    m_pad = cfg.read_len_bucket
    e = cfg.max_errors
    L = idx.genome.length
    out_recs: list[SamRecord] = []
    bs = cfg.batch_size

    def drain(item):
        lo, chunk, a1, l1, a2, l2, out = item
        host = {k: (np.asarray(v) if not isinstance(v, dict)
                    else {kk: np.asarray(vv) for kk, vv in v.items()})
                for k, v in out.items()}
        gdrop = host["gdrop"]
        if stats is not None:
            stats.overflow_reads += int(
                (host["se1"]["overflow"][:len(chunk)]
                 | host["se2"]["overflow"][:len(chunk)]).sum())
        if cfg.compact and gdrop.any():
            dense = map_batch_pe_device(
                dix, cfg.replace(compact=False), jnp.asarray(a1),
                jnp.asarray(l1), jnp.asarray(a2), jnp.asarray(l2))
            host = _merge_where(gdrop, dense, host)
        for i in range(len(chunk)):
            reads = (np.asarray(chunk[i][0], np.uint8),
                     np.asarray(chunk[i][1], np.uint8))
            q = quals[lo + i] if quals else ("", "")
            qn = qnames[lo + i] if qnames else f"p{lo + i}"
            out_recs.extend(_assemble_pair(idx, rc_ref, cfg, reads, q, qn,
                                           host, i, L, e, opaired, K2))

    pending = []
    for lo in range(0, len(pairs), bs):
        chunk = pairs[lo:lo + bs]
        B = min(bs, len(chunk))
        a1, l1 = prepare_batch([p[0] for p in chunk], m_pad, B)
        a2, l2 = prepare_batch([p[1] for p in chunk], m_pad, B)
        out = map_batch_pe_device(dix, cfg, jnp.asarray(a1), jnp.asarray(l1),
                                  jnp.asarray(a2), jnp.asarray(l2))
        pending.append((lo, chunk, a1, l1, a2, l2, out))
        if len(pending) >= MAX_INFLIGHT:
            drain(pending.pop(0))
    for item in pending:
        drain(item)
    return out_recs


def _se_hit_from(host_se, i, m, L):
    from bitmapperbs_tpu.models.aligner import INF as _INF
    if host_se["best_score"][i] >= int(_INF):
        return None, None
    bp = int(host_se["best_bp"][i])
    b, p = bp >> 1, bp & 1
    a = int(host_se["best_anchor"][i])
    fwd = a if b == K.BLOCK_FWD else L - a - m
    best = Hit(int(host_se["best_score"][i]), fwd, b, p, a)
    second = None
    if host_se["second_score"][i] < int(_INF):
        second = Hit(int(host_se["second_score"][i]), 0, 0, 0, 0)
    return best, second


def _assemble_pair(idx, rc_ref, cfg, reads, q, qn, host, i, L, e,
                   opaired, K2):
    from bitmapperbs_tpu.models.aligner import INF as _INF
    m1, m2 = len(reads[0]), len(reads[1])

    if host["pair_valid"][i]:
        bp1, bp2 = int(host["pair_bp1"][i]), int(host["pair_bp2"][i])
        a1, a2 = int(host["pair_a1"][i]), int(host["pair_a2"][i])
        f1 = a1 if bp1 >> 1 == K.BLOCK_FWD else L - a1 - m1
        f2 = a2 if bp2 >> 1 == K.BLOCK_FWD else L - a2 - m2
        s1 = int(host["pair_s1"][i])
        ssum = int(host["pair_sum"][i])
        h1 = Hit(s1, f1, bp1 >> 1, bp1 & 1, a1)
        h2 = Hit(ssum - s1, f2, bp2 >> 1, bp2 & 1, a2)
        s2sum = int(host["pair_second_sum"][i])
        if s2sum < int(2 * _INF) and s2sum == ssum:
            mapq = 0
        else:
            mapq = K.mapq_from_gap(ssum,
                                   s2sum if s2sum < int(2 * _INF) else None)
        recs = opaired._emit_pair(idx, rc_ref, cfg, reads, q, qn,
                                  h1, h2, mapq, mapq)
        if recs:
            return recs

    if host["resc_valid"][i]:
        anch_is_1 = bool(host["resc_anch_is_1"][i])
        se_a = host["se1"] if anch_is_1 else host["se2"]
        m_anch = m1 if anch_is_1 else m2
        m_miss = m2 if anch_is_1 else m1
        anchored, anch_second = _se_hit_from(se_a, i, m_anch, L)
        if anchored is not None:
            b = int(host["resc_block"][i])
            p = int(host["resc_pat"][i])
            fwd = int(host["resc_fwd"][i])
            a = fwd if b == K.BLOCK_FWD else L - fwd - m_miss
            rb = Hit(int(host["resc_score"][i]), fwd, b, p, a)
            rsecond = int(host["resc_second"][i])
            rsecond = rsecond if rsecond < int(_INF) else None
            anch_amb = anch_second is not None and \
                anch_second.score == anchored.score
            anch_mapq = 0 if anch_amb else K.mapq_from_gap(
                anchored.score, anch_second.score if anch_second else None)
            resc_mapq = 0 if (rsecond is not None and rsecond == rb.score) \
                else K.mapq_from_gap(rb.score, rsecond)
            mapq = min(anch_mapq, resc_mapq)
            ordered = (anchored, rb) if anch_is_1 else (rb, anchored)
            recs = opaired._emit_pair(idx, rc_ref, cfg, reads, q, qn,
                                      ordered[0], ordered[1], mapq, mapq)
            if recs:
                return recs

    # discordant / singleton fallback
    sel = [_se_hit_from(host["se1"], i, m1, L),
           _se_hit_from(host["se2"], i, m2, L)]
    recs = []
    for mi in (0, 1):
        best, second = sel[mi]
        mate_best = sel[1 - mi][0]
        extra = K.FLAG_PAIRED | (K.FLAG_READ1 if mi == 0 else K.FLAG_READ2)
        if mate_best is None:
            extra |= K.FLAG_MATE_UNMAPPED
        elif K.IS_REVERSE[(mate_best.block, mate_best.pat)]:
            extra |= K.FLAG_MATE_REVERSE
        rec = None
        if best is not None:
            rec = finalize_hit(idx, rc_ref, cfg, reads[mi], q[mi], qn,
                               best, second, flag_extra=extra)
        if rec is None:
            rec = unmapped_record(qn, reads[mi], q[mi], flag_extra=extra)
        recs.append(rec)
    r1r, r2r = recs
    if not (r1r.flag & K.FLAG_UNMAPPED) and not (r2r.flag & K.FLAG_UNMAPPED):
        if r1r.rname == r2r.rname:
            r1r.rnext = r2r.rnext = "="
        else:
            r1r.rnext, r2r.rnext = r2r.rname, r1r.rname
        r1r.pnext, r2r.pnext = r2r.pos, r1r.pos
    return recs
