"""Batched host finalization: vectorized traceback-free SAM field
construction for ungapped alignments (SURVEY.md C13/C18 at device speed).

oracle/pipeline.finalize_hit is the per-read spec; at ~100k mapped reads/s
its per-read Python DP + per-character MD/XM loops are ~1000x too slow
(measured 116 reads/s end-to-end).  The frozen spec emits the UNGAPPED
alignment whenever it achieves the reported score -- true for every read
scored by the Hamming fast path, i.e. all but the rare indel reads -- so
this module computes those records with batched numpy (window gathers,
vectorized asymmetric compare, vectorized Bismark-context XM strings) and
falls back to finalize_hit only for gapped reads.  Output records are
byte-identical to finalize_hit's (tests/test_finalize_batch.py).
"""
from __future__ import annotations

import numpy as np

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import BSIndex
from bitmapperbs_tpu.io.sam import SamRecord
from bitmapperbs_tpu.oracle.pipeline import Hit, finalize_hit
from bitmapperbs_tpu.utils import dna

_BASE = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _gather_windows(codes: np.ndarray, starts: np.ndarray, width: int,
                    L: int) -> np.ndarray:
    """codes[starts[i] + j] for j < width, N-filled out of [0, L)."""
    idx = starts[:, None] + np.arange(width, dtype=np.int64)
    oob = (idx < 0) | (idx >= L)
    out = codes[np.clip(idx, 0, L - 1)]
    out[oob] = K.N_CODE
    return out


def finalize_batch(idx: BSIndex, rc_ref: np.ndarray, cfg: AlignerConfig,
                   reads, quals, qnames, hits,
                   flag_extras=None, mapq_overrides=None):
    """Vectorized equivalent of [finalize_hit(...) for each read].

    hits: list of (best Hit | None, second Hit | None).  Returns a list of
    SamRecord | None (None = unmapped / rejected / suppressed-ambiguous),
    byte-identical to per-read finalize_hit.
    """
    n = len(reads)
    out: list[SamRecord | None] = [None] * n
    e = cfg.max_errors
    L = idx.genome.length
    gcodes = idx.genome.codes

    # ---- classify: mapped rows, then fast (ungapped) vs slow (traceback) --
    rows = [i for i, (b, _) in enumerate(hits) if b is not None]
    if not rows:
        return out
    m_arr = np.array([len(reads[i]) for i in rows], dtype=np.int64)
    a_arr = np.array([hits[i][0].anchor for i in rows], dtype=np.int64)
    blk = np.array([hits[i][0].block for i in rows], dtype=np.int64)
    pat = np.array([hits[i][0].pat for i in rows], dtype=np.int64)
    score = np.array([hits[i][0].score for i in rows], dtype=np.int64)

    m_max = int(m_arr.max())
    fr = np.full((len(rows), m_max), K.N_CODE, dtype=np.uint8)
    for k, i in enumerate(rows):
        r = np.asarray(reads[i], dtype=np.uint8)
        fr[k, :len(r)] = r if hits[i][0].pat == K.PAT_CT else dna.revcomp(r)
    inlen = np.arange(m_max)[None, :] < m_arr[:, None]

    # frame window at the anchor: block 0 reads W, block 1 reads rc(W)
    fwin = np.empty((len(rows), m_max), dtype=np.uint8)
    for b, ref in ((K.BLOCK_FWD, gcodes), (K.BLOCK_RC, rc_ref)):
        sel = blk == b
        if sel.any():
            fwin[sel] = _gather_windows(ref, a_arr[sel], m_max, L)
    # frame-space asymmetric rule is always CT; pad rows auto-match
    match = ((fwin == fr) | ((fwin == K.C) & (fr == K.T))) \
        & (fwin != K.N_CODE) & (fr != K.N_CODE)
    ham = (~match & inlen).sum(axis=1)
    fast = (ham == score) if cfg.indels else np.ones(len(rows), dtype=bool)

    # ---- slow path: gapped reads -------------------------------------------
    # The spec's per-read python DP is O(m*w) interpreted ops; here all slow
    # reads' DP matrices are computed in one batched pass (the horizontal
    # chain D[i,j] = min(b_j, D[i,j-1]+1) unrolls to a prefix-min of b_k - k,
    # so each row is a vectorized minimum.accumulate), and the backtrace walk
    # runs in lockstep across all slow reads (each step is a handful of
    # fancy-index gathers).  finalize_hit gets the precomputed
    # (ref_start, cigar) via traceback_pre and does no per-read DP at all.
    slow = np.flatnonzero(~fast)
    if len(slow) > 0:
        ns = len(slow)
        w_max = m_max + 2 * e
        swin = np.empty((ns, w_max), dtype=np.uint8)
        for b, ref in ((K.BLOCK_FWD, gcodes), (K.BLOCK_RC, rc_ref)):
            sel = blk[slow] == b
            if sel.any():
                swin[sel] = _gather_windows(
                    ref, a_arr[slow][sel] - e, w_max, L)
        sfr = fr[slow]
        # asym match table [ns, m_max, w_max] (read index i-1, window j-1)
        mtab = (((swin[:, None, :] == sfr[:, :, None])
                 | ((swin[:, None, :] == K.C) & (sfr[:, :, None] == K.T)))
                & (swin[:, None, :] != K.N_CODE)
                & (sfr[:, :, None] != K.N_CODE))
        # Banded DP in diagonal coordinates d = j - i, d in [-e, 6e].
        # Why this band is faithful to the full matrix (the frozen spec):
        # with score <= e, any end column lies in [m-e, m+2e] (d <= 2e) and
        # its witness alignment starts at s = j_end - span <= 3e, so every
        # walked cell has d in [s-e, s+e] subset [-e, 4e] (and d >= -e
        # because s >= 0).  The backtrace also COMPARES the diag/left
        # neighbors of walked cells (d' <= 4e); a compared cell with true
        # value v' <= e is exact in-band because its own optimal path stays
        # within d <= d' + 2v' <= 6e (s' >= 0 bounds the low side at -e).
        # Cells below -e have true value > e (>= forced insertions), so
        # treating them as INF preserves every comparison.  Values are
        # int16 and exact in-band; the j = 0 boundary column emerges from
        # the row-0 base (j < 0 cells are INF), so no separate i + j cap
        # term is needed.  ~3.5x fewer cells than the full-width rows.
        B = 7 * e + 1                       # d = didx - e
        INF16 = np.int16(2 ** 13)
        sub16 = (~mtab).astype(np.int16)    # full-coords table (backtrace)
        # padded mismatch rows: row i reads j-1 = (i-1)-e .. (i-1)+6e, i.e.
        # subP[:, i-1, (i-1):(i-1)+B] with a left pad of e and right pad 4e
        subP = np.ones((ns, m_max, e + w_max + 4 * e), dtype=np.int16)
        subP[:, :, e:e + w_max] = sub16
        D = np.full((ns, m_max + 1, B), INF16, dtype=np.int16)
        D[:, 0, e:] = 0                     # row 0: j = d >= 0 is free start
        idxB = np.arange(B, dtype=np.int16)
        for i in range(1, m_max + 1):
            prev = D[:, i - 1, :]
            up = np.concatenate(            # (i-1, j) sits one diagonal up
                [prev[:, 1:], np.full((ns, 1), INF16, np.int16)], axis=1)
            b_row = np.minimum(prev + subP[:, i - 1, i - 1:i - 1 + B],
                               up + 1)
            run = np.minimum.accumulate(b_row - idxB, axis=1)
            D[:, i, :] = run + idxB
        m_slow = m_arr[slow]
        w_slow = m_slow + 2 * e
        # end column: smallest j over the VALID window achieving the row
        # min; in band coords j = m_slow + didx - e, so the j <= w_slow
        # mask is didx <= 3e and smallest didx = smallest j
        rr = np.arange(ns)
        band_last = D[rr, m_slow, :]
        jb = m_slow[:, None] + np.arange(B)[None, :] - e
        band_last = np.where((jb >= 0) & (jb <= w_slow[:, None]),
                             band_last, np.int16(2 ** 14))
        didx0 = np.argmin(band_last, axis=1)
        jcur = (m_slow + didx0 - e).astype(np.int64)
        icur = m_slow.copy()
        # lockstep backtrace; ops stored walk-order (alignment end -> start)
        # 0 = done, 1 = M, 2 = D (ref gap), 3 = I (read gap)
        max_steps = int((m_slow + w_slow).max()) if ns else 0
        opbuf = np.zeros((ns, max_steps), dtype=np.uint8)
        step = 0
        active = icur > 0
        while active.any():
            ip = np.maximum(icur - 1, 0)
            jp = np.maximum(jcur - 1, 0)
            didx = np.clip(jcur - icur + e, 0, B - 1)
            d_here = D[rr, icur, didx]
            diag = D[rr, ip, didx] + sub16[rr, ip, jp]
            take_m = active & (jcur > 0) & (d_here == diag)
            left = D[rr, icur, np.maximum(didx - 1, 0)]
            take_d = (active & ~take_m & (jcur > 0) & (didx > 0)
                      & (d_here == left + 1))
            take_i = active & ~take_m & ~take_d
            opbuf[:, step] = take_m + 2 * take_d + 3 * take_i
            icur -= take_m | take_i
            jcur -= take_m | take_d
            active = icur > 0
            step += 1
        nsteps = (opbuf != 0).sum(axis=1)
        # Light per-read pass: trim leading/trailing D runs (frame space),
        # record the frame position, and lay the trimmed ops out
        # chronologically in FWD orientation (a reversed hit's fwd cigar is
        # the frame cigar reversed).  Everything downstream -- match table,
        # NM, Bismark XM, MD events -- is then computed in one vectorized
        # pass over the (ns, A_max) aligned-column grid, mirroring
        # oracle/align.cigar_md_nm column for column; only MD/CIGAR string
        # formatting stays per-read (a handful of events each).
        blkS = blk[slow]
        patS = pat[slow]
        revS = np.array([K.IS_REVERSE[(int(b), int(p))]
                         for b, p in zip(blkS, patS)], dtype=bool)
        degen = np.zeros(ns, dtype=bool)
        degen_ref_start = np.zeros(ns, dtype=np.int64)
        trimmed: list[np.ndarray] = []
        frame_pos = np.zeros(ns, dtype=np.int64)
        A_max = 1
        for t in range(ns):
            o = opbuf[t, :nsteps[t]][::-1]          # chronological order
            keep = np.flatnonzero(o != 2)           # trim leading/trailing D
            if len(keep) == 0:                      # empty alignment: spec
                degen[t] = True
                degen_ref_start[t] = int(jcur[t]) + len(o)
                trimmed.append(o[:0])
                continue
            o = o[int(keep[0]):int(keep[-1]) + 1]
            trimmed.append(o[::-1] if revS[t] else o)
            frame_pos[t] = (a_arr[slow[t]] - e + int(jcur[t])
                            + int(keep[0]))
            A_max = max(A_max, len(o))
        ops_f = np.zeros((ns, A_max), dtype=np.uint8)
        for t, o in enumerate(trimmed):
            ops_f[t, :len(o)] = o
        isM = ops_f == 1
        isD = ops_f == 2
        isI = ops_f == 3
        rc_col = isM | isI                          # read-consuming columns
        fc_col = isM | isD                          # ref-consuming columns
        readpos = np.cumsum(rc_col, axis=1) - rc_col
        refoff = np.cumsum(fc_col, axis=1) - fc_col
        ref_spanS = fc_col.sum(axis=1).astype(np.int64)
        fwd_posS = np.where(blkS == K.BLOCK_FWD, frame_pos,
                            L - frame_pos - ref_spanS)
        ciS = np.searchsorted(idx.genome.offsets, fwd_posS,
                              side="right") - 1
        coordS = fwd_posS - idx.genome.offsets[ciS]
        in_contigS = (coordS >= 0) & (coordS + ref_spanS
                                      <= idx.genome.lengths[ciS])
        gaS = blkS == K.BLOCK_RC

        fwd_readS = np.full((ns, m_max), K.N_CODE, dtype=np.uint8)
        for t, k in enumerate(slow):
            r = np.asarray(reads[rows[k]], dtype=np.uint8)
            fwd_readS[t, :len(r)] = dna.revcomp(r) if revS[t] else r

        q = fwd_posS[:, None] + refoff              # abs fwd genome pos
        qin = (q >= 0) & (q < L) & fc_col
        rq = np.where(qin, gcodes[np.clip(q, 0, L - 1)], K.N_CODE)
        rd = fwd_readS[np.arange(ns)[:, None],
                       np.minimum(readpos, max(m_max - 1, 0))]
        rd = np.where(rc_col, rd, K.N_CODE)
        ref_cS = np.where(gaS, K.G, K.C).astype(np.uint8)[:, None]
        bsm = np.where(gaS[:, None], (rq == K.G) & (rd == K.A),
                       (rq == K.C) & (rd == K.T))
        eqm = ((rq == rd) | bsm) & (rq != K.N_CODE) & (rd != K.N_CODE)
        matchedM = isM & eqm
        mmM = isM & ~eqm
        nmS = (mmM | isD | isI).sum(axis=1)

        # Bismark context letters at ref-C match columns (vectorized
        # align.meth_context; GA strand looks upstream, complemented)
        dq = np.where(gaS, -1, 1).astype(np.int64)[:, None]
        q1, q2 = q + dq, q + 2 * dq
        b1 = np.where((q1 >= 0) & (q1 < L),
                      gcodes[np.clip(q1, 0, L - 1)], K.N_CODE)
        b2 = np.where((q2 >= 0) & (q2 < L),
                      gcodes[np.clip(q2, 0, L - 1)], K.N_CODE)
        gsymS = np.where(gaS, K.C, K.G).astype(np.uint8)[:, None]
        ctxS = np.where(
            b1 == gsymS, ord("z"),
            np.where(b1 == K.N_CODE, ord("u"),
                     np.where(b2 == gsymS, ord("x"),
                              np.where(b2 == K.N_CODE, ord("u"),
                                       ord("h"))))).astype(np.uint8)
        is_cS = matchedM & (rq == ref_cS)
        methS = rd == ref_cS                        # unconverted cytosine
        xm_mat = np.full((ns, max(m_max, 1)), ord("."), dtype=np.uint8)
        rsel, csel = np.nonzero(is_cS)
        xm_mat[rsel, readpos[rsel, csel]] = np.where(
            methS[rsel, csel], ctxS[rsel, csel] - 32, ctxS[rsel, csel])
        seqS = _BASE[fwd_readS]
        rq_chr = _BASE[rq]
        cummatch = np.cumsum(matchedM, axis=1) - matchedM
        totmatch = matchedM.sum(axis=1)
        evmask = mmM | isD

        for t, k in enumerate(slow):
            i = rows[k]
            if degen[t]:
                out[i] = finalize_hit(
                    idx, rc_ref, cfg, np.asarray(reads[i], np.uint8),
                    quals[i], qnames[i], hits[i][0], hits[i][1],
                    flag_extra=flag_extras[i] if flag_extras else 0,
                    mapq_override=(mapq_overrides[i] if mapq_overrides
                                   else None),
                    traceback_pre=(int(degen_ref_start[t]), []))
                continue
            if not in_contigS[t]:
                continue                            # leaves contig: reject
            best, second = hits[i]
            ambiguous = second is not None and second.score == best.score
            if ambiguous and not cfg.report_ambiguous:
                continue
            mapq = 0 if ambiguous else K.mapq_from_gap(
                best.score, second.score if second else None)
            if mapq_overrides and mapq_overrides[i] is not None:
                mapq = mapq_overrides[i]
            oo = trimmed[t]
            cut = np.flatnonzero(oo[1:] != oo[:-1]) + 1
            bounds = np.concatenate(([0], cut, [len(oo)]))
            cigar = "".join("%d%s" % (be - bb, "\0MDI"[oo[bb]])
                            for bb, be in zip(bounds[:-1], bounds[1:]))
            evc = np.flatnonzero(evmask[t])
            parts = []
            prevm = 0
            u = 0
            while u < len(evc):
                c = int(evc[u])
                parts.append(str(int(cummatch[t, c]) - prevm))
                prevm = int(cummatch[t, c])
                if isD[t, c]:
                    v = u                           # group the full D run
                    while (v + 1 < len(evc) and evc[v + 1] == evc[v] + 1
                           and isD[t, evc[v + 1]]):
                        v += 1
                    parts.append("^" + rq_chr[t, int(evc[u]):
                                              int(evc[v]) + 1]
                                 .tobytes().decode())
                    u = v + 1
                else:
                    parts.append(chr(rq_chr[t, c]))
                    u += 1
            parts.append(str(int(totmatch[t]) - prevm))
            m = int(m_arr[slow[t]])
            qual = quals[i]
            xr, xg = K.CONV_TAGS[(int(blkS[t]), int(patS[t]))]
            out[i] = SamRecord(
                qname=qnames[i],
                flag=(K.FLAG_REVERSE if revS[t] else 0)
                     | (flag_extras[i] if flag_extras else 0),
                rname=idx.genome.names[int(ciS[t])],
                pos=int(coordS[t]) + 1,
                mapq=mapq,
                cigar=cigar,
                seq=seqS[t, :m].tobytes().decode(),
                qual=(qual[::-1] if revS[t] else qual) if qual else "*",
                nm=int(nmS[t]),
                md="".join(parts),
                xm=xm_mat[t, :m].tobytes().decode(),
                xr=xr, xg=xg,
            )

    f = np.flatnonzero(fast)
    if len(f) == 0:
        return out

    # ---- fast path: ungapped records, fully vectorized ---------------------
    mF = m_arr[f]
    blkF = blk[f]
    patF = pat[f]
    fwd_pos = np.where(blkF == K.BLOCK_FWD, a_arr[f], L - a_arr[f] - mF)
    ci = np.searchsorted(idx.genome.offsets, fwd_pos, side="right") - 1
    coord = fwd_pos - idx.genome.offsets[ci]
    in_contig = (coord >= 0) & (coord + mF <= idx.genome.lengths[ci])

    rev = np.array([K.IS_REVERSE[(int(b), int(p))]
                    for b, p in zip(blkF, patF)], dtype=bool)
    ga = blkF == K.BLOCK_RC

    # fwd-orientation read and genome context window [pos-2, pos+m+2)
    fwd_read = np.full((len(f), m_max), K.N_CODE, dtype=np.uint8)
    for t, k in enumerate(f):
        i = rows[k]
        r = np.asarray(reads[i], dtype=np.uint8)
        fwd_read[t, :len(r)] = dna.revcomp(r) if rev[t] else r
    ctxw = _gather_windows(gcodes, fwd_pos - 2, m_max + 4, L)
    gwin = ctxw[:, 2:m_max + 2]             # fwd genome window, width m_max
    inlenF = np.arange(m_max)[None, :] < mF[:, None]

    ref_c = np.where(ga, K.G, K.C).astype(np.uint8)[:, None]
    bs = np.where(ga[:, None], (gwin == K.G) & (fwd_read == K.A),
                  (gwin == K.C) & (fwd_read == K.T))
    matchF = ((gwin == fwd_read) | bs) \
        & (gwin != K.N_CODE) & (fwd_read != K.N_CODE) & inlenF
    mism = ~matchF & inlenF

    # Bismark context letters at every ref-C position (vectorized
    # align.meth_context): CT strand looks at +1/+2, GA strand at -1/-2
    # complemented (G plays C's role)
    b1 = np.where(ga[:, None], ctxw[:, 1:m_max + 1], ctxw[:, 3:m_max + 3])
    b2 = np.where(ga[:, None], ctxw[:, 0:m_max], ctxw[:, 4:m_max + 4])
    gsym = np.where(ga, K.C, K.G).astype(np.uint8)[:, None]
    ctx = np.where(
        b1 == gsym, ord("z"),
        np.where(b1 == K.N_CODE, ord("u"),
                 np.where(b2 == gsym, ord("x"),
                          np.where(b2 == K.N_CODE, ord("u"),
                                   ord("h"))))).astype(np.uint8)
    is_c = matchF & (gwin == ref_c)
    meth = fwd_read == ref_c                 # unconverted cytosine
    ctx_cased = np.where(meth, ctx - 32, ctx)          # upper when methylated
    xm_arr = np.where(is_c, ctx_cased, ord(".")).astype(np.uint8)
    xm_arr[~inlenF] = 0

    seq_arr = _BASE[fwd_read]

    for t, k in enumerate(f):
        i = rows[k]
        if not in_contig[t]:
            continue
        best, second = hits[i]
        ambiguous = second is not None and second.score == best.score
        if ambiguous and not cfg.report_ambiguous:
            continue
        mapq = 0 if ambiguous else K.mapq_from_gap(
            best.score, second.score if second else None)
        if mapq_overrides and mapq_overrides[i] is not None:
            mapq = mapq_overrides[i]
        m = int(mF[t])
        # MD from the few mismatch positions
        mm = np.flatnonzero(mism[t, :m])
        parts = []
        prev = 0
        for q in mm:
            parts.append(str(int(q) - prev))
            parts.append("ACGTN"[int(gwin[t, q])])
            prev = int(q) + 1
        parts.append(str(m - prev))
        qual = quals[i]
        xr, xg = K.CONV_TAGS[(int(blkF[t]), int(patF[t]))]
        out[i] = SamRecord(
            qname=qnames[i],
            flag=(K.FLAG_REVERSE if rev[t] else 0)
                 | (flag_extras[i] if flag_extras else 0),
            rname=idx.genome.names[int(ci[t])],
            pos=int(coord[t]) + 1,
            mapq=mapq,
            cigar=f"{m}M",
            seq=seq_arr[t, :m].tobytes().decode(),
            qual=(qual[::-1] if rev[t] else qual) if qual else "*",
            nm=int(mism[t, :m].sum()),
            md="".join(parts),
            xm=xm_arr[t, :m].tobytes().decode(),
            xr=xr, xg=xg,
        )
    return out
