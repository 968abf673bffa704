"""BAM writer round-trip: decode our own BGZF+BAM bytes and compare fields."""
import gzip
import io
import struct

import numpy as np
import pytest

from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.io.bam import BamWriter
from bitmapperbs_tpu.oracle.pipeline import map_batch_se
from bitmapperbs_tpu.utils.simulate import random_genome_fasta, simulate_reads

_CIGAR_OPS = "MIDNSHP=X"
_NIB = "=ACMGRSVTWYHKDBN"


def decode_bam(data: bytes):
    raw = gzip.decompress(data)
    assert raw[:4] == b"BAM\1"
    off = 4
    l_text, = struct.unpack_from("<i", raw, off); off += 4
    text = raw[off:off + l_text].decode(); off += l_text
    n_ref, = struct.unpack_from("<i", raw, off); off += 4
    refs = []
    for _ in range(n_ref):
        l_name, = struct.unpack_from("<i", raw, off); off += 4
        name = raw[off:off + l_name - 1].decode(); off += l_name
        l_ref, = struct.unpack_from("<i", raw, off); off += 4
        refs.append((name, l_ref))
    recs = []
    while off < len(raw):
        bs, = struct.unpack_from("<i", raw, off); off += 4
        body = raw[off:off + bs]; off += bs
        (ref_id, pos, l_rn, mapq, _bin, n_cig, flag, l_seq,
         nref, npos, tlen) = struct.unpack_from("<iiBBHHHiiii", body, 0)
        p = 32
        qname = body[p:p + l_rn - 1].decode(); p += l_rn
        cig = []
        for _ in range(n_cig):
            v, = struct.unpack_from("<I", body, p); p += 4
            cig.append(f"{v >> 4}{_CIGAR_OPS[v & 15]}")
        seq = "".join(
            _NIB[(body[p + k // 2] >> (4 if k % 2 == 0 else 0)) & 15]
            for k in range(l_seq))
        p += (l_seq + 1) // 2
        qual = bytes(body[p:p + l_seq]); p += l_seq
        tags = {}
        while p < len(body):
            tag = body[p:p + 2].decode(); typ = chr(body[p + 2]); p += 3
            if typ == "i":
                tags[tag], = struct.unpack_from("<i", body, p); p += 4
            elif typ == "Z":
                end = body.index(0, p)
                tags[tag] = body[p:end].decode(); p = end + 1
            else:
                raise AssertionError(f"unexpected tag type {typ}")
        recs.append(dict(qname=qname, flag=flag, ref_id=ref_id, pos=pos,
                         mapq=mapq, cigar="".join(cig) or "*", seq=seq,
                         tlen=tlen, tags=tags, nref=nref, npos=npos))
    return text, refs, recs


def test_bam_roundtrip(rng):
    idx = build_index(random_genome_fasta(rng, contigs=(3000,)))
    sims = simulate_reads(idx.genome, 20, read_len=70, seed=3, sub_rate=0.01)
    cfg = AlignerConfig(max_errors=3, indels=True)
    sam = map_batch_se(idx, cfg, [s.codes for s in sims],
                       [s.qual for s in sims])
    buf = io.BytesIO()
    w = BamWriter(buf, idx.genome.names, idx.genome.lengths)
    for r in sam:
        w.write(r)
    w.close()
    text, refs, recs = decode_bam(buf.getvalue())
    assert refs == [("chr1", 3000)]
    assert "@PG" in text
    assert len(recs) == len(sam)
    for got, want in zip(recs, sam):
        assert got["qname"] == want.qname
        assert got["flag"] == want.flag
        assert got["cigar"] == want.cigar
        assert got["seq"] == want.seq
        assert got["mapq"] == want.mapq
        if not want.flag & 0x4:
            assert refs[got["ref_id"]][0] == want.rname
            assert got["pos"] == want.pos - 1
            assert got["tags"]["NM"] == want.nm
            assert got["tags"]["MD"] == want.md
            assert got["tags"]["XM"] == want.xm


def test_bgzf_eof_marker(rng):
    buf = io.BytesIO()
    w = BamWriter(buf, ["c"], [100])
    w.close()
    assert buf.getvalue().endswith(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
