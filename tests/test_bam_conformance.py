"""Independent BAM/BGZF conformance suite (SURVEY.md C18 "byte-exact").

Unlike test_bam.py (which inflates the whole stream with gzip.decompress and
shares no structure checks), this decoder is written from the BGZF/BAM specs
alone and deliberately imports nothing from bitmapperbs_tpu.io.bam except the
writer under test: it walks gzip members via the BC extra subfield, raw-
inflates each block, verifies every per-block CRC32/ISIZE/BSIZE, then decodes
the binary records with its own tables and compares field-by-field against
the SAM text writer's output for the same run.  An encoder-table bug that a
shared-table round-trip would mask (e.g. a wrong nibble code or a misclamped
qual) fails here.
"""
import io
import struct
import zlib

import pytest

from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.io.bam import BamWriter
from bitmapperbs_tpu.io.sam import SamRecord, SamWriter
from bitmapperbs_tpu.oracle.paired import map_batch_pe
from bitmapperbs_tpu.oracle.pipeline import map_batch_se
from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                            simulate_pairs, simulate_reads)

# spec tables, written out from the hts-specs SAM/BAM document (not imported
# from the encoder)
SEQ_CODES = "=ACMGRSVTWYHKDBN"
CIGAR_OPS = "MIDNSHP=X"
BGZF_EOF_LEN = 28


def walk_bgzf_blocks(data: bytes):
    """Yield (inflated_payload, block_len) per BGZF block, verifying the
    container invariants of each member from scratch."""
    off = 0
    while off < len(data):
        assert data[off:off + 4] == b"\x1f\x8b\x08\x04", \
            f"bad gzip/FEXTRA magic at {off}"
        xlen, = struct.unpack_from("<H", data, off + 10)
        # find the BC subfield inside the extra area
        p, end = off + 12, off + 12 + xlen
        bsize = None
        while p < end:
            si1, si2, slen = data[p], data[p + 1], \
                struct.unpack_from("<H", data, p + 2)[0]
            if (si1, si2) == (66, 67):
                assert slen == 2
                bsize, = struct.unpack_from("<H", data, p + 4)
            p += 4 + slen
        assert bsize is not None, "missing BC subfield"
        block = data[off:off + bsize + 1]
        cdata = block[12 + xlen:-8]
        crc, isize = struct.unpack_from("<II", block, len(block) - 8)
        payload = zlib.decompressobj(-15).decompress(cdata)
        assert zlib.crc32(payload) & 0xFFFFFFFF == crc, "CRC32 mismatch"
        assert len(payload) == isize, "ISIZE mismatch"
        assert len(payload) <= 65536
        yield payload, bsize + 1
        off += bsize + 1
    assert off == len(data), "trailing garbage after last block"


def inflate_bgzf(data: bytes) -> bytes:
    blocks = list(walk_bgzf_blocks(data))
    # last block must be the 28-byte empty EOF marker
    payload, blen = blocks[-1]
    assert payload == b"" and blen == BGZF_EOF_LEN, "missing BGZF EOF block"
    return b"".join(p for p, _ in blocks)


def decode_bam_stream(data: bytes):
    raw = inflate_bgzf(data)
    assert raw[:4] == b"BAM\x01"
    off = 4
    l_text, = struct.unpack_from("<i", raw, off); off += 4
    text = raw[off:off + l_text].decode(); off += l_text
    n_ref, = struct.unpack_from("<i", raw, off); off += 4
    refs = []
    for _ in range(n_ref):
        l_name, = struct.unpack_from("<i", raw, off); off += 4
        refs.append(raw[off:off + l_name - 1].decode()); off += l_name
        off += 4  # l_ref
    recs = []
    while off < len(raw):
        bs, = struct.unpack_from("<i", raw, off); off += 4
        body = raw[off:off + bs]; off += bs
        assert len(body) == bs, "truncated record"
        (ref_id, pos, l_rn, mapq, _bin, n_cig, flag, l_seq,
         nref, npos, tlen) = struct.unpack_from("<iiBBHHHiiii", body, 0)
        p = 32
        qname = body[p:p + l_rn - 1].decode(); p += l_rn
        cig = []
        for _ in range(n_cig):
            v, = struct.unpack_from("<I", body, p); p += 4
            cig.append((v >> 4, CIGAR_OPS[v & 15]))
        seq = "".join(SEQ_CODES[(body[p + k // 2] >> (0 if k % 2 else 4)) & 15]
                      for k in range(l_seq))
        p += (l_seq + 1) // 2
        qraw = body[p:p + l_seq]; p += l_seq
        if l_seq and all(q == 0xFF for q in qraw):
            qual = "*"
        else:
            assert all(q <= 93 for q in qraw), "qual out of phred33 range"
            qual = "".join(chr(q + 33) for q in qraw)
        tags = {}
        order = []
        while p < len(body):
            tag = body[p:p + 2].decode(); typ = chr(body[p + 2]); p += 3
            if typ == "i":
                tags[tag], = struct.unpack_from("<i", body, p); p += 4
            elif typ == "Z":
                e = body.index(0, p)
                tags[tag] = body[p:e].decode(); p = e + 1
            else:
                raise AssertionError(f"unexpected tag type {typ!r}")
            order.append(tag)
        recs.append(dict(qname=qname, flag=flag, ref_id=ref_id, pos=pos,
                         mapq=mapq,
                         cigar="".join(f"{n}{o}" for n, o in cig) or "*",
                         seq=seq or "*", qual=qual if l_seq else "*",
                         nref=nref, npos=npos, tlen=tlen, tags=tags,
                         tag_order=order))
    return text, refs, recs


def parse_sam_line(line: str):
    f = line.rstrip("\n").split("\t")
    tags = {}
    order = []
    for t in f[11:]:
        tag, typ, val = t.split(":", 2)
        tags[tag] = int(val) if typ == "i" else val
        order.append(tag)
    return dict(qname=f[0], flag=int(f[1]), rname=f[2], pos=int(f[3]),
                mapq=int(f[4]), cigar=f[5], rnext=f[6], pnext=int(f[7]),
                tlen=int(f[8]), seq=f[9], qual=f[10], tags=tags,
                tag_order=order)


def assert_bam_matches_sam(bam_bytes: bytes, sam_text: str):
    text, refs, brecs = decode_bam_stream(bam_bytes)
    sam_lines = [ln for ln in sam_text.splitlines() if not ln.startswith("@")]
    hdr_lines = [ln for ln in sam_text.splitlines() if ln.startswith("@")]
    assert text.rstrip("\n").splitlines() == hdr_lines
    assert len(brecs) == len(sam_lines)
    for b, line in zip(brecs, sam_lines):
        s = parse_sam_line(line)
        assert b["qname"] == s["qname"]
        assert b["flag"] == s["flag"]
        brname = refs[b["ref_id"]] if b["ref_id"] >= 0 else "*"
        assert brname == s["rname"]
        assert b["pos"] == s["pos"] - 1
        assert b["mapq"] == s["mapq"]
        assert b["cigar"] == s["cigar"]
        assert b["seq"] == s["seq"]
        assert b["qual"] == s["qual"]
        bnext = refs[b["nref"]] if b["nref"] >= 0 else "*"
        snext = s["rname"] if s["rnext"] == "=" else s["rnext"]
        assert bnext == snext
        assert b["npos"] == s["pnext"] - 1
        assert b["tlen"] == s["tlen"]
        assert b["tags"] == s["tags"]
        assert b["tag_order"] == s["tag_order"]


def _write_both(idx, recs):
    sbuf = io.StringIO()
    sw = SamWriter(sbuf, idx.genome.names, idx.genome.lengths)
    bbuf = io.BytesIO()
    bw = BamWriter(bbuf, idx.genome.names, idx.genome.lengths)
    for r in recs:
        sw.write(r)
        bw.write(r)
    bw.close()
    return bbuf.getvalue(), sbuf.getvalue()


def test_bam_conformance_se(rng):
    idx = build_index(random_genome_fasta(rng, contigs=(4000, 2500)))
    sims = simulate_reads(idx.genome, 30, read_len=80, seed=5, sub_rate=0.02,
                          indel_rate=0.01)
    cfg = AlignerConfig(max_errors=4, indels=True)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims],
                        [s.qual for s in sims])
    assert any("I" in r.cigar or "D" in r.cigar for r in recs), \
        "want at least one gapped CIGAR in the conformance corpus"
    bam, sam = _write_both(idx, recs)
    assert_bam_matches_sam(bam, sam)


def test_bam_conformance_pe(rng):
    idx = build_index(random_genome_fasta(rng, contigs=(6000,)))
    sims = simulate_pairs(idx.genome, 12, read_len=70, seed=9, sub_rate=0.01)
    cfg = AlignerConfig(max_errors=3, indels=True, paired=True,
                        min_insert=120, max_insert=600)
    recs = map_batch_pe(idx, cfg, [(a.codes, b.codes) for a, b in sims],
                        [(a.qual, b.qual) for a, b in sims])
    assert any(r.rnext == "=" for r in recs), "want proper pairs"
    bam, sam = _write_both(idx, recs)
    assert_bam_matches_sam(bam, sam)


def test_bam_conformance_resume_append(rng):
    """Resume path: header written once, a second BamWriter with
    write_header=False appends to the flushed block boundary; the
    concatenated stream must stay spec-valid and match the full SAM."""
    idx = build_index(random_genome_fasta(rng, contigs=(3000,)))
    sims = simulate_reads(idx.genome, 16, read_len=60, seed=2, sub_rate=0.01)
    cfg = AlignerConfig(max_errors=2, indels=True)
    recs = map_batch_se(idx, cfg, [s.codes for s in sims],
                        [s.qual for s in sims])
    bbuf = io.BytesIO()
    w1 = BamWriter(bbuf, idx.genome.names, idx.genome.lengths)
    for r in recs[:7]:
        w1.write(r)
    w1.flush()  # checkpoint: BGZF block boundary
    w2 = BamWriter(bbuf, idx.genome.names, idx.genome.lengths,
                   write_header=False)
    for r in recs[7:]:
        w2.write(r)
    w2.close()
    sbuf = io.StringIO()
    sw = SamWriter(sbuf, idx.genome.names, idx.genome.lengths)
    for r in recs:
        sw.write(r)
    assert_bam_matches_sam(bbuf.getvalue(), sbuf.getvalue())


def test_bam_rejects_malformed_qual():
    buf = io.BytesIO()
    w = BamWriter(buf, ["c"], [100])
    rec = SamRecord(qname="q", flag=0, rname="c", pos=1, mapq=30,
                    cigar="4M", seq="ACGT", qual="II\x1fI")
    with pytest.raises(ValueError, match="quality"):
        w.write(rec)
