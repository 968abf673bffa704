"""Differential spec test for the chunk-vectorized FASTQ reader.

The reference below is the original per-line readline() implementation
(frozen semantics: offsets, limits, resume, phred64, whitespace handling,
error behavior).  The production FastqReader parses whole chunks with
numpy and must be behavior-identical on every input, including truncated
files, CRLF endings, files without final newlines, headers with internal
whitespace, and empty sequence lines.
"""
from __future__ import annotations

import gzip
import random

import pytest

from bitmapperbs_tpu.io.fastq import FastqReader, ReadBatch
from bitmapperbs_tpu.utils import dna


def _reference_reader(path, batch_size=4096, phred64=False, resume_offset=0,
                      resume_record=0, limit_offset=None, limit_records=None):
    fh = gzip.open(path, "rb") if str(path).endswith(".gz") \
        else open(path, "rb")
    if resume_offset:
        fh.seek(resume_offset)
    record, offset, yielded = resume_record, resume_offset, 0
    while True:
        qnames, codes, quals = [], [], []
        start = record
        while len(qnames) < batch_size:
            if limit_offset is not None and offset >= limit_offset:
                break
            if limit_records is not None \
                    and yielded + len(qnames) >= limit_records:
                break
            header = fh.readline()
            if not header:
                break
            seq = fh.readline()
            plus = fh.readline()
            qual = fh.readline()
            offset += len(header) + len(seq) + len(plus) + len(qual)
            if not qual:
                raise ValueError(f"truncated FASTQ record at {record}")
            h = header.decode().strip()
            if not h.startswith("@"):
                raise ValueError(
                    f"bad FASTQ header at record {record}: {h[:40]!r}")
            qnames.append(h[1:].split()[0] if len(h) > 1 else f"r{record}")
            codes.append(dna.encode(seq.strip()))
            q = qual.decode().strip()
            if phred64:
                q = "".join(chr(max(ord(c) - 31, 33)) for c in q)
            quals.append(q)
            record += 1
        if not qnames:
            fh.close()
            return
        yielded += len(qnames)
        yield ReadBatch(qnames, codes, quals, start, offset)


def _collect(gen):
    out = []
    try:
        for b in gen:
            out.append((b.qnames, [c.tolist() for c in b.codes], b.quals,
                        b.start_record, b.end_offset))
    except ValueError as e:
        out.append(("RAISE", str(e)))
    return out


def _random_fastq(rng):
    lines = []
    for i in range(rng.randint(0, 25)):
        name = rng.choice([f"read{i}", f"read{i} extra", f"read{i}\tx",
                           "", " spaced", f"r{i} "])
        seq = "".join(rng.choice("ACGTNacgtn")
                      for _ in range(rng.randint(0, 30)))
        eol = rng.choice(["\n", "\r\n"])
        lines.append(f"@{name}{eol}{seq}{eol}+{eol}{'I' * len(seq)}{eol}")
    data = "".join(lines)
    if rng.random() < 0.3 and data:       # truncate mid-record
        data = data[:rng.randint(1, len(data))]
    if rng.random() < 0.2:                # no final newline
        data = data.rstrip("\n")
    if rng.random() < 0.15 and data:      # stray trailing empty line
        data += "\n"
    return data


@pytest.mark.parametrize("seed", [0, 7, 23])
def test_differential_random(tmp_path, seed):
    rng = random.Random(seed)
    p = tmp_path / "d.fq"
    for _ in range(15):
        data = _random_fastq(rng)
        p.write_bytes(data.encode())
        for bs in (1, 3, 4096):
            for kw in ({}, {"phred64": True}, {"limit_records": 2},
                       {"limit_offset": max(len(data) // 2, 1)}):
                a = _collect(_reference_reader(str(p), batch_size=bs, **kw))
                b = _collect(iter(FastqReader(str(p), batch_size=bs, **kw)))
                assert a == b, (bs, kw, data[-80:])


def test_differential_edges(tmp_path):
    p = tmp_path / "e.fq"
    for data in ("", "\n", "@\nACGT\n+\nIIII\n", "@x\n\n+\n\n",
                 "@a b\nAC\n+\nII\n@c\nGG\n+\nII",
                 "not_a_header\nAC\n+\nII\n",
                 "@only_header",
                 "@r\nAC\n+\nII\n@t\nGG\n+"):
        p.write_bytes(data.encode())
        for bs in (1, 4096):
            a = _collect(_reference_reader(str(p), batch_size=bs))
            b = _collect(iter(FastqReader(str(p), batch_size=bs)))
            assert a == b, (bs, repr(data))


def test_differential_resume_and_gz(tmp_path):
    data = "".join(f"@r{i} x\nACGTACGT\n+\nIIIIIIII\n" for i in range(50))
    p = tmp_path / "r.fq"
    p.write_bytes(data.encode())
    full = _collect(_reference_reader(str(p), batch_size=7))
    for (qn, _cd, _ql, sr, eo) in full[:-1]:
        kw = dict(batch_size=7, resume_offset=eo, resume_record=sr + len(qn))
        assert _collect(_reference_reader(str(p), **kw)) == \
            _collect(iter(FastqReader(str(p), **kw)))
    pz = tmp_path / "r.fq.gz"
    with gzip.open(pz, "wb") as f:
        f.write(data.encode())
    assert _collect(_reference_reader(str(pz), batch_size=9)) == \
        _collect(iter(FastqReader(str(pz), batch_size=9)))


def test_tiny_chunks(tmp_path, monkeypatch):
    """Carry/boundary logic under pathologically small chunks."""
    monkeypatch.setattr(FastqReader, "_CHUNK", 13)
    rng = random.Random(3)
    p = tmp_path / "t.fq"
    for _ in range(10):
        data = _random_fastq(rng)
        p.write_bytes(data.encode())
        a = _collect(_reference_reader(str(p), batch_size=3))
        b = _collect(iter(FastqReader(str(p), batch_size=3)))
        assert a == b, repr(data[-80:])


def test_prefetcher_order_and_exceptions():
    """Prefetcher yields the source's items in order and re-raises its
    exception at the consumer."""
    from bitmapperbs_tpu.io.fastq import Prefetcher

    assert list(Prefetcher(iter(range(50)), depth=3)) == list(range(50))

    def boom():
        yield 1
        yield 2
        raise ValueError("decode failed")

    it = Prefetcher(boom())
    assert next(it) == 1 and next(it) == 2
    try:
        next(it)
    except ValueError as e:
        assert "decode failed" in str(e)
    else:
        raise AssertionError("exception not propagated")


def test_prefetcher_close_unblocks_pump():
    """Abandoning the stream closes the pump thread (no stuck thread / fd)."""
    import threading

    from bitmapperbs_tpu.io.fastq import Prefetcher

    before = threading.active_count()
    pf = Prefetcher(iter(range(1000)), depth=2)
    assert next(pf) == 0
    pf.close()
    for _ in range(50):
        if threading.active_count() <= before:
            break
        import time
        time.sleep(0.05)
    assert not pf._t.is_alive()
    # post-exception iteration terminates instead of blocking
    def boom():
        raise RuntimeError("x")
        yield
    it = Prefetcher(boom())
    try:
        next(it)
    except RuntimeError:
        pass
    try:
        next(it)
    except StopIteration:
        pass
