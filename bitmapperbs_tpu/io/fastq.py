"""FASTQ reading and batching (SURVEY.md C17).

Streaming reader for FASTQ / FASTQ.gz (zlib -- the same native codec the
reference links), yielding fixed-size batches for the device pipeline.
The reader tracks a byte-offset cursor for checkpoint/resume (SURVEY.md
section 5.3/5.4: batch-granular resume of a streaming run).
"""
from __future__ import annotations

import dataclasses
import gzip
import io
import os

import numpy as np

from bitmapperbs_tpu.utils import dna


@dataclasses.dataclass
class ReadBatch:
    qnames: list[str]
    codes: list[np.ndarray]
    quals: list[str]
    start_record: int          # index of first read in this batch
    end_offset: int            # uncompressed byte offset after this batch

    def __len__(self):
        return len(self.qnames)


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


class FastqReader:
    """Iterates ReadBatches; resumable from (record_index, byte_offset).

    limit_offset / limit_records bound the reader to a shard of the file
    (multi-host byte-range input sharding, parallel/multihost.py): the
    reader stops before any record starting at/after limit_offset, or after
    yielding limit_records records, whichever comes first."""

    def __init__(self, path, batch_size: int = 4096, phred64: bool = False,
                 resume_offset: int = 0, resume_record: int = 0,
                 limit_offset: int | None = None,
                 limit_records: int | None = None):
        self.path = path
        self.batch_size = batch_size
        self.phred64 = phred64
        self.limit_offset = limit_offset
        self.limit_records = limit_records
        self._fh = _open(path)
        if resume_offset:
            self._fh.seek(resume_offset)
        self._record = resume_record
        self._offset = resume_offset
        self._yielded = 0

    def __iter__(self):
        return self

    def __next__(self) -> ReadBatch:
        qnames, codes, quals = [], [], []
        start = self._record
        while len(qnames) < self.batch_size:
            if self.limit_offset is not None \
                    and self._offset >= self.limit_offset:
                break
            if self.limit_records is not None \
                    and self._yielded + len(qnames) >= self.limit_records:
                break
            header = self._fh.readline()
            if not header:
                break
            seq = self._fh.readline()
            plus = self._fh.readline()
            qual = self._fh.readline()
            self._offset += len(header) + len(seq) + len(plus) + len(qual)
            if not qual:
                raise ValueError(f"truncated FASTQ record at {self._record}")
            h = header.decode().strip()
            if not h.startswith("@"):
                raise ValueError(f"bad FASTQ header at record {self._record}: {h[:40]!r}")
            qnames.append(h[1:].split()[0] if len(h) > 1 else f"r{self._record}")
            codes.append(dna.encode(seq.strip()))
            q = qual.decode().strip()
            if self.phred64:
                q = "".join(chr(max(ord(c) - 31, 33)) for c in q)
            quals.append(q)
            self._record += 1
        if not qnames:
            self._fh.close()
            raise StopIteration
        self._yielded += len(qnames)
        return ReadBatch(qnames, codes, quals, start, self._offset)


def read_pairs(path1, path2, batch_size: int = 4096, phred64: bool = False,
               resume_offsets=(0, 0), resume_record: int = 0,
               limit_records: int | None = None):
    """Synchronized paired FASTQ iteration -> (batch1, batch2) tuples.

    Resumable from (per-file byte offsets, pair record index) -- the PE
    cursor checkpoint (SURVEY.md 5.3/5.4).  limit_records bounds BOTH mates
    (byte-range multi-host sharding: mate files are record-count aligned)."""
    r1 = FastqReader(path1, batch_size, phred64,
                     resume_offset=resume_offsets[0],
                     resume_record=resume_record,
                     limit_records=limit_records)
    r2 = FastqReader(path2, batch_size, phred64,
                     resume_offset=resume_offsets[1],
                     resume_record=resume_record,
                     limit_records=limit_records)
    while True:
        try:
            b1 = next(r1)
        except StopIteration:
            try:
                next(r2)
            except StopIteration:
                return
            raise ValueError("mate files have different read counts")
        try:
            b2 = next(r2)
        except StopIteration:
            raise ValueError("mate files have different read counts")
        if len(b1) != len(b2):
            raise ValueError("mate files have different read counts")
        yield b1, b2


def write_fastq(path, reads, qnames=None, quals=None):
    """Test/fixture helper."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        for i, r in enumerate(reads):
            qn = qnames[i] if qnames else f"r{i}"
            q = quals[i] if quals else "I" * len(r)
            f.write(f"@{qn}\n{dna.decode(r)}\n+\n{q}\n")
