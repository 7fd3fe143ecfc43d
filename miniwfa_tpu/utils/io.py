"""FASTA/FASTQ streaming reader (host I/O layer).

Covers the capability of the reference's klib kseq parser (kseq.h:49-256 as
instantiated in main.c:10): plain or gzip-compressed input, multi-line
FASTA, FASTQ with quality lines, '>'/'@' headers, name = first whitespace
token.  Pure Python is plenty here — I/O is not on the hot path (the device
loop is), and gzip decompression is zlib-C underneath.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, Optional


@dataclass
class SeqRecord:
    name: str
    comment: str
    seq: bytes
    qual: Optional[bytes] = None

    def __len__(self) -> int:
        return len(self.seq)


def _open(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return f


def read_fastx(path: str) -> Iterator[SeqRecord]:
    """Yield records from a (possibly gzipped) FASTA/FASTQ file."""
    with _open(path) as f:
        name = comment = None
        seq_parts = []
        is_fastq = False
        line = f.readline()
        while line:
            line = line.rstrip(b"\r\n")
            if line.startswith(b">") or line.startswith(b"@"):
                if name is not None:
                    yield SeqRecord(name, comment, b"".join(seq_parts))
                is_fastq = line.startswith(b"@")
                head = line[1:].split(None, 1)
                name = head[0].decode() if head else ""
                comment = head[1].decode() if len(head) > 1 else ""
                seq_parts = []
                line = f.readline()
            elif line.startswith(b"+") and is_fastq:
                # quality section: consume as many bytes as the sequence
                seq = b"".join(seq_parts)
                qual_parts = []
                qlen = 0
                line = f.readline()
                while line and qlen < len(seq):
                    q = line.rstrip(b"\r\n")
                    qual_parts.append(q)
                    qlen += len(q)
                    line = f.readline()
                yield SeqRecord(name, comment, seq, b"".join(qual_parts))
                name = None
                seq_parts = []
            else:
                if line:
                    seq_parts.append(line)
                line = f.readline()
        if name is not None:
            yield SeqRecord(name, comment, b"".join(seq_parts))
