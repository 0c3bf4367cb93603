"""Streaming FASTA/FASTQ reader with kseq-compatible record semantics.

Reproduces the observable behavior of the reference's kseq.h parser
(ref: src/kseq.h:139-221):
  * any bytes before the first '>' or '@' line-start are skipped silently
    (a headerless file yields zero records, like demo/target2.fa);
  * a record's name runs to the first whitespace; the rest of the header
    line is the comment;
  * sequence lines accumulate until a line starting with '>', '@' or '+';
    blank lines are skipped;
  * '+' starts a quality block read until the quality length reaches the
    sequence length (so FASTA records mixed into FASTQ parse like kseq).

Transparently handles gzip input (ref: KSEQ_INIT(gzFile, gzread),
src/main.c:40).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator


@dataclass
class FastxRecord:
    name: str
    comment: str
    seq: str
    qual: str | None = None


def _open(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f)
    return f


def read_fastx(path: str, chunk: int = 1 << 20) -> Iterator[FastxRecord]:
    """Iterate records; kseq-equivalent state machine over buffered lines."""
    with _open(path) as f:
        buf = io.BufferedReader(f) if not isinstance(f, io.BufferedReader) else f
        header: bytes | None = None
        # skip until the first record marker at line start
        for raw in buf:
            if raw[:1] in (b">", b"@"):
                header = raw
                break
        while header is not None:
            hdr = header[1:].rstrip(b"\r\n")
            parts = hdr.split(None, 1)
            name = parts[0].decode("latin-1") if parts else ""
            comment = parts[1].decode("latin-1") if len(parts) > 1 else ""
            seq_parts: list[bytes] = []
            qual: bytes | None = None
            header = None
            for raw in buf:
                c = raw[:1]
                if c == b"+":
                    # quality block: read until qual length >= seq length
                    seq_len = sum(len(p) for p in seq_parts)
                    q_parts: list[bytes] = []
                    q_len = 0
                    for qraw in buf:
                        q_parts.append(qraw.rstrip(b"\r\n"))
                        q_len = sum(len(p) for p in q_parts)
                        if q_len >= seq_len:
                            break
                    qual = b"".join(q_parts)
                    break
                if c in (b">", b"@"):
                    header = raw
                    break
                s = raw.rstrip(b"\r\n")
                if s:
                    seq_parts.append(s)
            else:
                pass
            seq = b"".join(seq_parts)
            yield FastxRecord(name, comment, seq.decode("latin-1"),
                              qual.decode("latin-1") if qual is not None else None)
            if header is None:
                # find next record if we stopped at EOF or after quality
                for raw in buf:
                    if raw[:1] in (b">", b"@"):
                        header = raw
                        break


def read_fastx_native(path: str, batch: int = 4096) -> Iterator[FastxRecord]:
    """Native C++ reader (ssw_tpu/native/fastio.cpp); kseq-equivalent.
    Raises ImportError when the native library is unavailable."""
    import ctypes

    import numpy as np

    from ssw_tpu.native import build as native_build

    lib = native_build.load()
    if lib is None:
        raise ImportError("native fastio unavailable")
    h = lib.sswtpu_fastx_open(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        while True:
            n = lib.sswtpu_fastx_batch(h, batch)
            if n == 0:
                break
            size = lib.sswtpu_fastx_arena_size(h)
            arena = ctypes.string_at(lib.sswtpu_fastx_arena(h), size)
            offs = np.ctypeslib.as_array(
                ctypes.cast(lib.sswtpu_fastx_offsets(h),
                            ctypes.POINTER(ctypes.c_int64)),
                shape=(int(n) * 8,)).copy()
            for i in range(int(n)):
                o = offs[i * 8: i * 8 + 8]
                name = arena[o[0]:o[0] + o[1]].decode("latin-1")
                comment = arena[o[2]:o[2] + o[3]].decode("latin-1")
                seq = arena[o[4]:o[4] + o[5]].decode("latin-1")
                qual = (None if o[6] < 0
                        else arena[o[6]:o[6] + o[7]].decode("latin-1"))
                yield FastxRecord(name, comment, seq, qual)
    finally:
        lib.sswtpu_fastx_close(h)


def read_fastx_auto(path: str) -> Iterator[FastxRecord]:
    """Native reader when available, pure-Python otherwise."""
    try:
        yield from read_fastx_native(path)
    except ImportError:
        yield from read_fastx(path)


def read_fastx_all(path: str) -> list[FastxRecord]:
    return list(read_fastx_auto(path))
