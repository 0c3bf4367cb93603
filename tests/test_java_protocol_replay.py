"""Byte-level replay of the Java client's bridge protocol.

This image has no JDK (tests/test_java_binding.py skips), so this test
pins down everything EXCEPT the JVM itself: it reproduces, byte for byte,
the request lines ssw/Aligner.java's StringBuilders emit (field order,
number formatting, the safe overload's dynamic-alphabet conversion and
matrix flattening from ssw/Example.java's inputs), drives them through a
real `python -m ssw_tpu.bridge` worker subprocess over a pipe, and parses
the responses with a faithful port of Aligner.parse/intField (including
its substring-scanning quirks and the alignBatch depth-counting array
splitter).  If these pass, a JVM run can only fail in javac/java
themselves.  Mirrors ref: src/ssw/Aligner.java:76-160, src/ssw/Example.java.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def worker():
    env = dict(os.environ, SSW_TPU_BRIDGE_PLATFORM="cpu")
    p = subprocess.Popen(
        [sys.executable, "-m", "ssw_tpu.bridge"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, cwd=REPO, text=True, encoding="utf-8",
        env=env)
    yield p
    p.stdin.close()
    p.wait(timeout=60)


# -- faithful ports of the Java client's helpers --------------------------

def to_json(arr):
    """Aligner.toJson: signed byte values, comma-joined."""
    return "[" + ",".join(str(b if b < 128 else b - 256) for b in arr) + "]"


def convert_to_numeric(lookup, sequence, ignore_case):
    out = bytearray()
    for ch in sequence:
        b = ch
        if ignore_case:
            b = ord(chr(b).upper())
        if lookup.get(b, -1) == -1:
            lookup[b] = lookup[256]
            lookup[256] += 1
        out.append(lookup[b])
    return bytes(out)


def flatten(lookup, matrix):
    size = lookup[256]
    flat = bytearray(size * size)
    for i, row in enumerate(matrix):
        newi = lookup.get(i, -1) if i < 257 else -1
        if newi == -1:
            continue
        for j, score in enumerate(row):
            newj = lookup.get(j, -1) if j < 257 else -1
            if newj == -1:
                continue
            assert -128 <= score <= 127
            flat[newi * size + newj] = score & 0xFF
    return bytes(flat)


def int_field(json, name, dflt):
    k = json.find('"' + name + '":')
    if k < 0:
        return dflt
    s = k + len(name) + 3
    e = s
    while e < len(json) and (json[e] == "-" or json[e].isdigit()):
        e += 1
    return int(json[s:e])


def parse(line):
    assert '"error"' not in line, line
    if '"result":null' in line:
        return None
    cigar = ""
    k = line.find('"cigar_string":')
    if k >= 0:
        s = line.index('"', k + 15) + 1
        e = line.index('"', s)
        cigar = line[s:e]
    return dict(
        score1=int_field(line, "score1", 0),
        score2=int_field(line, "score2", 0),
        ref_begin1=int_field(line, "ref_begin1", -1),
        ref_end1=int_field(line, "ref_end1", 0),
        read_begin1=int_field(line, "read_begin1", -1),
        read_end1=int_field(line, "read_end1", 0),
        ref_end2=int_field(line, "ref_end2", 0),
        cigar=cigar)


def build_align_request(rid, read, flat, n, score_size, ref, gap_open,
                        gap_extend, flag, filter_score, filter_distance,
                        mask_len):
    """Byte-exact twin of Aligner.align's StringBuilder."""
    return ('{"id":%d,"read":%s,"ref":%s,"matrix":%s,"n":%d,'
            '"score_size":%d,"gap_open":%d,"gap_extend":%d,"flag":%d,'
            '"filter_score":%d,"filter_distance":%d,"mask_len":%d}\n'
            % (rid, to_json(read), to_json(ref), to_json(flat), n,
               score_size, gap_open, gap_extend, flag, filter_score,
               filter_distance, mask_len))


def roundtrip(worker, line):
    worker.stdin.write(line)
    worker.stdin.flush()
    out = worker.stdout.readline()
    assert out, "worker died"
    return out


def test_example_pair_over_the_wire(worker):
    """Replays exactly what ssw.Example's Aligner.align(...) call sends."""
    match, mismatch = 2, 2
    matrix = [[0] * 128 for _ in range(128)]
    for i in "ACGT":
        for j in "ACGT":
            matrix[ord(i)][ord(j)] = match if i == j else -mismatch
    read = b"CTGAGCCGGTAAATC"
    ref = b"CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
    lookup = {256: 0}
    read_num = convert_to_numeric(lookup, read, True)
    ref_num = convert_to_numeric(lookup, ref, True)
    flat = flatten(lookup, matrix)
    n = lookup[256]
    # flag 0x01 = always return begin + cigar, the reference overload's
    # choice (src/ssw/Aligner.java:39,104); replaying the old 0x0f here
    # exposed that it arms the bit-6 distance filter and kills the cigar
    line = build_align_request(0, read_num, flat, n, 2, ref_num, 3, 1,
                               0x01, 0, 0, max(15, len(read_num) // 2))
    aln = parse(roundtrip(worker, line))
    # the reference demo pair's known result (src/example.c block)
    assert aln["score1"] == 21
    assert aln["ref_begin1"] == 8
    assert aln["ref_end1"] == 21
    assert aln["read_begin1"] == 0
    assert aln["read_end1"] == 14
    assert aln["cigar"] == "9M1I5M"


def test_align_batch_frame_and_splitter(worker):
    """Replays Aligner.alignBatch's wire frame and its depth-counting
    result splitter (maskLen < 0 -> per-read default)."""
    reads = [b"\x00\x01\x02\x03\x00\x01\x02\x03",
             b"\x03\x02\x01\x00" * 5,
             b"\x00\x00\x00\x00\x00\x00"]
    ref = bytes([0, 1, 2, 3] * 12)
    flat = bytes((2 if i == j else 256 - 2) for i in range(4)
                 for j in range(4))
    items = []
    for rd in reads:
        ml = max(15, len(rd) // 2)
        items.append(
            '{"read":%s,"ref":%s,"matrix":%s,"n":4,"score_size":2,'
            '"gap_open":3,"gap_extend":1,"flag":15,"filter_score":0,'
            '"filter_distance":0,"mask_len":%d}'
            % (to_json(rd), to_json(ref), to_json(flat), ml))
    line = '{"id":1,"batch":[' + ",".join(items) + "]}\n"
    out = roundtrip(worker, line)
    assert '"error"' not in out
    s = out.index('"result":[') + 10
    e = out.rindex("]")
    body = out[s:e]
    items_out, depth, start = [], 0, 0
    for i, c in enumerate(body):
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        elif c == "," and depth == 0:
            items_out.append(body[start:i])
            start = i + 1
    items_out.append(body[start:])
    assert len(items_out) == len(reads)
    alns = [None if it == "null" else parse(it) for it in items_out]
    # positional: read 0 and 1 are exact repeats of ref prefixes
    assert alns[0]["score1"] == 2 * len(reads[0])
    assert alns[1]["score1"] > 0
    for a in alns:
        assert a is None or a["score1"] >= 0
