"""Execute the bridge wire protocol from a REAL JVM.

The reference proves its Java surface by running a JVM against the native
kernel (ref: src/ssw/Example.java:10-39 via the JNI shim
src/sswjni.c:36-60).  Our equivalent process boundary is the JSON-lines
bridge worker; bindings/java/ssw/Aligner.java is the client.  This image
has no Java *compiler* (hunt documented in tests/test_java_binding.py),
but bazel 7.4.1's embedded Zulu 21 JRE is a fully working JVM — so
tools/jvm_asm.py assembles a tiny verified class file (SswJvmPipe) that a
real JVM executes: it spawns the worker with ProcessBuilder, pipes the
byte-exact request frames ssw.Aligner emits into it, and streams the
responses back — the exact JVM<->worker boundary of the Java binding
(process spawn, pipe marshalling, stream lifecycle, exit code), executed
by HotSpot rather than replayed from Python.

Assertions: the JVM-transited responses are byte-identical to a direct
(JVM-less) worker run on the same frames, and carry the reference demo
pair's known result (score1=21, cigar 9M1I5M — ref: src/example.c).

What this still cannot cover on this image: javac itself (the .java
sources have never been compiled here).  tests/test_java_protocol_replay.py
pins the client's frame-building and parsing logic; this test pins the
JVM side of the boundary.
"""

import os
import shutil
import subprocess
import sys

import pytest

import test_java_protocol_replay as proto
from test_java_protocol_replay import (build_align_request,
                                       convert_to_numeric, flatten, to_json)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BAZEL_REAL = "/usr/local/lib/bazel/bin/bazel-real"
JVM_CACHE = "/tmp/ssw_tpu_jvm"


def _find_java():
    """A usable `java`: PATH first, else the JRE embedded in bazel-real
    (a self-extracting zip; the jdk/ subtree is ~66 MB, ~2 s to unzip)."""
    j = shutil.which("java")
    if j:
        return j
    j = os.path.join(JVM_CACHE, "embedded_tools", "jdk", "bin", "java")
    if os.path.exists(j):
        return j
    if not (os.path.exists(BAZEL_REAL) and shutil.which("unzip")):
        return None
    r = subprocess.run(
        ["unzip", "-q", "-o", BAZEL_REAL, "embedded_tools/jdk/*",
         "-d", JVM_CACHE], capture_output=True, timeout=120)
    del r  # unzip exits 1 on the exe prefix warning; trust the file check
    return j if os.path.exists(j) else None


@pytest.fixture(scope="module")
def java():
    j = _find_java()
    if not j:
        pytest.skip("no JVM on this image (PATH or bazel embedded JRE)")
    return j


@pytest.fixture(scope="module")
def harness_cls(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import jvm_asm
    finally:
        sys.path.pop(0)
    d = tmp_path_factory.mktemp("jvmcls")
    (d / "SswJvmPipe.class").write_bytes(jvm_asm.build_pipe_harness())
    return str(d)


def _example_pair_frame(rid=0):
    """The byte-exact frame ssw.Example's Aligner.align(...) call emits
    (same construction as test_java_protocol_replay)."""
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
    return build_align_request(rid, read_num, flat, lookup[256], 2, ref_num,
                               3, 1, 0x01, 0, 0, max(15, len(read_num) // 2))


def _batch_frame():
    """Aligner.alignBatch's wire form (three reads, one shared ref)."""
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
    return '{"id":1,"batch":[' + ",".join(items) + "]}\n"


def _protein_frame(rid=2):
    """A quirk-path request (BLOSUM-style negative scores): exercises the
    client's signed-byte JSON encoding (to_json emits negative numbers)
    through the JVM boundary."""
    n = 5
    mat = [[7 if i == j else -3 for j in range(n)] for i in range(n)]
    flat = bytes((v & 0xFF) for row in mat for v in row)
    read = bytes([0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0])
    ref = bytes(([0, 1, 2, 3, 4] * 8)[:37])
    return build_align_request(rid, read, flat, n, 2, ref, 10, 2, 0x0F,
                               0, 0, 15)


def _run_direct(frames: bytes) -> bytes:
    """Ground truth: the worker fed the same frames without a JVM."""
    env = dict(os.environ, SSW_TPU_BRIDGE_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-m", "ssw_tpu.bridge"],
                       input=frames, capture_output=True, timeout=600,
                       cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


def test_jvm_executes_bridge_protocol(java, harness_cls, tmp_path):
    frames = (_example_pair_frame() + _batch_frame() + _protein_frame()
              + "this is not json\n"        # error path: bridge keeps serving
              + '{"op":"shutdown"}\n').encode()
    ff = tmp_path / "frames.jsonl"
    ff.write_bytes(frames)
    env = dict(os.environ, SSW_TPU_BRIDGE_PLATFORM="cpu")
    r = subprocess.run(
        [java, "-cp", harness_cls, "SswJvmPipe", str(ff),
         sys.executable, "-m", "ssw_tpu.bridge"],
        capture_output=True, timeout=600, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-800:]

    # byte parity: JVM transit must be transparent
    assert r.stdout == _run_direct(frames)

    # and the first response is the reference demo pair's known result
    lines = r.stdout.decode().splitlines()
    aln = proto.parse(lines[0])
    assert aln["score1"] == 21
    assert aln["ref_begin1"] == 8 and aln["ref_end1"] == 21
    assert aln["read_begin1"] == 0 and aln["read_end1"] == 14
    assert aln["cigar"] == "9M1I5M"
    # protein/quirk frame: 16-residue exact repeat of the periodic ref
    assert proto.parse(lines[2])["score1"] == 7 * 16
    # the malformed line got an error response and the worker kept serving
    assert lines[3] == '{"error":"bad json"}'


def test_class_file_structure():
    """JVM-less structural check of the assembler output (runs even where
    no JVM can be found): magic, the verifier-relevant version (49 — the
    last version checked by the inference verifier, needing no
    StackMapTable), a well-formed constant pool, and the main method."""
    import struct

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import jvm_asm
    finally:
        sys.path.pop(0)
    data = jvm_asm.build_pipe_harness()
    magic, minor, major = struct.unpack_from(">IHH", data, 0)
    assert (magic, minor, major) == (0xCAFEBABE, 0, 49)
    (count,) = struct.unpack_from(">H", data, 8)
    pos, utf8s = 10, []
    for _ in range(count - 1):
        tag = data[pos]
        if tag == jvm_asm.CONSTANT_Utf8:
            (ln,) = struct.unpack_from(">H", data, pos + 1)
            utf8s.append(data[pos + 3:pos + 3 + ln].decode())
            pos += 3 + ln
        elif tag == jvm_asm.CONSTANT_Class:
            pos += 3
        else:  # Fieldref / Methodref / NameAndType
            assert tag in (jvm_asm.CONSTANT_Fieldref,
                           jvm_asm.CONSTANT_Methodref,
                           jvm_asm.CONSTANT_NameAndType)
            pos += 5
    access, this_i, super_i, n_if = struct.unpack_from(">HHHH", data, pos)
    assert access == 0x0021 and n_if == 0
    assert {"SswJvmPipe", "java/lang/Object", "main",
            "([Ljava/lang/String;)V", "Code",
            "java/lang/ProcessBuilder"} <= set(utf8s)
    # the class parses to its exact end: 0 fields, 1 method, 0 class attrs
    n_fields, n_methods = struct.unpack_from(">HH", data, pos + 8)
    assert (n_fields, n_methods) == (0, 1)
    assert data.endswith(struct.pack(">H", 0))


def test_jvm_propagates_worker_exit_code(java, harness_cls, tmp_path):
    """The harness exits with the worker's code (Example.java's smoke
    contract: a failing alignment run must fail the JVM process)."""
    ff = tmp_path / "frames.jsonl"
    ff.write_bytes(b"")
    r = subprocess.run(
        [java, "-cp", harness_cls, "SswJvmPipe", str(ff),
         sys.executable, "-c", "import sys; sys.exit(7)"],
        capture_output=True, timeout=120, cwd=REPO)
    assert r.returncode == 7
