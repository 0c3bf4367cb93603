"""Cross-validation of the C++-wrapper-shaped API (api.Aligner) against the
reference's actual StripedSmithWaterman::Aligner, via a tiny harness binary
compiled from the read-only mount.  Covers ConvertAlignment's soft clips,
CalculateNumberMismatch's '='/'X' rewrite + NM, and all coordinate fields.
Skipped when the mount or toolchain is unavailable."""

import os
import random
import subprocess

import pytest

from ssw_tpu.api import Aligner, Filter

REF_SRC = "/root/reference/src"

HARNESS = r"""
#include <cstdio>
#include <cstdlib>
#include <string>
#include <algorithm>
#include "ssw_cpp.h"

int main(int argc, char** argv) {
    if (argc < 3) return 2;
    std::string query = argv[1], ref = argv[2];
    int match = argc > 3 ? atoi(argv[3]) : 2;
    int mismatch = argc > 4 ? atoi(argv[4]) : 2;
    int gapo = argc > 5 ? atoi(argv[5]) : 3;
    int gape = argc > 6 ? atoi(argv[6]) : 1;
    StripedSmithWaterman::Aligner aligner(match, mismatch, gapo, gape);
    StripedSmithWaterman::Filter filter;
    StripedSmithWaterman::Alignment aln;
    int32_t maskLen = std::max<int32_t>(15, query.size() / 2);
    uint16_t flag = aligner.Align(query.c_str(), query.size(), ref.c_str(),
                                  ref.size(), filter, aln, maskLen);
    printf("%u %d %d %d %d %d %d %d %d %s\n", flag, aln.sw_score,
           aln.sw_score_next_best, aln.ref_begin, aln.ref_end,
           aln.query_begin, aln.query_end, aln.ref_end_next_best,
           aln.mismatches, aln.cigar_string.c_str());
    return 0;
}
"""


@pytest.fixture(scope="module")
def cpp_harness(tmp_path_factory):
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference mount unavailable")
    d = tmp_path_factory.mktemp("cppval")
    (d / "main.cpp").write_text(HARNESS)
    if subprocess.run(["gcc", "-O2", "-c", os.path.join(REF_SRC, "ssw.c"),
                       "-o", str(d / "ssw.o")],
                      capture_output=True).returncode != 0:
        pytest.skip("cannot compile reference ssw.c")
    r = subprocess.run(
        ["g++", "-O2", f"-I{REF_SRC}", "-o", str(d / "cppval"),
         str(d / "main.cpp"), os.path.join(REF_SRC, "ssw_cpp.cpp"),
         str(d / "ssw.o"), "-lm", "-lz"], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"cannot build harness: {r.stderr[:200]}")
    return str(d / "cppval")


def _ours(query, ref, m, x, o, e):
    flag, a = Aligner(m, x, o, e).align(query, ref, Filter(),
                                        mask_len=max(15, len(query) // 2))
    return (f"{flag} {a.sw_score} {a.sw_score_next_best} {a.ref_begin} "
            f"{a.ref_end} {a.query_begin} {a.query_end} "
            f"{a.ref_end_next_best} {a.mismatches} {a.cigar_string}").strip()


def _theirs(binary, query, ref, m, x, o, e):
    r = subprocess.run([binary, query, ref, str(m), str(x), str(o), str(e)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[:200]
    return r.stdout.strip()


def test_example_pair(cpp_harness):
    q, r = "CTGAGCCGGTAAATC", "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
    assert _ours(q, r, 2, 2, 3, 1) == _theirs(cpp_harness, q, r, 2, 2, 3, 1)


@pytest.mark.parametrize("seed", [3, 7, 19])
def test_fuzz_cpp_wrapper_fields(cpp_harness, seed):
    rng = random.Random(seed)
    for penalties in ((2, 2, 3, 1), (1, 3, 5, 2), (3, 1, 2, 2)):
        for _ in range(4):
            ref_len = rng.randrange(60, 600)
            ref = "".join(rng.choice("ACGT") for _ in range(ref_len))
            ln = rng.randrange(20, min(150, ref_len))
            if rng.random() < 0.75:
                start = rng.randrange(0, ref_len - ln)
                q = list(ref[start:start + ln])
                for _ in range(rng.randrange(0, max(1, ln // 8))):
                    q[rng.randrange(len(q))] = rng.choice("ACGT")
                query = "".join(q)
            else:
                query = "".join(rng.choice("ACGT") for _ in range(ln))
            m, x, o, e = penalties
            got = _ours(query, ref, m, x, o, e)
            want = _theirs(cpp_harness, query, ref, m, x, o, e)
            assert got == want, (query, ref, penalties)
