"""Embedding example — the ssw_lib compatibility surface.

Shows how a script written against the reference's `ssw_lib.py` ctypes
binding (ref: src/ssw_lib.py:94-197, driven as in src/pyssw.py:246-279)
ports mechanically: same class names, same call order, same fields — but
no libssw.so to build or load.

Run:  python examples/example_ssw_lib.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssw_tpu import ssw_lib
from ssw_tpu.core.cigar import cigar_int_to_len, cigar_int_to_op
from ssw_tpu.core.encoding import NT_TABLE

REF = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
READ = "CTGAGCCGGTAAATC"


def main():
    # reference-style setup: flat matrix + integer-encoded sequences
    match, mismatch = 2, 2
    n = 5
    mat = [match if i == j and i < 4 else (0 if i == 4 or j == 4
                                           else -mismatch)
           for i in range(n) for j in range(n)]
    q = [int(NT_TABLE[ord(c)]) for c in READ]
    r = [int(NT_TABLE[ord(c)]) for c in REF]

    ssw = ssw_lib.CSsw("/usr/lib")  # path accepted for parity, ignored
    qProfile = ssw.ssw_init(q, len(q), mat, n, 2)
    res = ssw.ssw_align(qProfile, r, len(r), 3, 1, 0x0F, 0, 32767, 15)

    a = res.contents
    cigar = "".join(f"{cigar_int_to_len(c)}{cigar_int_to_op(c)}"
                    for c in a.sCigar[: a.nCigarLen])
    print(f"optimal_alignment_score: {a.nScore}")
    print(f"sub-optimal_alignment_score: {a.nScore2}")
    print(f"target_begin: {a.nRefBeg + 1}\ttarget_end: {a.nRefEnd + 1}")
    print(f"query_begin: {a.nQryBeg + 1}\tquery_end: {a.nQryEnd + 1}")
    print(f"cigar: {cigar}")

    ssw.align_destroy(res)
    ssw.init_destroy(qProfile)
    assert a.nScore == 21, a.nScore  # the reference example's known score


if __name__ == "__main__":
    main()
