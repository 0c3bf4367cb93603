"""Minimal embedding example — the C-API-shaped surface.

Mirrors the reference's example.c flow (ref: src/example.c:105-156):
build a scoring matrix, encode the pair, ssw_init -> Profile,
ssw_align -> align(), print a BLAST-like block.

Run:  python examples/example_c_api.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import io

from ssw_tpu import api
from ssw_tpu.core.encoding import NT_TABLE, dna_matrix, encode_dna
from ssw_tpu.io import writers

REF = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
READ = "CTGAGCCGGTAAATC"


def main():
    mat = dna_matrix(match=2, mismatch=2)

    # profile build (ssw_init equivalent) + alignment with flag=1:
    # always report the best alignment beginning position and cigar
    profile = api.Profile(encode_dna(READ), mat, score_size=2)
    result = api.align(profile, encode_dna(REF), gapO=3, gapE=1,
                       flag=1, mask_len=15)

    buf = io.StringIO()
    writers.blast_like(buf, result, "ref", "read", REF, READ, NT_TABLE, 0)
    print(buf.getvalue(), end="")


if __name__ == "__main__":
    main()
