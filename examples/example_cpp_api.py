"""Minimal embedding example — the C++-wrapper-shaped surface.

Mirrors the reference's example.cpp flow (ref: src/example.cpp:22-53):
construct an Aligner with default penalties, align one pair of raw strings,
inspect the Alignment fields.

Run:  python examples/example_cpp_api.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssw_tpu.api import Aligner, Filter

REF = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
READ = "CTGAGCCGGTAAATC"


def main():
    aligner = Aligner()          # match 2, mismatch 2, gapO 3, gapE 1
    flag, alignment = aligner.align(READ, REF, Filter(), mask_len=15)

    print("===== SSW result =====")
    print(f"Best Smith-Waterman score:\t{alignment.sw_score}")
    print(f"Next-best Smith-Waterman score:\t{alignment.sw_score_next_best}")
    print(f"Reference start:\t{alignment.ref_begin}")
    print(f"Reference end:\t{alignment.ref_end}")
    print(f"Query start:\t{alignment.query_begin}")
    print(f"Query end:\t{alignment.query_end}")
    print(f"Next-best reference end:\t{alignment.ref_end_next_best}")
    print(f"Number of mismatches:\t{alignment.mismatches}")
    print(f"Cigar: {alignment.cigar_string}")
    print("======================")


if __name__ == "__main__":
    main()
