"""ssw_tpu — TPU-native striped Smith-Waterman local-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mengyao/Complete-Striped-Smith-Waterman-Library (reference mounted at
/root/reference).  The reference's SSE2 striped kernel (ref: src/ssw.c)
becomes an exact column-scan DP on the TPU VPU (int16/int32 value-range
tiers) where Farrar's lazy-F
correction loop is replaced by an associative prefix-max scan; the
byte(8-bit)/word(16-bit) two-tier behavior is emulated only where it is
observable (suboptimal-score masking windows).

Layers:
  core/      encodings, substitution matrices, CIGAR codec, numpy oracle
  ops/       alignment kernels (lax.scan portable path, Pallas TPU path,
             banded traceback)
  pipeline   ssw_align-equivalent orchestration (forward -> reverse -> CIGAR)
  api        Profile/Aligner/Filter/Alignment public API (ref: src/ssw.h,
             src/ssw_cpp.h)
  io/        FASTA/FASTQ streaming reader, SAM + BLAST-like writers
  parallel/  device meshes, data-parallel read sharding, reference sharding
             with halo, collective best-hit merge
  cli        `ssw_test`-compatible command line driver (ref: src/main.c)
"""

from ssw_tpu.core.cigar import (  # noqa: F401
    cigar_int_to_len,
    cigar_int_to_op,
    cigar_to_string,
    to_cigar_int,
)

__version__ = "0.1.0"


def __getattr__(name):  # lazy: api pulls in jax, keep core import light
    if name in ("Aligner", "Alignment", "Filter", "Profile", "align",
                "align_batch"):
        from ssw_tpu import api
        return getattr(api, name)
    raise AttributeError(name)
