"""Banded traceback dispatch: native C++ engine with numpy fallback.

The banded DP + traceback is inherently sequential per pair (band geometry,
pointer chasing), so it runs on the host: C++ (ssw_tpu/native/traceback.cpp)
when the toolchain is available, the row-vectorized numpy oracle otherwise.
Both implement the reference semantics incl. verification retry
(ref: src/ssw.c:940-957)."""

from __future__ import annotations

import ctypes

import numpy as np

from ssw_tpu.core import oracle
from ssw_tpu.core.cigar import cigar_alignment_score
from ssw_tpu.native import build as native_build

# BAM op codes used by the native engine: 0=M 1=I 2=D (matches MAPSTR order)


def native_available() -> bool:
    return native_build.load() is not None


def banded_cigar(sub_ref: np.ndarray, sub_read: np.ndarray, score: int,
                 gapO: int, gapE: int, mat: np.ndarray):
    """Cigar (list[int], BAM-encoded) for one [begin,end] sub-rectangle, or
    None when the banded traceback fails (s_align.flag=1 parity)."""
    lib = native_build.load()
    if lib is not None:
        ref8 = np.ascontiguousarray(sub_ref, dtype=np.int8)
        read8 = np.ascontiguousarray(sub_read, dtype=np.int8)
        mat8 = np.ascontiguousarray(mat, dtype=np.int8)
        cap = 2 * (len(ref8) + len(read8)) + 8
        out = np.empty(cap, dtype=np.uint32)
        n = lib.sswtpu_banded_cigar(
            ref8.ctypes.data_as(ctypes.c_void_p), len(ref8),
            read8.ctypes.data_as(ctypes.c_void_p), len(read8),
            int(score), int(gapO), int(gapE),
            mat8.ctypes.data_as(ctypes.c_void_p), mat8.shape[0],
            out.ctypes.data_as(ctypes.c_void_p), cap)
        if n == 0:
            return None
        if n > 0:
            return [int(x) for x in out[:n]]
        # fall through on buffer overflow (shouldn't happen with this cap)

    # numpy fallback: the oracle's banded_sw + the same verification loop
    band_width = abs(len(sub_ref) - len(sub_read)) + 1
    full_band = max(len(sub_ref), len(sub_read))
    while True:
        path = oracle.banded_sw(sub_ref, sub_read, score, gapO, gapE,
                                band_width, mat)
        if path is None:
            return None
        if cigar_alignment_score(path, sub_ref, sub_read, mat, gapO,
                                 gapE) == score:
            return path
        if band_width >= full_band:
            return None
        band_width = full_band
