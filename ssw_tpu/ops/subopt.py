"""Streaming (bounded-memory) suboptimal-score scan.

The reference scans the full per-column maxima array outside the maskLen
window around the best hit (ref: src/ssw.c:358-381, 570-583).  Materializing
that array is (B, R) — multi-GB for chromosome-scale targets, which forced
the forward pass into sub-sweet-spot batch chunks (BENCH.md, round 2).  This
module computes the identical (score2, ref_end2) from

  1. per-BLOCK column maxima (B, ceil(R/BM)) streamed out of the forward
     kernel (BM = 256 columns per block), and
  2. two bounded per-read window re-runs of the DP that reconstruct
     column-resolution maxima exactly where block resolution is not enough:
     the blocks straddling the exclusion window, and the first block that
     attains the winning value (for the first-index tie-break).

Exactness of the window re-runs rests on a restart bound: a DP dependency
chain can only look back D columns, because every chain step either moves
one lane up (at most L lane steps — including the zero-cost diagonal rides
through padded rows) or pays gapE from a cell value bounded by L*max|mat|.
So re-running the DP from zero state D columns before the region of
interest reproduces its column maxima exactly (pipeline._restart_margin).

All comparisons happen on values clamped to [0, 32767] — the reference
word kernel saturates at 32767 (_mm_adds_epi16) and the non-streaming path
clamps per column before its uint16 narrowing, so the first-index
tie-break must see the clamped values here too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BM = 256  # block width; matches pallas_sw.COL_BLOCK so the kernel's grid
          # step emits one block maximum naturally


def _clamp(x):
    return jnp.clip(x.astype(jnp.int32), 0, 32767)


def _edges(end_ref, mask_len, word, ref_len):
    """The exclusion-window edges, exactly as scan_sw.second_best_batch
    (byte tier excludes [lo, hi_edge], word tier [lo, hi_edge) — the
    reference kernels' scan-start asymmetry, ref: src/ssw.c:376 vs :578)."""
    lo = jnp.maximum(end_ref - mask_len, 0)
    hi_edge = jnp.minimum(end_ref + mask_len, ref_len)
    start_hi = jnp.where(word, hi_edge, hi_edge + 1)
    return lo, start_hi


@functools.partial(jax.jit, static_argnames=("Wb",))
def gather_windows(ref_ext, starts, Wb: int):
    """Per-read reference windows ref_ext[starts[b] : starts[b] + Wb],
    gathered on device (the host link is the scarce resource).  ref_ext
    must be padded so starts + Wb never reaches the end (no clamping)."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(ref_ext, (s,), (Wb,)))(starts)


@jax.jit
def compose_window(blockmax, mc_win, ws, end_ref, mask_len, word, ref_len):
    """First composition stage.

    blockmax: (B, nblk) int32 per-block maxima over valid columns.
    mc_win:   (B, Wb) int32 per-column maxima of the window re-run; column
              k of read b is global column ws[b] + k, exact inside the
              partial zone [blo*BM, (bhi+1)*BM).
    Returns score2 plus everything the tie-break needs:
      hasA/hasP/hasB — which ordered region (blocks before the window /
      partial zone / blocks after) first attains score2;
      firstP_i — first attaining global column inside the partial zone;
      bstar — first attaining block for the block regions (resolved to a
      column by a second window re-run).
    """
    B, nblk = blockmax.shape
    Wb = mc_win.shape[1]
    bm = _clamp(blockmax)
    mw = _clamp(mc_win)
    lo, start_hi = _edges(end_ref, mask_len, word, ref_len)
    blo = lo // BM
    bhi = start_hi // BM
    idxb = jnp.arange(nblk, dtype=jnp.int32)[None, :]
    Amask = idxb < blo[:, None]
    Bmask = idxb > bhi[:, None]
    bmA = jnp.where(Amask, bm, 0)
    bmB = jnp.where(Bmask, bm, 0)
    maxA = jnp.max(bmA, axis=1)
    maxB = jnp.max(bmB, axis=1)

    gi = ws[:, None] + jnp.arange(Wb, dtype=jnp.int32)[None, :]
    allowed = ((gi >= (blo * BM)[:, None]) & (gi < ((bhi + 1) * BM)[:, None])
               & (gi < ref_len)
               & ((gi < lo[:, None]) | (gi >= start_hi[:, None])))
    pv = jnp.where(allowed, mw, 0)
    maxP = jnp.max(pv, axis=1)

    score2 = jnp.maximum(maxA, jnp.maximum(maxP, maxB))
    pos = score2 > 0
    hasA = (maxA == score2) & pos
    hasP = (maxP == score2) & pos
    hasB = (maxB == score2) & pos
    firstP_k = jnp.argmax(pv == score2[:, None], axis=1)
    firstP_i = jnp.take_along_axis(gi, firstP_k[:, None], axis=1)[:, 0]
    bstarA = jnp.argmax(bmA == score2[:, None], axis=1).astype(jnp.int32)
    bstarB = jnp.argmax(bmB == score2[:, None], axis=1).astype(jnp.int32)
    bstar = jnp.where(hasA, bstarA, bstarB)
    return score2, hasA, hasP, hasB, firstP_i, bstar


@jax.jit
def resolve_block(mc2, ws2, bstar, score2, ref_len):
    """First global column inside block bstar (valid columns only) whose
    per-column maximum equals score2.  Block-region columns are always
    outside the exclusion window, so no window predicate applies here."""
    Wb2 = mc2.shape[1]
    m2 = _clamp(mc2)
    gi = ws2[:, None] + jnp.arange(Wb2, dtype=jnp.int32)[None, :]
    inblk = ((gi >= (bstar * BM)[:, None])
             & (gi < ((bstar + 1) * BM)[:, None]) & (gi < ref_len))
    hit = inblk & (m2 == score2[:, None])
    fk = jnp.argmax(hit, axis=1)
    return jnp.take_along_axis(gi, fk[:, None], axis=1)[:, 0]
