"""Batched exact striped-SW forward pass as a jittable lax.scan.

This is the portable compute path (runs on CPU and TPU) and the semantic
baseline the Pallas kernel is verified against.  One scan step processes one
reference column for the whole read batch; Farrar's lazy-F correction loop
(ref: src/ssw.c:301-315) is replaced by an associative prefix-max
(jax.lax.cummax) over the read dimension, and the reference's
E-update-before-lazy-F quirk is reproduced with a segmented prefix-max that
resets at SIMD lane-block boundaries (see core/oracle.py for the semantic
derivation; exact for gapO > gapE).

Shapes:
  profile   (B, n+1, L) int32   per-read query profile incl. virtual pad row
  ref       (R,) int32          shared target, or (B, R) per-read windows
  outputs   scores/ends (B,), max_column (B, R) uint16
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain ints, NOT jnp scalars: a module-level jnp constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize for every program that imports the pipeline
# before calling it (dcli --coordinator).  jnp ops with python ints keep
# int32 dtypes.
NEG = -(2 ** 28)
SEG_BUMP = 2 ** 21


def _column_update(sub, state, gapO, gapE, decay, seg_bias, seg_reset,
                   col_mask, col_idx, quirk=True, gate=True):
    """One ref column for the whole batch.  sub: (B, L) substitution scores.

    quirk=False drops the lane-block E restriction; valid (bit-identical)
    whenever min(mat) >= -2*gapE, where an adjacent insertion+deletion can
    never beat the substitution it replaces (see core/oracle.py)."""
    H, E, gmax, end_ref, h_best = state
    h_diag = jnp.pad(H, ((0, 0), (1, 0)))[:, :-1] + sub
    h_tilde = jnp.maximum(jnp.maximum(h_diag, E), 0)
    c = h_tilde - gapO + decay
    # full prefix-max -> F -> H
    cm = jax.lax.cummax(c, axis=1)
    F = jnp.pad(cm, ((0, 0), (1, 0)), constant_values=NEG)[:, :-1] - decay + gapE
    F = jnp.maximum(F, 0)
    H = jnp.maximum(h_tilde, F)
    if quirk:
        # lane-block segmented prefix-max -> F_loc -> the H the E-update sees
        cs = jax.lax.cummax(c + seg_bias, axis=1) - seg_bias
        F_loc = jnp.pad(cs, ((0, 0), (1, 0)),
                        constant_values=NEG)[:, :-1] - decay + gapE
        F_loc = jnp.where(seg_reset, 0, jnp.maximum(F_loc, 0))
        h_fp = jnp.maximum(h_tilde, F_loc)
    else:
        h_fp = H
    E = jnp.maximum(jnp.maximum(E - gapE, h_fp - gapO), 0)

    colmax = jnp.max(jnp.where(col_mask, H, 0), axis=1)
    upd = (colmax > gmax) & gate
    gmax = jnp.where(upd, colmax, gmax)
    end_ref = jnp.where(upd, col_idx, end_ref)
    h_best = jnp.where(upd[:, None], H, h_best)
    return (H, E, gmax, end_ref, h_best), colmax


def _init_state(B, L):
    return (
        jnp.zeros((B, L), jnp.int32),
        jnp.zeros((B, L), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B, L), jnp.int32),
    )


def _finalize(state, read_len, L):
    H, E, gmax, end_ref, h_best = state
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    hit = (h_best == gmax[:, None]) & (j < read_len[:, None]) & (gmax[:, None] > 0)
    cand = jnp.where(hit, j, L)
    end_read = jnp.min(cand, axis=1)
    end_read = jnp.where(end_read == L, read_len - 1, end_read)
    return gmax, end_ref, end_read


@functools.partial(jax.jit, static_argnames=("gapO", "gapE", "quirk"))
def forward_shared_ref(profile, ref, read_len, col_mask, seg_id, seg_start,
                       gapO: int, gapE: int, quirk: bool = True):
    """Forward pass of a read batch against one shared target.

    Returns (score (B,), end_ref (B,), end_read (B,), max_column (R, B) u16).
    """
    B, _, L = profile.shape
    decay = jnp.arange(L, dtype=jnp.int32)[None, :] * gapE
    seg_bias = seg_id.astype(jnp.int32) * SEG_BUMP  # upcast BEFORE the bias
    seg_prev = jnp.pad(seg_id, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    seg_reset = seg_start | (seg_prev != seg_id)

    def step(state, xs):
        code, col_idx = xs
        sub = jax.lax.dynamic_index_in_dim(profile, code, axis=1,
                                           keepdims=False)
        state, colmax = _column_update(sub, state, gapO, gapE, decay,
                                       seg_bias, seg_reset, col_mask,
                                       col_idx, quirk)
        # clamp at the reference word kernel's saturation point before the
        # uint16 narrowing (ref: _mm_adds_epi16 saturates at 32767)
        return state, jnp.minimum(colmax, 32767).astype(jnp.uint16)

    R = ref.shape[0]
    idxs = jnp.arange(R, dtype=jnp.int32)
    state, max_column = jax.lax.scan(step, _init_state(B, L), (ref, idxs))
    score, end_ref, end_read = _finalize(state, read_len, L)
    return score, end_ref, end_read, max_column.swapaxes(0, 1)


@functools.partial(jax.jit, static_argnames=("gapO", "gapE", "quirk",
                                              "emit_maxcol"))
def forward_perread_ref(profile, refw, read_len, col_mask, seg_id, seg_start,
                        gapO: int, gapE: int, quirk: bool = True,
                        terminate=None, emit_maxcol: bool = False):
    """Forward pass where every read has its own reference window (B, W);
    used by the begin-finding reverse pass and by the streaming suboptimal
    scan's window re-runs.

    terminate: optional (B,) int32 — stop recording new best hits after the
    column whose masked max equals the value (the reference kernels break
    out of the column loop there, ref: src/ssw.c:339-341), so the returned
    best is the best up to and including that column.  -1 disables.

    emit_maxcol: also return per-column maxima (B, W) int32 (>= 0, NOT
    clamped at 32767 — callers clamp before comparisons to match the
    reference word kernel's saturation, ref: _mm_adds_epi16).
    """
    B, _, L = profile.shape
    decay = jnp.arange(L, dtype=jnp.int32)[None, :] * gapE
    seg_bias = seg_id.astype(jnp.int32) * SEG_BUMP  # upcast BEFORE the bias
    seg_prev = jnp.pad(seg_id, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    seg_reset = seg_start | (seg_prev != seg_id)
    if terminate is None:
        terminate = jnp.full((B,), -1, jnp.int32)

    def step(carry, xs):
        state, done = carry
        codes, col_idx = xs  # codes: (B,)
        sub = jnp.take_along_axis(profile, codes[:, None, None], axis=1)[:, 0, :]
        state, colmax = _column_update(sub, state, gapO, gapE, decay,
                                       seg_bias, seg_reset, col_mask,
                                       col_idx, quirk, gate=~done)
        done = done | (colmax == terminate)
        return (state, done), (colmax if emit_maxcol else None)

    W = refw.shape[1]
    idxs = jnp.arange(W, dtype=jnp.int32)
    (state, _), mc = jax.lax.scan(
        step, (_init_state(B, L), jnp.zeros((B,), bool)), (refw.T, idxs))
    out = _finalize(state, read_len, L)
    if emit_maxcol:
        return out + (mc.swapaxes(0, 1),)
    return out


# block width of the streaming suboptimal scan's coarse per-block maxima
# (matches the Pallas kernel's COL_BLOCK so blockmax falls out of the grid)
BM = 256


@functools.partial(jax.jit, static_argnames=("ref_len",))
def blockmax_reduce(max_column, ref_len: int):
    """(B, R) per-column maxima -> (B, ceil(R/BM)) per-block maxima over the
    valid columns (i < ref_len), zero-floored — the scan-backend twin of
    the Pallas kernel's streamed blockmax output."""
    B, R = max_column.shape
    Rp = (R + BM - 1) // BM * BM
    i = jnp.arange(Rp, dtype=jnp.int32)
    mc = jnp.zeros((B, Rp), jnp.int32).at[:, :R].set(
        max_column.astype(jnp.int32))
    mc = jnp.where((i < ref_len)[None, :], mc, 0)
    return jnp.max(mc.reshape(B, Rp // BM, BM), axis=2)


@functools.partial(jax.jit, static_argnames=("ref_len",))
def second_best_batch(max_column, end_ref, mask_len, ref_len, word_mask):
    """Vectorized suboptimal-score scan (ref: src/ssw.c:368-381, 570-583).

    max_column: (B, R) uint16 (R may include bucket padding past ref_len);
    word_mask: (B,) bool selecting the word-tier window edge semantics.
    Returns (score2 (B,), ref_end2 (B,)).  Jitted so the (B, R)-sized
    masks/temporaries fuse into a streaming reduction — materialized they
    are several GB for chromosome-scale targets.
    """
    B, R = max_column.shape
    # int32 compute for ordinary targets (faster VPU ops), uint16 for
    # chromosome-scale ones where the upcast would double peak HBM
    mc = max_column.astype(jnp.int32) if R <= (1 << 22) else max_column
    i = jnp.arange(R, dtype=jnp.int32)[None, :]
    lo_edge = jnp.maximum(end_ref - mask_len, 0)[:, None]
    hi_edge = jnp.minimum(end_ref + mask_len, ref_len)[:, None]
    start_hi = jnp.where(word_mask[:, None], hi_edge, hi_edge + 1)
    allowed = ((i < lo_edge) | (i >= start_hi)) & (i < ref_len)
    vals = jnp.where(allowed, mc, mc.dtype.type(0))
    score2 = jnp.max(vals, axis=1)
    # first index attaining the max (ties never displace earlier winners)
    ref_end2 = jnp.argmax(vals == score2[:, None], axis=1).astype(jnp.int32)
    ref_end2 = jnp.where(score2 > 0, ref_end2, 0)
    return score2.astype(jnp.int32), ref_end2


@functools.partial(jax.jit, static_argnames=("gapO", "gapE", "quirk"))
def forward_shared_ref_gated(profile, ref, idxs, owned, read_len, col_mask,
                             seg_id, seg_start, gapO: int, gapE: int,
                             quirk: bool = True):
    """forward_shared_ref with explicit per-column global indices and an
    `owned` gate: best-hit tracking only fires on owned columns.  Used by
    the sequence-parallel shards whose warm-up (halo) columns are inexact
    (see parallel/dist.py)."""
    B, _, L = profile.shape
    decay = jnp.arange(L, dtype=jnp.int32)[None, :] * gapE
    seg_bias = seg_id.astype(jnp.int32) * SEG_BUMP  # upcast BEFORE the bias
    seg_prev = jnp.pad(seg_id, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    seg_reset = seg_start | (seg_prev != seg_id)

    def step(state, xs):
        code, col_idx, gate = xs
        sub = jax.lax.dynamic_index_in_dim(profile, code, axis=1,
                                           keepdims=False)
        state, colmax = _column_update(sub, state, gapO, gapE, decay,
                                       seg_bias, seg_reset, col_mask,
                                       col_idx, quirk, gate)
        return state, jnp.minimum(colmax, 32767).astype(jnp.uint16)

    state, max_column = jax.lax.scan(step, _init_state(B, L),
                                     (ref, idxs, owned))
    score, end_ref, end_read = _finalize(state, read_len, L)
    return score, end_ref, end_read, max_column.swapaxes(0, 1)
