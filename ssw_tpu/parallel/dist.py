"""Distributed forward pass: data-parallel reads x sequence-parallel target.

The reference has no parallelism beyond SSE lanes (SURVEY.md section 2.3);
this is the TPU-native scale-out design:

  * reads are sharded over the `data` mesh axis (pure data parallelism,
    no communication until the final result gather);
  * the target is *logically* sharded over the `seq` axis: every device
    computes the DP for its own column range.  Column state (H/E) depends on
    all previous columns, but any positive-score alignment spans at most
    `halo` columns (the bound proved in pipeline._window_len), so each device
    re-computes `halo` warm-up columns before its owned range and its owned
    columns are bit-exact.  Warm-up work is halo/C overhead, amortized by
    large shards;
  * best-hit merge is an argmax-with-payload reduction over `seq` with the
    reference's tie-break (first column wins, ref: src/ssw.c:327-334),
    implemented with a lexicographic int64 key over an all_gather;
  * the suboptimal score is a masked max over the sharded per-column maxima
    with the same window/tie semantics as the single-chip scan
    (ref: src/ssw.c:368-381), merged with a second lexicographic reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ssw_tpu.ops import scan_sw


INT_MAX = 2 ** 31 - 1  # plain int: see ops/scan_sw.py NEG note


def _merge_best(score_g, idx_g):
    """Reduce gathered (S, B) candidates by (score desc, idx asc) — the
    reference's first-strict-max column tie-break.  Returns
    (best_score (B,), best_idx (B,), winner_row (S-index per column))."""
    best = jnp.max(score_g, axis=0)
    cand = score_g == best[None, :]
    idx_best = jnp.min(jnp.where(cand, idx_g, INT_MAX), axis=0)
    row = jnp.argmax(cand & (idx_g == idx_best[None, :]), axis=0)
    return best, idx_best, row


def _gated_forward(backend, prof, ref_loc, idxs, owned, rlen, cmask, sid,
                   sstart, gapO, gapE, quirk, max_sub):
    if backend == "pallas":
        from ssw_tpu.ops import pallas_sw
        return pallas_sw.forward_shared_ref_gated(
            prof, ref_loc, idxs, owned, rlen, cmask, sid, sstart, gapO,
            gapE, quirk, max_sub=max_sub)
    return scan_sw.forward_shared_ref_gated(
        prof, ref_loc, idxs, owned, rlen, cmask, sid, sstart, gapO, gapE,
        quirk)


def sharded_forward(mesh, profile, ref_ext, read_len, col_mask, seg_id,
                    seg_start, gapO: int, gapE: int, mask_len, ref_len: int,
                    halo: int, quirk: bool = True, word_mask=None,
                    backend: str = "auto", max_sub: int | None = None):
    """Forward pass + suboptimal scan over a (data, seq) mesh.

    profile: (B, n1, L) with B divisible by mesh 'data' size;
    ref_ext: (halo + R) target codes, `halo` virtual-letter columns
    prepended (R divisible by 'seq' size); mask_len: (B,) int32;
    word_mask: (B,) bool selecting the word-tier suboptimal window edge
    (ref: src/ssw.c:578 scans i = edge, byte scans i = edge+1, :376).
    Returns (score, end_ref, end_read, score2, ref_end2), each (B,),
    replicated over 'seq'.
    """
    S = mesh.shape["seq"]
    R = ref_ext.shape[0] - halo
    C = R // S
    if word_mask is None:
        word_mask = jnp.zeros(profile.shape[0], bool)
    if backend == "auto":
        backend = ("pallas" if jax.devices()[0].platform != "cpu"
                   else "scan")

    def local(prof, ref_ext_loc, rlen, cmask, sid, sstart, mlen, wmask):
        k = jax.lax.axis_index("seq")
        start = k * C  # first owned global column
        ref_loc = jax.lax.dynamic_slice(ref_ext_loc, (start,), (halo + C,))
        # global column index of each local column; warm-up gets idx < start
        idxs = jnp.arange(halo + C, dtype=jnp.int32) + (start - halo)
        owned = idxs >= start
        score, end_ref, end_read, maxcol = _gated_forward(
            backend, prof, ref_loc, idxs, owned, rlen, cmask, sid, sstart,
            gapO, gapE, quirk, max_sub)
        # merge best hit over seq: (score desc, end_ref asc), payload end_read
        score_g = jax.lax.all_gather(score, "seq")       # (S, Bl)
        end_ref_g = jax.lax.all_gather(end_ref, "seq")
        end_read_g = jax.lax.all_gather(end_read, "seq")
        bl = jnp.arange(score.shape[0])
        g_score, g_end_ref, win = _merge_best(score_g, end_ref_g)
        g_end_read = end_read_g[win, bl]
        # suboptimal scan on owned columns against the *global* window
        mc = maxcol[:, halo:].astype(jnp.int32)          # (Bl, C)
        i = jnp.arange(C, dtype=jnp.int32)[None, :] + start
        lo_edge = jnp.maximum(g_end_ref - mlen, 0)[:, None]
        hi_edge = jnp.minimum(g_end_ref + mlen, ref_len)[:, None]
        start_hi = jnp.where(wmask[:, None], hi_edge, hi_edge + 1)
        allowed = ((i < lo_edge) | (i >= start_hi)) & (i < ref_len)
        vals = jnp.where(allowed, mc, 0)
        s2_loc = jnp.max(vals, axis=1)
        i2_loc = jnp.take_along_axis(
            i, jnp.argmax(vals == s2_loc[:, None], axis=1)[:, None],
            axis=1)[:, 0]
        s2_g = jax.lax.all_gather(s2_loc, "seq")
        i2_g = jax.lax.all_gather(i2_loc, "seq")
        score2, i2_best, _ = _merge_best(s2_g, i2_g)
        ref_end2 = jnp.where(score2 > 0, i2_best, 0)
        no2 = mlen < 15
        score2 = jnp.where(no2, 0, score2)
        ref_end2 = jnp.where(no2, -1, ref_end2)
        return g_score, g_end_ref, g_end_read, score2, ref_end2

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None, None), P(None), P("data"),
                  P("data", None), P("data", None), P("data", None),
                  P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        check_rep=False,
    )
    return fn(profile, ref_ext, read_len, col_mask, seg_id, seg_start,
              jnp.asarray(mask_len, dtype=jnp.int32),
              jnp.asarray(word_mask, dtype=bool))
