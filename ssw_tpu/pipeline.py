"""Batch alignment pipeline: the ssw_align orchestration, batched.

Mirrors the reference flow (ref: src/ssw.c:855-977) for a whole read batch
against one target:

  1. forward pass, byte-tier geometry (all reads at once, one device call)
  2. word-tier rerun of the subset whose score overflows the byte range
     (score + bias >= 255, ref: src/ssw.c:883-886)
  3. suboptimal-score scan outside the maskLen window (tier-aware edges)
  4. reverse pass on reversed read prefixes vs per-read reference windows to
     locate begin positions (ref: src/ssw.c:918-930); the window length is a
     provable bound on the alignment's reference span, so the batched
     static-shape pass is exact
  5. banded traceback + cigar verification on the host (ref: src/ssw.c:940-957)

Backend selection: "scan" (portable lax.scan path) or "pallas" (TPU kernel);
"auto" picks pallas on TPU.  For gapO <= gapE the batched path falls back to
the bug-compatible striped oracle per pair (the reference's lazy-F early exit
is lossy there; see core/oracle.py).
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ssw_tpu.core import oracle
from ssw_tpu.core.encoding import matrix_bias
from ssw_tpu.ops import common, scan_sw, subopt

# -- observability hook (ssw_tpu/profiling.py) ----------------------------
# an active GcupsCounter collects per-phase seconds + useful-cell counts
# from every align_batch call in the context (sub-batches and length
# buckets recurse; the module-level slot keeps them on one counter)
_counter = None


@contextlib.contextmanager
def profiled(counter):
    """Route phase timings/cell counts of enclosed align_batch calls into
    `counter` (a profiling.GcupsCounter)."""
    global _counter
    prev, _counter = _counter, counter
    try:
        yield counter
    finally:
        _counter = prev


def _phase(name: str):
    return _counter.phase(name) if _counter is not None \
        else contextlib.nullcontext()


@dataclass
class BatchRequest:
    reads: list[np.ndarray]        # encoded reads (int codes < n)
    ref: np.ndarray                # encoded target
    mat: np.ndarray                # (n, n) substitution matrix
    gapO: int
    gapE: int
    flag: int = 0x0F
    filters: int = 0
    filterd: int = 2 ** 31 - 1
    mask_len: list[int] | int = 15
    score_size: int = 2


def _as_masklen_array(mask_len, B):
    if isinstance(mask_len, (int, np.integer)):
        return np.full(B, int(mask_len), dtype=np.int32)
    return np.asarray(mask_len, dtype=np.int32)


def _window_len(max_read_len: int, ref_len: int, mat: np.ndarray,
                gapO: int, gapE: int) -> int:
    """Upper bound on the reference span of any positive-score alignment:
    span <= read_span * (1 + max(mat)/min(gapO,gapE)); used to size the
    reverse pass's static window."""
    max_sub = max(int(np.max(mat)), 1)
    g = max(min(gapO, gapE), 1)
    w = max_read_len * (1 + (max_sub + g - 1) // g) + 1
    return common.bucket_size(int(min(w, ref_len)), 64)


MIN_BUCKET = 64   # reads per length bucket before it earns its own shape
MAXCOL_BUDGET = 2 << 30  # bytes of per-column maxima per forward pass
MAXCOL_HARD_CAP = 3 << 30  # bound for one uint16 maxcol buffer.  The
                           # binding constraint is the KERNEL's int32
                           # maxcol output (2x this) plus its uint16
                           # narrowing — int16 stores are Mosaic-blocked
                           # (see pallas_sw), so 256-row chunks OOM on
                           # 10 Mbp targets; 3G (128 rows) is safe


def _restart_margin(L: int, mat: np.ndarray, gapO: int, gapE: int) -> int:
    """Columns of warm-up after which a zero-state DP restart is exact (see
    ops/subopt.py): a dependency chain either moves a lane up (at most L
    lane steps, including the zero-cost diagonal rides through padded
    rows/columns) or pays at least min(gapO, gapE) from a value bounded by
    L * max|mat|.  _window_len already bounds the pay-down span; add the
    full lane budget plus slack."""
    return _window_len(L, 1 << 30, mat, gapO, gapE) + L + 256


# Minimum target columns for the Pallas backend to prefer the streaming
# suboptimal scan even when the (B, R) maxcol buffer would fit: in blockmax
# mode the kernel runs per-lane trackers (no per-column cross-lane reduce,
# ~17% of kernel time — BENCH.md), but the two bounded per-read window
# re-runs carry a ~0.5-0.6 s fixed dispatch cost per leaf.  MEASURED
# crossover (tools/sweep_boundaries.py, 2048x100bp reads, v5e, outputs
# identical): stream/materialized warm-wall ratio 0.48 @16k, 0.52 @32k,
# 0.75 @131k, 0.87 @262k, 1.01 @524k, 1.11 @1M -> the round-3 analytic
# 32768 was ~16x too low; memory-forced streaming (chromosome scale)
# engages via the sweet-spot rule in _use_streaming regardless.
STREAM_MIN_COLS = 524288


def _use_streaming(Rp_est: int, L_est: int, backend: str = "scan") -> bool:
    """Stream the suboptimal scan (per-block maxima + bounded window
    re-runs) when materializing (B, R) per-column maxima would force the
    forward pass below its lane sweet spot (chromosome-scale targets), or
    when the Pallas kernel's faster lanetrack/blockmax mode pays for the
    window re-runs (see STREAM_MIN_COLS).
    SSW_TPU_STREAM_SUBOPT=0/1 forces either path (testing)."""
    env = os.environ.get("SSW_TPU_STREAM_SUBOPT")
    if env in ("0", "1"):
        return env == "1"
    if backend == "pallas" and Rp_est >= STREAM_MIN_COLS:
        return True
    rows_cap = max(64, int(MAXCOL_HARD_CAP // (Rp_est * 2)) // 64 * 64)
    return rows_cap < _sweet_rows(L_est)


def _sweet_rows(L: int) -> int:
    """Batch rows that fill the kernel's lane sweet spot for bucket L."""
    try:
        from ssw_tpu.ops import pallas_sw
        opt = pallas_sw.OPT_LANES
    except ImportError:  # pragma: no cover - pallas-less backend
        opt = 32768
    return max(64, (opt // max(L, 1)) // 64 * 64)


def _length_groups(Ls: list[int]) -> list[list[int]]:
    """Group read indices by length bucket, merging under-populated buckets
    into the next-larger one: every compiled kernel shape costs far more
    than the padding it saves unless enough reads amortize it.  Ascending
    walk; a group's L is the largest bucket it absorbed, so every read
    fits."""
    order = sorted(set(Ls))
    if len(order) <= 1:
        return [list(range(len(Ls)))]
    by_bucket = {L: [] for L in order}
    for i, l in enumerate(Ls):
        by_bucket[l].append(i)
    groups: list[list[int]] = []
    carry: list[int] = []
    for L in order:
        carry += by_bucket[L]
        if len(carry) >= MIN_BUCKET:
            groups.append(carry)
            carry = []
    if carry:
        groups.append(carry)
    return groups


# (id, pad_code, Rp) -> (np_ref, fp, device).  Keyed per padded length so a
# leaf that alternates streaming (Rp+Wb) and fallback (Rp) geometry on the
# same chromosome-scale target keeps both residents instead of evicting and
# re-uploading ~40 MB over the 1-10 MB/s host link each call (advisor r4).
_REF_CACHE: "dict[tuple, tuple]" = {}
_REF_CACHE_CAP = 6  # strong refs: identity keys stay valid while cached


def _device_ref(ref_np: np.ndarray, pad_code: int, Rp: int):
    """Padded target, resident on device.  Cached by identity of the host
    array: the CLI re-enters align_batch per memory chunk / strand / length
    bucket with the SAME target array, and re-uploading a chromosome-scale
    reference through the host link every call dominated the long-target
    wall time (10 Mbp = 40 MB per call)."""
    def fp(a):
        # cheap content fingerprint guarding against in-place mutation of a
        # cached host array between calls (advisor round 2): ends + a sparse
        # stride sample; O(1)-ish even for chromosome-scale targets
        s = a[:: max(len(a) // 64, 1)]
        return (len(a), a[:8].tobytes(), a[-8:].tobytes(), s.tobytes())

    key = (id(ref_np), pad_code, Rp)
    ent = _REF_CACHE.get(key)
    if ent is not None:
        np0, fp0, dev = ent
        if np0 is ref_np and fp0 == fp(ref_np):
            return dev
    ref_padded = np.full(Rp, pad_code, dtype=np.int32)
    ref_padded[: len(ref_np)] = ref_np
    dev = jnp.asarray(ref_padded)
    while len(_REF_CACHE) >= _REF_CACHE_CAP:
        _REF_CACHE.pop(next(iter(_REF_CACHE)))
    _REF_CACHE[key] = (ref_np, fp(ref_np), dev)
    return dev


def _prep_core(reads_padded, read_len, mat_ext, col_word, seg_rows, L: int):
    profile = jnp.transpose(mat_ext[:, reads_padded], (1, 0, 2))
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    rl = read_len[:, None]

    def tier(word_rows):
        lanes = jnp.where(word_rows[:, None], 8, 16).astype(jnp.int32)
        sl_raw = (rl + lanes - 1) // lanes
        return lanes, sl_raw

    lanes_c, sl_c = tier(col_word)
    col_mask = j < sl_c * lanes_c
    lanes_s, sl_raw = tier(seg_rows)
    sl = jnp.maximum(sl_raw, 1)
    seg_div = j // sl
    seg = jnp.minimum(seg_div, lanes_s - 1)
    seg_start = (j % sl == 0) & (seg == seg_div)
    return profile, col_mask, seg.astype(jnp.int8), seg_start


@functools.partial(jax.jit, static_argnames=("L", "seg_word"))
def _prep_device(reads_padded, read_len, mat_ext, col_word, L: int,
                 seg_word: bool):
    """Build the profile and batch geometry ON DEVICE from the read codes.

    The host link is the scarce resource (~1-10 MB/s through the axon
    tunnel): uploading read codes (B x L int8) and gathering
    profile[b, c, j] = mat[c, read[b, j]] device-side is ~25x less
    transfer than shipping the profile + masks.  col_word is the per-read
    tier for col_mask (the speculative masks mix tiers per read); the seg
    arrays use the single seg_word tier — they only matter on the quirk
    path, which never speculates.  Semantics mirror
    common.batch_geometry/build_profile exactly."""
    seg_rows = jnp.full(read_len.shape, seg_word, bool)
    return _prep_core(reads_padded, read_len, mat_ext, col_word, seg_rows, L)


# Lane packing (round 3): pack several reads into one kernel row as
# contiguous tier-padded slots (common.pack_plan) — 200bp reads in an
# L=256 bucket waste 22% of the kernel rate on pad lanes (BENCH.md).
# Streaming/blockmax regime only (the non-blockmax (B, R) maxcol has no
# per-slot extraction).  Round 4 extends packing to the quirk path
# (protein/BLOSUM): the quirk's lane-block segmented scan rides a second,
# sub-slot bias level (pallas_sw.QBUMP), exact while the slot-local value
# span stays under it.  SSW_TPU_PACK=0 disables; SSW_TPU_PACK_L pins the packed
# row width (read once at import; 0 = sweep the candidate widths per
# batch — row width does not change the 32k-lane chunk count the
# latency-bound column chain sees, but narrower rows waste fewer tail
# lanes per row, suffer less from the 8-row sublane rounding, and carry
# fewer slots S for the per-slot merge reduces, while wider rows fit
# long slots at all, so the best width is a slot-length-dependent
# tradeoff the planner scores directly).
PACK_L = int(os.environ.get("SSW_TPU_PACK_L", "0"))
PACK_WIDTHS = (1024, 2048, 4096)


def _plan_pack(read_len, col_word, Bp: int, L: int):
    """A pack plan when the packed layout's lane utilization beats the
    unpacked one by more than the packed kernel's op overhead (+1 of ~32
    vector ops per column — the slot-start h_diag cut; the slot bias is
    free since it rides the affine constants — plus S/256-amortized slot
    reduces and a flat 2% for the per-slot reconstruction)."""
    slot_len = np.where(col_word, (read_len + 7) // 8 * 8,
                        (read_len + 15) // 16 * 16).astype(np.int32)
    if slot_len.size == 0:
        return None
    best, best_eff = None, 0.0
    for W in (PACK_L,) if PACK_L else PACK_WIDTHS:
        if int(slot_len.max()) > W // 2:
            continue
        plan = common.pack_plan(slot_len, W)
        overhead = (33.0 + plan.S * 5.0 / 256.0) / 32.0 + 0.02
        eff = plan.util / overhead
        if eff > best_eff:
            best, best_eff = plan, eff
    unpacked_util = float(slot_len.sum()) / max(Bp * L, 1)
    if best is None or best_eff <= unpacked_util:
        return None
    return best


@functools.partial(jax.jit, static_argnames=("L",))
def _word_mask(read_len, L: int):
    """Word-tier validity (8-lane stripe padding) for the dual-tier
    blockmax emission; col_mask then carries the byte-tier superset."""
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    return (j < (read_len[:, None] + 7) // 8 * 8).astype(jnp.int32)


@jax.jit
def _prep_packed(codes, mat_ext):
    """Packed profile ON DEVICE from int8 packed read codes (the host link
    is the scarce resource; see _prep_device)."""
    return jnp.transpose(mat_ext[:, codes], (1, 0, 2))


def needs_quirk(mat: np.ndarray, gapE: int) -> bool:
    """The lane-block E quirk is observable only when an adjacent
    insertion+deletion can beat the substitution it replaces, i.e. when
    min(mat) < -2*gapE (see core/oracle.py)."""
    return int(np.min(mat)) < -2 * gapE


def _forward(profile, ref_codes, geometry, gapO, gapE, quirk, backend,
             max_sub=None, blockmax=False, valid_len=None):
    if backend == "pallas":
        from ssw_tpu.ops import pallas_sw
        return pallas_sw.forward_shared_ref(
            profile, ref_codes, jnp.asarray(geometry.read_len),
            jnp.asarray(geometry.col_mask), jnp.asarray(geometry.seg_id),
            jnp.asarray(geometry.seg_start), gapO, gapE, quirk,
            max_sub=max_sub, blockmax=blockmax, valid_len=valid_len)
    out = scan_sw.forward_shared_ref(
        profile, ref_codes, jnp.asarray(geometry.read_len),
        jnp.asarray(geometry.col_mask), jnp.asarray(geometry.seg_id),
        jnp.asarray(geometry.seg_start), gapO, gapE, quirk)
    if blockmax:
        # the portable backend has no streamed blockmax; reduce the full
        # array (CPU memory is not the scarce resource there) so the
        # streaming path is testable bit-for-bit on any backend
        score, end_ref, end_read, mc = out
        vl = mc.shape[1] if valid_len is None else valid_len
        return score, end_ref, end_read, scan_sw.blockmax_reduce(mc, vl)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("L", "ref_len", "gapO", "gapE", "quirk", "pallas",
                     "D", "Wb", "Wb2"))
def _subopt_stream_core(blockmax_d, er, ml, word_d, reads_i8, rl, mat_ext,
                        ref_ext, *, L, ref_len, gapO, gapE, quirk, pallas,
                        D, Wb, Wb2):
    """The streaming suboptimal chain as ONE compiled program.

    Eagerly, this chain was ~50 device dispatches per leaf (the per-read
    window kernel loops over OPT_LANES-sized batch chunks — 8 chunks x 2
    re-runs of pallas_call + gathers, each re-traced per call), and on the
    high-latency axon link the dispatch overhead (~1.5-3 s per 2048-read
    leaf) dwarfed the device work (~10 ms).  Jitting the whole chain
    collapses it into one dispatch; the math is unchanged."""
    if pallas:
        from ssw_tpu.ops import pallas_sw
        rev_fn = pallas_sw.forward_perread_ref
    else:
        rev_fn = scan_sw.forward_perread_ref
    er32 = er.astype(jnp.int32)
    ml32 = ml.astype(jnp.int32)
    lo = jnp.maximum(er32 - ml32, 0)
    blo = lo // subopt.BM
    ws = jnp.maximum(blo * subopt.BM - D, 0).astype(jnp.int32)

    # per-read FINAL-tier geometry: mixed byte/word rows (and mixed seg
    # geometries on the quirk path) in one batch
    prof_s, cm_s, seg_s, ss_s = _prep_core(reads_i8, rl, mat_ext, word_d,
                                           word_d, L)

    refw = subopt.gather_windows(ref_ext, ws, Wb)
    mc_win = rev_fn(prof_s, refw, rl, cm_s, seg_s, ss_s, gapO, gapE,
                    quirk, emit_maxcol=True)[3]
    s2, hasA, hasP, hasB, firstP_i, bstar = subopt.compose_window(
        blockmax_d, mc_win, ws, er32, ml32, word_d, ref_len)

    # resolve the first-attaining column of block-region winners with a
    # second bounded re-run (run unconditionally: static shapes, tiny)
    ws2 = jnp.maximum(bstar * subopt.BM - D, 0).astype(jnp.int32)
    refw2 = subopt.gather_windows(ref_ext, ws2, Wb2)
    mc2 = rev_fn(prof_s, refw2, rl, cm_s, seg_s, ss_s, gapO, gapE,
                 quirk, emit_maxcol=True)[3]
    fc = subopt.resolve_block(mc2, ws2, bstar, s2, ref_len)

    # ordered-region precedence: blocks before the window, then the
    # partial zone, then blocks after (matches the full scan's first-index
    # tie-break)
    ref_end2 = jnp.where(hasA, fc,
                         jnp.where(hasP, firstP_i,
                                   jnp.where(hasB, fc, 0)))
    ref_end2 = jnp.where(s2 > 0, ref_end2, 0)
    return jnp.stack([s2, ref_end2])


def _second_best_streaming(blockmax_d, end_ref, mask_len_p, word, ref_len,
                           ref_ext_dev, reads_padded, read_len, mat_ext,
                           L, gapO, gapE, quirk, backend, D, Wb, Wb2):
    """Bounded-memory (score2, ref_end2), bit-identical to
    scan_sw.second_best_batch on the full per-column maxima (ref:
    src/ssw.c:358-381): per-block maxima come from the forward kernel;
    column resolution near the exclusion window and inside the winning
    block is reconstructed by per-read window re-runs of the DP, exact
    thanks to the restart margin D (ops/subopt.py).  Two bounded re-runs
    replace a (B, R) buffer that is multi-GB at chromosome scale."""
    stacked = _subopt_stream_core(
        blockmax_d, jnp.asarray(end_ref.astype(np.int32)),
        jnp.asarray(mask_len_p.astype(np.int32)), jnp.asarray(word),
        jnp.asarray(reads_padded.astype(np.int8)), jnp.asarray(read_len),
        jnp.asarray(mat_ext), ref_ext_dev,
        L=L, ref_len=ref_len, gapO=gapO, gapE=gapE, quirk=quirk,
        pallas=(backend == "pallas"), D=D, Wb=Wb, Wb2=Wb2)
    packed = np.asarray(stacked)
    return packed[0].astype(np.int32), packed[1].astype(np.int32)


def pick_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices
        platform = "cpu"
    if platform == "tpu":
        try:
            from ssw_tpu.ops import pallas_sw  # noqa: F401
            return "pallas"
        except ImportError:
            return "scan"
    return "scan"  # the kernel is Mosaic-only; GPU/other backends scan


class _Pending:
    """An in-flight align_batch: device work launched, host work deferred.

    Three stages let a driver overlap host work with device compute across
    batches (the reference CLI is strictly serial, ref: src/main.c:462):
      launch — uploads + forward + speculative suboptimal scan queued;
      mid    — forward results downloaded, rare tier re-runs resolved,
               begin-finding reverse passes queued;
      finish — reverse results downloaded, warnings, traceback, results.
    """
    __slots__ = ("B", "parts", "results", "stage")

    def __init__(self, results=None):
        self.results = results
        self.parts = []
        self.stage = 0


def _subset_req(req: BatchRequest, idx, mask_all) -> BatchRequest:
    return BatchRequest(
        reads=[req.reads[i] for i in idx], ref=req.ref, mat=req.mat,
        gapO=req.gapO, gapE=req.gapE, flag=req.flag,
        filters=req.filters, filterd=req.filterd,
        mask_len=[int(mask_all[i]) for i in idx],
        score_size=req.score_size)


def _leaf_plan(reads):
    """(per-read length buckets, max bucket) — the batching inputs, shared
    by the sync recursion and the async planner so both split
    identically."""
    Ls = [common.bucket_size(max(common.pad_total(len(r), False), 1), 64)
          for r in reads]
    L_est = max(Ls) if Ls else 64
    return Ls, L_est


def align_batch(req: BatchRequest, backend: str = "auto") -> list[oracle.AlignResult]:
    """Align every read in the batch against req.ref.

    Returns AlignResult per read with the same field semantics as the
    reference's s_align (ref: src/ssw.h:55-66); entries are None where the
    reference returns NULL (score_size=0 overflow).
    """
    backend = pick_backend(backend)
    B = len(req.reads)
    if B == 0:
        return []
    mask_all = _as_masklen_array(req.mask_len, B)

    if req.gapO <= req.gapE:
        # bug-compatible slow path (see module docstring)
        return pipeline_fallback(req)

    # length-bucket heterogeneous batches: one max-length L for everything
    # would pad every short read to the longest (the reference's benchmark
    # workload mixes 25-540bp reads); buckets re-enter with a uniform L
    Ls, L_est = _leaf_plan(req.reads)  # byte-tier rows >= word-tier rows,
    # so the byte bucket bound covers both tiers (same L on word rerun)
    groups = _length_groups(Ls)
    if len(groups) > 1:
        results: list = [None] * B
        for idx in groups:
            sub = _subset_req(req, idx, mask_all)
            for i, r in zip(idx, align_batch(sub, backend)):
                results[i] = r
        return results

    # cap the per-column-maxima footprint: maxcol is (B, Rp) uint16 and the
    # word rerun + concat can hold ~3 copies, so bound B for huge targets —
    # but hold the kernel's lane sweet spot (OPT_LANES lanes per dispatch,
    # BENCH.md: half-width batches cost ~1.8x per lane) as long as one
    # maxcol buffer stays under the hard HBM guard.  When even that would
    # push below the sweet spot (chromosome-scale targets), stream the
    # suboptimal scan instead: per-block maxima + bounded window re-runs
    # lift the cap entirely (VERDICT round-2 item 2).
    Rp_est = common.bucket_size(len(req.ref), 256)
    streaming = _use_streaming(Rp_est, L_est, backend)
    if streaming:
        b_mem = max(1024, _sweet_rows(L_est))
    else:
        b_mem = max(64, int(MAXCOL_BUDGET // (Rp_est * 2)) // 64 * 64)
        rows_cap = max(64, int(MAXCOL_HARD_CAP // (Rp_est * 2)) // 64 * 64)
        b_mem = max(b_mem, min(_sweet_rows(L_est), rows_cap))
    if B > b_mem:
        results = []
        for lo in range(0, B, b_mem):
            sub = _subset_req(req, range(lo, min(lo + b_mem, B)), mask_all)
            results.extend(align_batch(sub, backend))
        return results

    st = _leaf_start(req, backend, streaming)
    if isinstance(st, list):  # quirk value-range fallback
        return st
    _leaf_mid(st)
    return _leaf_finish(st)


def align_batch_launch(req: BatchRequest, backend: str = "auto") -> _Pending:
    """Start align_batch asynchronously: queue all device work (uploads,
    forward passes, speculative suboptimal scans) and return immediately.
    Drive with align_batch_mid (downloads + reverse-pass launches) and
    align_batch_finish (results); a driver that launches batch k+1 before
    finishing batch k overlaps its host tail with device compute.

    Paths whose host/device interleaving cannot be deferred (gapO <= gapE
    oracle fallback, score_size != 2) run synchronously here so warning
    order on stderr is identical to the serial path.  Streaming-suboptimal
    leaves are async-eligible: their launch queues upload + forward only
    and the window re-runs happen at mid (the host-tail stage)."""
    backend = pick_backend(backend)
    plan = _plan_async(req, backend)
    if plan is None:
        return _Pending(results=align_batch(req, backend))
    pend = _Pending()
    pend.B = len(req.reads)
    for idx, leaf_req, streaming in plan:
        st = _leaf_start(leaf_req, backend, streaming)
        assert not isinstance(st, list)  # planner pre-checked the guards
        pend.parts.append((idx, st))
    return pend


def align_batch_mid(pend: _Pending) -> _Pending:
    if pend.results is None and pend.stage < 1:
        for _, st in pend.parts:
            _leaf_mid(st)
        pend.stage = 1
    return pend


def align_batch_scores(pend: _Pending) -> np.ndarray:
    """score1 per read once the forward stage is resolved (drives mid if
    needed).  Strand-selection drivers (-r) use this to build the `detail`
    mask for align_batch_finish before paying for any traceback."""
    align_batch_mid(pend)
    if pend.results is not None:
        return np.array([0 if r is None else r.score1
                         for r in pend.results], dtype=np.int64)
    out = np.zeros(pend.B, dtype=np.int64)
    for idx, st in pend.parts:
        out[list(idx)] = st.score
    return out


def align_batch_finish(pend: _Pending, detail=None) -> list:
    """Complete an align_batch_launch.  `detail` (optional bool mask, one
    per read) suppresses the banded traceback for False reads: the
    reference runs ssw_align for BOTH strands under -r but only the
    winner's cigar is ever observable (src/main.c:505-518), while the
    reverse pass must still run for every read because its stderr warning
    fires for losers too (src/ssw.c:932-935)."""
    if pend.results is not None:
        return pend.results
    align_batch_mid(pend)
    results: list = [None] * pend.B
    for idx, st in pend.parts:
        d = None if detail is None else np.asarray(detail)[list(idx)]
        for i, r in zip(idx, _leaf_finish(st, d)):
            results[i] = r
    pend.results = results
    return results


def _plan_async(req: BatchRequest, backend: str):
    """Split req into async-eligible leaves [(global indices, leaf_req,
    streaming)], mirroring align_batch's group/memory splitting exactly;
    None when any leaf would take a synchronous path."""
    B = len(req.reads)
    if B == 0:
        return []
    if req.gapO <= req.gapE or req.score_size != 2:
        return None
    mask_all = _as_masklen_array(req.mask_len, B)
    Ls, _ = _leaf_plan(req.reads)
    groups = _length_groups(Ls)
    max_sub = int(np.max(np.abs(req.mat)))
    quirk = needs_quirk(req.mat, req.gapE)
    Rp_est = common.bucket_size(len(req.ref), 256)
    out = []
    for idx in (groups if len(groups) > 1 else [list(range(B))]):
        _, L_est = _leaf_plan([req.reads[i] for i in idx])
        if quirk and (L_est * (max_sub + req.gapE) + req.gapO
                      >= int(scan_sw.SEG_BUMP)):
            return None  # oracle fallback leaf
        streaming = _use_streaming(Rp_est, L_est, backend)
        if streaming:
            b_mem = max(1024, _sweet_rows(L_est))
        else:
            b_mem = max(64, int(MAXCOL_BUDGET // (Rp_est * 2)) // 64 * 64)
            rows_cap = max(64,
                           int(MAXCOL_HARD_CAP // (Rp_est * 2)) // 64 * 64)
            b_mem = max(b_mem, min(_sweet_rows(L_est), rows_cap))
        for lo in range(0, len(idx), b_mem):
            part = idx[lo:lo + b_mem]
            out.append((part, _subset_req(req, part, mask_all), streaming))
    return out


class _LeafState:
    """Mutable bag for one leaf batch's launch -> mid -> finish flow."""
    __slots__ = (
        "req", "backend", "streaming", "B", "Bp", "n", "bias", "ref_len",
        "mask_len_p", "read_len", "L", "mat_ext", "reads_padded", "quirk",
        "max_sub", "word_tier", "might", "dual", "ref_codes", "ref_ext_dev",
        "D", "Wb", "Wb2", "fwd_d", "sub_d", "mc_d",
        "score", "end_ref", "end_read", "score2", "ref_end2", "word",
        "null_mask", "fin")

    def __init__(self):
        self.fin = None


def _leaf_start(req: BatchRequest, backend: str, streaming: bool):
    """Queue the leaf's device work: upload, forward pass, and (when not
    streaming) the speculative suboptimal scan.  No host<->device syncs.

    The suboptimal scan launches before the byte-overflow tier decision is
    known by using the speculative col_word tiers for its window-edge
    asymmetry: every read whose speculative tier differs from its final
    tier is exactly the set the word re-run re-scans (need_word implies
    might), so the re-run's own suboptimal results overwrite any
    speculative mismatch — final outputs are identical to deciding first.

    Returns a results list instead when the quirk value-range guard routes
    to the oracle fallback."""
    st = _LeafState()
    st.req, st.backend, st.streaming = req, backend, streaming
    B = st.B = len(req.reads)
    n = st.n = req.mat.shape[0]
    st.bias = matrix_bias(req.mat)
    ref_len = st.ref_len = len(req.ref)
    mask_len = _as_masklen_array(req.mask_len, B)

    # pad the batch dimension to a multiple of 64 (duplicates of read 0)
    # so the compiled-shape set stays small across arbitrary batch sizes —
    # shape churn otherwise dominates wall time.  Only the device stages
    # (forward, suboptimal scan) see the padding; everything is sliced back
    # to B before _finish_batch so no duplicate warnings/tracebacks run.
    Bp = st.Bp = common.round_up(B, 64) if backend == "pallas" else B
    reads_all = list(req.reads) + [req.reads[0]] * (Bp - B)
    mask_len_p = st.mask_len_p = np.concatenate(
        [mask_len, np.full(Bp - B, 15, np.int32)])

    read_len = st.read_len = np.array([len(r) for r in reads_all],
                                      dtype=np.int32)
    max_rl = int(read_len.max())
    L = st.L = common.bucket_size(
        max(common.pad_total(max_rl, word=False), 1), 64)
    mat_ext = st.mat_ext = common.extend_matrix(req.mat)
    reads_padded = st.reads_padded = common.pad_reads(reads_all, L,
                                                      pad_code=n)
    # pad the target to a coarse bucket with the virtual letter: padded
    # columns carry values diagonally at zero cost but can never strictly
    # exceed the running max, and are masked out of the suboptimal scan
    Rp = common.bucket_size(ref_len, 256)
    if streaming:
        # window sizes for the streaming suboptimal scan's per-read
        # re-runs; the device target gets Wb extra pad so window slices
        # never clamp
        st.D = _restart_margin(L, req.mat, req.gapO, req.gapE)
        ml_max = int(mask_len_p.max()) if mask_len_p.size else 15
        st.Wb = common.round_up(st.D + 2 * ml_max + 2 * subopt.BM + 64, 256)
        st.Wb2 = common.round_up(st.D + subopt.BM + 64, 256)
        st.ref_ext_dev = _device_ref(req.ref, n, Rp + st.Wb)
        ref_codes = st.ref_codes = st.ref_ext_dev[:Rp]
    else:
        st.ref_ext_dev = None
        ref_codes = st.ref_codes = _device_ref(req.ref, n, Rp)

    word_tier = st.word_tier = req.score_size == 1
    quirk = st.quirk = needs_quirk(req.mat, req.gapE)
    max_sub = st.max_sub = int(np.max(np.abs(req.mat)))
    if quirk and L * (max_sub + req.gapE) + req.gapO >= int(scan_sw.SEG_BUMP):
        # the segmented-scan bias that reproduces the lane-block E quirk
        # needs value headroom; beyond it, route to the exact oracle
        return pipeline_fallback(req)
    # speculative tier masks: when the quirk is off, the tiers differ ONLY
    # in col_mask (rows padded to 16 vs 8 per lane block; byte pad rows
    # carry stale diagonal values into maxColumn).  A read whose maximum
    # possible score (read_len*max|mat| + bias) cannot reach 255 never
    # overflows, so give every *potentially* overflowing read the word-tier
    # row mask up front — if it does overflow (the common case for long
    # high-identity reads), the reference's whole word rerun
    # (ref: src/ssw.c:883-886) is already answered; only might-but-didn't
    # reads re-run, with byte rows.  Score/ends are tier-independent here.
    might = np.zeros(Bp, dtype=bool)
    if req.score_size == 2 and not quirk:
        might = read_len.astype(np.int64) * max_sub + st.bias >= 255
    # dual-tier blockmax (round 4): when any read might overflow the byte
    # tier, run ONE pass with byte-span masks and emit BOTH tiers' block
    # maxima — the word-geometry rerun of might-but-didn't reads (and the
    # maxcol fix of did-overflow reads) collapses into a channel select
    # at mid.  The DP itself is tier-independent when the quirk is off.
    dual = st.dual = bool(streaming and not quirk and backend == "pallas"
                          and not word_tier and might.any())
    col_word = np.zeros(Bp, bool) if dual else (np.full(Bp, word_tier)
                                                | might)
    st.might = might
    if _counter is not None:
        _counter.add_pairs(read_len[:B], ref_len)
    plan = None
    if (streaming and backend == "pallas"
            and os.environ.get("SSW_TPU_PACK", "1") != "0"):
        from ssw_tpu.ops import pallas_sw
        plan = _plan_pack(read_len, col_word, Bp, L)
        if plan is not None and quirk and plan.slot_len.size:
            # quirk packing (round 4) is exact only while the slot-local
            # value span stays under the sub-slot block bias QBUMP
            pb = 1 << (int(plan.slot_len.max()) - 1).bit_length()
            if pb * (max_sub + req.gapE) + req.gapO >= pallas_sw.QBUMP:
                plan = None
    if plan is not None:
        pc = common.pack_codes(plan, reads_padded, n)
        so, sl, rl_s = common.pack_tables(plan, read_len)
        pprof = _prep_packed(jnp.asarray(pc.astype(np.int8)),
                             jnp.asarray(mat_ext))
        score_d, er_d, ed_d, mc_d = pallas_sw.forward_shared_ref_packed(
            pprof, ref_codes, so, sl, rl_s,
            plan.row * plan.S + plan.slot, req.gapO, req.gapE,
            max_sub=max_sub, valid_len=ref_len, quirk=quirk,
            word=bool(word_tier), dual=dual)
    else:
        profile, cm_d, seg_d, ss_d = _prep_device(
            reads_padded.astype(np.int8), read_len, mat_ext, col_word, L,
            word_tier)
        geo = common.BatchGeometry(L, read_len, cm_d, seg_d, ss_d)
        if dual:
            from ssw_tpu.ops import pallas_sw
            score_d, er_d, ed_d, mc_d = pallas_sw.forward_shared_ref(
                jnp.asarray(profile), ref_codes,
                jnp.asarray(geo.read_len), jnp.asarray(geo.col_mask),
                jnp.asarray(geo.seg_id), jnp.asarray(geo.seg_start),
                req.gapO, req.gapE, quirk, max_sub=max_sub,
                blockmax=True, valid_len=ref_len,
                wmask=_word_mask(jnp.asarray(read_len), L))
        else:
            score_d, er_d, ed_d, mc_d = _forward(
                jnp.asarray(profile), ref_codes, geo, req.gapO, req.gapE,
                quirk, backend, max_sub, blockmax=streaming,
                valid_len=ref_len)
    st.fwd_d = jnp.stack([score_d, er_d, ed_d])
    if streaming:
        st.mc_d = mc_d  # (Bp, nblk) blockmax, consumed at mid
        st.sub_d = None
    else:
        # speculative suboptimal launch (col_word edges, see docstring);
        # the big (Bp, R) maxcol buffer is consumed right here in the
        # device queue and freed — only (Bp,) results stay in flight
        s2_d, re2_d = scan_sw.second_best_batch(
            mc_d, er_d, jnp.asarray(mask_len_p), ref_len,
            jnp.asarray(col_word))
        st.sub_d = jnp.stack([s2_d, re2_d])
        st.mc_d = None
    return st


def _leaf_mid(st: _LeafState):
    """Download forward (+ speculative suboptimal) results, resolve tier
    re-runs, and queue the begin-finding reverse passes."""
    req, B, Bp = st.req, st.B, st.Bp
    ref_len = st.ref_len
    with _phase("forward"):
        # ONE stacked download: each host<->device round trip costs ~28 ms
        # on this link, so per-array fetches dominate small-batch calls
        if st.sub_d is not None:
            packed = np.array(jnp.concatenate([st.fwd_d, st.sub_d]))
            score2, ref_end2 = packed[3], packed[4]
        else:
            packed = np.array(st.fwd_d)
            score2 = ref_end2 = None
        score, end_ref, end_read = packed[0], packed[1], packed[2]
        st.fwd_d = st.sub_d = None

    word = np.full(Bp, st.word_tier)
    word_sub = None  # (idx, rerun suboptimal inputs, tier) from the rerun
    if req.score_size == 2:
        need_word = score + st.bias >= 255
        word[need_word] = True
        # reads whose first-pass row mask does not match their final tier
        # re-run to fix maxColumn (score/ends are already exact):
        #   quirk on  -> word-tier reads re-run with word geometry (the
        #                quirk makes the whole DP tier-dependent)
        #   quirk off -> might-but-didn't reads re-run with byte rows —
        #                UNLESS the dual-tier blockmax already emitted
        #                both tiers' maxima (round 4): then no read ever
        #                re-runs; mid just selects the final tier channel
        if st.dual:
            rerun = np.zeros(Bp, dtype=bool)
        else:
            rerun = need_word if st.quirk else (st.might & ~need_word)
        rerun_word = bool(st.quirk)
        if rerun.any():
            idx = np.nonzero(rerun)[0]
            k = len(idx)
            idx_p = idx
            if st.backend == "pallas":  # stable compile shapes (see above)
                pad = common.round_up(k, 64) - k
                idx_p = np.concatenate([idx, np.repeat(idx[:1], pad)])
            prof_r, cm_r, seg_r, ss_r = _prep_device(
                st.reads_padded[idx_p].astype(np.int8), st.read_len[idx_p],
                st.mat_ext, np.full(len(idx_p), rerun_word), st.L,
                rerun_word)
            geo_r = common.BatchGeometry(st.L, st.read_len[idx_p], cm_r,
                                         seg_r, ss_r)
            with _phase("rerun"):
                if _counter is not None:
                    _counter.add_pairs(st.read_len[idx], ref_len)
                s_r, er_r, ed_r, mc_r = _forward(
                    jnp.asarray(prof_r), st.ref_codes, geo_r, req.gapO,
                    req.gapE, st.quirk, st.backend, st.max_sub,
                    blockmax=st.streaming, valid_len=ref_len)
                packed_r = np.asarray(jnp.stack([s_r, er_r, ed_r]))
                score[idx] = packed_r[0, :k]
                end_ref[idx] = packed_r[1, :k]
                end_read[idx] = packed_r[2, :k]
            # the rerun tier's suboptimal scan runs directly on the rerun's
            # per-column maxima: splicing them into the main (B, R) array
            # would double a multi-GB buffer for long targets
            word_sub = (idx, k, er_r, mc_r,
                        jnp.asarray(st.mask_len_p[idx_p]), rerun_word)
    # the reference word kernel saturates at 32767 (_mm_adds_epi16); clamp
    # word-tier scores to its ceiling (positions beyond saturation are
    # undefined in the reference too)
    score = np.where(word, np.minimum(score, 32767), score)

    # suboptimal scores (tier-aware window edges; padded shapes for compile
    # stability, sliced to B below)
    reads_i8_dev = None  # one upload shared by the suboptimal + reverse chains
    with _phase("suboptimal"):
        if st.streaming:
            reads_i8_dev = jnp.asarray(st.reads_padded.astype(np.int8))
            bm_d = st.mc_d  # (Bp, nblk) int32, on device
            st.mc_d = None
            if st.dual:
                # (Bp, 2, nblk): channel 0 = byte-tier maxima, 1 = word;
                # pick each read's FINAL tier — this replaces the rerun
                bm_d = jnp.where(jnp.asarray(word)[:, None],
                                 bm_d[:, 1], bm_d[:, 0])
            if word_sub is not None:
                idx, k, er_r, mc_r, ml_r, rerun_word = word_sub
                # splice the rerun tier's per-block maxima in: `word` is
                # already the per-read final tier, so one composition
                # serves the whole batch
                bm_d = bm_d.at[jnp.asarray(idx)].set(mc_r[:k])
            score2, ref_end2 = _second_best_streaming(
                bm_d, end_ref, st.mask_len_p, word, ref_len,
                st.ref_ext_dev, reads_i8_dev, st.read_len, st.mat_ext,
                st.L, req.gapO, req.gapE, st.quirk, st.backend, st.D,
                st.Wb, st.Wb2)
        elif word_sub is not None:
            idx, k, er_r, mc_r, ml_r, rerun_word = word_sub
            s2_r, re2_r = scan_sw.second_best_batch(
                mc_r, er_r, ml_r, ref_len,
                jnp.full(mc_r.shape[0], rerun_word, bool))
            packed2r = np.asarray(jnp.stack([s2_r, re2_r]))
            score2[idx] = packed2r[0, :k]
            ref_end2[idx] = packed2r[1, :k]

    # drop the shape-stability padding before the host stages: duplicates
    # must not emit warnings or run extra reverse passes / tracebacks
    st.score, st.end_ref, st.end_read = score[:B], end_ref[:B], end_read[:B]
    st.score2, st.ref_end2, st.word = score2[:B], ref_end2[:B], word[:B]

    null_mask = np.zeros(B, dtype=bool)
    if req.score_size == 0:
        null_mask = st.score + st.bias >= 255
        for _ in range(int(null_mask.sum())):  # ref: src/ssw.c:888
            sys.stderr.write(
                "Please set 2 to the score_size parameter of the function "
                "ssw_init, otherwise the alignment results will be "
                "incorrect.\n")
    st.null_mask = null_mask
    st.fin = _finish_launch(
        req, st.score, st.end_ref, st.end_read, st.word, null_mask,
        st.mat_ext, st.backend,
        ref_dev=st.ref_ext_dev if st.streaming else st.ref_codes,
        reads_dev=reads_i8_dev)
    return st


def _leaf_finish(st: _LeafState, detail=None) -> list:
    return _finish_complete(
        st.req, st.fin, st.score, st.end_ref, st.end_read, st.score2,
        st.ref_end2, st.null_mask, detail=detail)


def _finish_batch(req: BatchRequest, score, end_ref, end_read, score2,
                  ref_end2, word, null_mask, mat_ext, backend):
    """Shared orchestration tail: begin-finding reverse pass per tier,
    filter/flag gating, banded traceback (ref: src/ssw.c:905-977)."""
    fin = _finish_launch(req, score, end_ref, end_read, word, null_mask,
                         mat_ext, backend)
    return _finish_complete(req, fin, score, end_ref, end_read, score2,
                            ref_end2, null_mask)


def _finish_launch(req: BatchRequest, score, end_ref, end_read, word,
                   null_mask, mat_ext, backend, ref_dev=None,
                   reads_dev=None):
    """Filter/flag gating + queue the per-tier begin-finding reverse
    passes (device); no downloads."""
    B = len(req.reads)
    ref_len = len(req.ref)

    # which reads need the reverse pass / cigar
    aligned = score > 0
    want_begin = np.zeros(B, dtype=bool)
    want_cigar = np.zeros(B, dtype=bool)
    f = req.flag
    for b in range(B):
        if not aligned[b] or null_mask[b]:
            continue
        if f == 0 or (f == 2 and score[b] < req.filters):
            continue
        want_begin[b] = True
        if (f & 7) == 0 or ((f & 2) and score[b] < req.filters):
            continue
        want_cigar[b] = True  # distance filter needs begins; re-checked below

    rev = []
    for tier in (False, True):  # reverse tier must match the forward tier
        sel = want_begin & (word == tier)
        if not sel.any():
            continue
        idx = np.nonzero(sel)[0]
        W = _window_len(int((end_read[idx] + 1).max()), ref_len, req.mat,
                        req.gapO, req.gapE)
        with _phase("reverse"):
            handle = _reverse_launch(req, idx, end_ref, end_read, score, W,
                                     mat_ext, tier, backend, ref_dev,
                                     reads_dev)
        rev.append((idx, handle))
    return aligned, want_begin, want_cigar, rev


def _finish_complete(req: BatchRequest, fin, score, end_ref, end_read,
                     score2, ref_end2, null_mask, detail=None):
    aligned, want_begin, want_cigar, rev = fin
    if detail is not None:
        # skip ONLY the traceback for masked reads — begins and the
        # reverse-pass warning stay (see align_batch_finish docstring)
        want_cigar = want_cigar & np.asarray(detail, dtype=bool)
    B = len(req.reads)
    mask_len = _as_masklen_array(req.mask_len, B)
    results: list[oracle.AlignResult | None] = []
    f = req.flag

    ref_begin = np.full(B, -1, dtype=np.int32)
    read_begin = np.full(B, -1, dtype=np.int32)
    miss_part = np.zeros(B, dtype=bool)
    for idx, handle in rev:
        with _phase("reverse"):
            rb, qb, rev_score = _reverse_complete(handle, idx, end_ref,
                                                  end_read)
        ref_begin[idx] = rb
        read_begin[idx] = qb
        # ref: src/ssw.c:932-935 — the banded traceback will miss a part
        miss_part[idx] = score[idx] > rev_score
    for _ in range(int(miss_part.sum())):
        sys.stderr.write("Warning: The alignment path of one pair of "
                         "sequences may miss a small part. "
                         "[ssw.c ssw_align]\n")

    cigar_jobs: list[tuple[int, oracle.AlignResult]] = []
    for b in range(B):
        if null_mask[b]:
            results.append(None)
            continue
        r = oracle.AlignResult()
        if not aligned[b]:
            results.append(r)
            continue
        r.score1 = int(score[b])
        r.ref_end1 = int(end_ref[b])
        r.read_end1 = int(end_read[b])
        if mask_len[b] >= 15:
            r.score2 = int(score2[b])
            r.ref_end2 = int(ref_end2[b])
        else:
            r.score2, r.ref_end2 = 0, -1
        if want_begin[b]:
            r.ref_begin1 = int(ref_begin[b])
            r.read_begin1 = int(read_begin[b])
            if miss_part[b]:
                r.flag = 2
        do_cigar = want_cigar[b]
        if do_cigar and (f & 4):
            if (r.ref_end1 - r.ref_begin1 > req.filterd or
                    r.read_end1 - r.read_begin1 > req.filterd):
                do_cigar = False
        if do_cigar:
            cigar_jobs.append((b, r))
        results.append(r)
    if cigar_jobs:
        # one threaded native call for the whole batch's tracebacks
        # (ref: src/ssw.c:940-957 runs per pair; pairs are independent)
        from ssw_tpu.ops import banded

        with _phase("traceback"):
            paths = banded.banded_cigar_batch(
                [req.ref[r.ref_begin1:r.ref_end1 + 1]
                 for _, r in cigar_jobs],
                [req.reads[b][r.read_begin1:r.read_end1 + 1]
                 for b, r in cigar_jobs],
                [r.score1 for _, r in cigar_jobs],
                req.gapO, req.gapE, req.mat)
        for (_, r), path in zip(cigar_jobs, paths):
            if path is None:
                r.flag = 1
            else:
                r.cigar = path
    return results


def align_batch_sharded(req: BatchRequest, mesh, backend: str = "auto") -> list:
    """align_batch with the forward pass + suboptimal scan running over a
    (data x seq) device mesh (reads data-parallel, target sequence-parallel
    with halo re-compute, collective best-hit merge — parallel/dist.py).
    The begin-finding reverse pass and traceback stay host-side (tiny).
    Bit-identical to align_batch (SURVEY.md section 2.3 design)."""
    B = len(req.reads)
    if B == 0:
        return []
    if req.gapO <= req.gapE:
        return pipeline_fallback(req)
    n = req.mat.shape[0]
    bias = matrix_bias(req.mat)
    ref_len = len(req.ref)
    mask_len = np.maximum(_as_masklen_array(req.mask_len, B), 0)

    D = mesh.shape["data"]
    S = mesh.shape["seq"]
    Bp = (B + D - 1) // D * D
    reads = list(req.reads) + [req.reads[0]] * (Bp - B)
    read_len = np.array([len(r) for r in reads], dtype=np.int32)
    ml = np.concatenate([mask_len, np.full(Bp - B, 15, np.int32)])

    max_rl = int(read_len.max())
    L = common.bucket_size(max(common.pad_total(max_rl, word=False), 1), 64)
    mat_ext = common.extend_matrix(req.mat)
    reads_padded = common.pad_reads(reads, L, pad_code=n).astype(np.int8)
    word_tier = req.score_size == 1
    quirk = needs_quirk(req.mat, req.gapE)
    max_sub = int(np.max(np.abs(req.mat)))
    if quirk and L * (max_sub + req.gapE) + req.gapO >= int(scan_sw.SEG_BUMP):
        return pipeline_fallback(req)

    # pad the target so every seq shard gets the same column count; the
    # virtual letter rides diagonally at zero cost and padded columns are
    # masked out of the suboptimal scan by ref_len
    halo = _window_len(max_rl, ref_len, req.mat, req.gapO, req.gapE)
    Rp = (ref_len + 256 * S - 1) // (256 * S) * (256 * S)
    ref_ext = np.full(halo + Rp, n, dtype=np.int32)
    ref_ext[halo:halo + ref_len] = req.ref
    ref_ext_dev = jnp.asarray(ref_ext)  # upload once (forward + rerun)

    from ssw_tpu.parallel import dist

    def fwd(prof, geo, word_mask):
        out = dist.sharded_forward(
            mesh, jnp.asarray(prof), ref_ext_dev,
            jnp.asarray(geo.read_len), jnp.asarray(geo.col_mask),
            jnp.asarray(geo.seg_id), jnp.asarray(geo.seg_start),
            req.gapO, req.gapE, jnp.asarray(ml), ref_len, halo, quirk,
            word_mask, backend=backend, max_sub=max_sub)
        return [np.array(x) for x in out]  # writable copies

    # speculative tier masks, like align_batch: when the quirk is off the
    # tiers differ only in col_mask row padding, so potentially-overflowing
    # reads get word rows (and word suboptimal edges) up front; only
    # might-but-didn't reads re-run, with byte rows.  Quirk on: word-tier
    # reads re-run with word geometry (the whole DP is tier-dependent).
    might = np.zeros(Bp, dtype=bool)
    if req.score_size == 2 and not quirk:
        might = read_len.astype(np.int64) * max_sub + bias >= 255
    word = np.full(Bp, word_tier)
    profile, cm_d, seg_d, ss_d = _prep_device(
        reads_padded, read_len, mat_ext, word | might, L, word_tier)
    geo = common.BatchGeometry(L, read_len, cm_d, seg_d, ss_d)
    score, end_ref, end_read, score2, ref_end2 = fwd(
        profile, geo, jnp.asarray(word | might))
    if req.score_size == 2:
        need_word = score + bias >= 255
        word[need_word] = True
        rerun = need_word if quirk else (might & ~need_word)
        rerun_word = bool(quirk)
        if rerun.any():
            # subset rerun (VERDICT round-1 item 6): pad the index set to a
            # stable compile shape that stays divisible by the data axis
            idx = np.nonzero(rerun)[0]
            k = len(idx)
            unit = 64 if 64 % D == 0 else 64 * D
            pad = common.round_up(k, unit) - k
            idx_p = np.concatenate([idx, np.repeat(idx[:1], pad)])
            prof_r, cm_r, seg_r, ss_r = _prep_device(
                reads_padded[idx_p], read_len[idx_p], mat_ext,
                np.full(len(idx_p), rerun_word), L, rerun_word)
            s_r, er_r, ed_r, s2_r, re2_r = (
                np.asarray(x)[:k] for x in dist.sharded_forward(
                    mesh, prof_r, ref_ext_dev,
                    jnp.asarray(read_len[idx_p]),
                    cm_r, seg_r, ss_r, req.gapO, req.gapE,
                    jnp.asarray(ml[idx_p]), ref_len, halo, quirk,
                    jnp.full(len(idx_p), rerun_word, bool),
                    backend=backend, max_sub=max_sub))
            score[idx] = s_r
            end_ref[idx] = er_r
            end_read[idx] = ed_r
            score2[idx] = s2_r
            ref_end2[idx] = re2_r
    score = np.where(word, np.minimum(score, 32767), score)

    # drop the data-parallel padding before the host stages (no duplicate
    # warnings / tracebacks), and honor score_size semantics like
    # align_batch (0: NULL on byte overflow; ref: src/ssw.c:887-891)
    score, end_ref, end_read = score[:B], end_ref[:B], end_read[:B]
    score2, ref_end2, word = score2[:B], ref_end2[:B], word[:B]
    null_mask = np.zeros(B, dtype=bool)
    if req.score_size == 0:
        null_mask = score + bias >= 255
        for _ in range(int(null_mask.sum())):  # ref: src/ssw.c:888
            sys.stderr.write(
                "Please set 2 to the score_size parameter of the function "
                "ssw_init, otherwise the alignment results will be "
                "incorrect.\n")
    # the host-side tail (begin-finding reverse pass) uses the same
    # backend selection as the single-device path: on a real TPU mesh the
    # Pallas per-read kernel runs on the local device (it is a
    # single-device pass over a tiny subset; no sharding needed)
    return _finish_batch(req, score, end_ref, end_read, score2,
                         ref_end2, word, null_mask, mat_ext,
                         pick_backend(backend))


def pipeline_fallback(req: BatchRequest) -> list:
    """Per-pair oracle path (bug-compatible lazy-F semantics when
    gapO <= gapE; see align_batch)."""
    mask_len = _as_masklen_array(req.mask_len, len(req.reads))
    return [
        oracle.ssw_align(r, req.ref, req.mat, req.gapO, req.gapE,
                         flag=req.flag, filters=req.filters,
                         filterd=req.filterd, mask_len=int(mask_len[b]),
                         score_size=req.score_size)
        for b, r in enumerate(req.reads)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("L", "W", "n", "gapO", "gapE", "quirk", "tier_word",
                     "pallas"))
def _reverse_core(reads_dev, er, ed, score1, ref_ext, mat_ext, *, L, W, n,
                  gapO, gapE, quirk, tier_word, pallas):
    """The begin-finding reverse chain as ONE compiled program, with the
    reversed read prefixes and per-read reversed reference windows built
    ON DEVICE (rev_reads[k, j] = read[k][ed[k] - j], refw[k, w] =
    ref[er[k] - w]; out-of-range -> the virtual letter n).  Eagerly this
    was two host Python loops + ~1 MB of per-leaf uploads + one chunked
    eager kernel dispatch per OPT_LANES batch chunk; see
    _subopt_stream_core for why dispatch count dominates on this link."""
    if pallas:
        from ssw_tpu.ops import pallas_sw
        rev_fn = pallas_sw.forward_perread_ref
    else:
        rev_fn = scan_sw.forward_perread_ref
    rl_rev = (ed + 1).astype(jnp.int32)
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = ed[:, None] - j
    rev_reads = jnp.where(
        src >= 0,
        jnp.take_along_axis(
            reads_dev, jnp.clip(src, 0, reads_dev.shape[1] - 1),
            axis=1).astype(jnp.int8),
        jnp.int8(n))
    w = jnp.arange(W, dtype=jnp.int32)[None, :]
    ridx = er[:, None] - w
    refw = jnp.where(ridx >= 0, ref_ext[jnp.clip(ridx, 0)], n)
    tiers = jnp.full(rl_rev.shape, tier_word, bool)
    profile, cm_d, seg_d, ss_d = _prep_core(rev_reads, rl_rev, mat_ext,
                                            tiers, tiers, L)
    s, rer, red = rev_fn(profile, refw, rl_rev, cm_d, seg_d, ss_d,
                         gapO, gapE, quirk,
                         terminate=score1.astype(jnp.int32))[:3]
    return jnp.stack([s, rer, red])


def _reverse_launch(req: BatchRequest, idx: np.ndarray, end_ref, end_read,
                    score1, W: int, mat_ext, tier_word: bool, backend,
                    ref_dev=None, reads_dev=None):
    """Queue the batched begin-finding pass over reversed prefixes (static
    window W) with the reference's terminate-at-score1 column-loop break
    (ref: src/ssw.c:918-930).  Returns a device handle; complete with
    _reverse_complete.

    ref_dev / reads_dev are optional device-resident copies of the padded
    target / padded reads shared with the leaf's other stages (one upload
    serves all); without them the target comes from the _device_ref cache
    and the subset's reads upload here (truncated to L: the reverse pass
    only reads codes up to end_read)."""
    n = req.mat.shape[0]
    Bs = len(idx)
    idx_p = idx
    if backend == "pallas":  # stable compile shapes (see align_batch)
        pad = common.round_up(Bs, 64) - Bs
        idx_p = np.concatenate([idx, np.repeat(idx[:1], pad)])
    Bp = len(idx_p)
    rl_rev = (end_read[idx_p] + 1).astype(np.int32)
    L = common.bucket_size(
        int(common.pad_total(int(rl_rev.max()), word=tier_word)), 64)
    if ref_dev is None:
        ref_dev = _device_ref(req.ref, n,
                              common.bucket_size(len(req.ref), 256))
    if reads_dev is not None and reads_dev.shape[1] >= L:
        sub_reads = reads_dev[jnp.asarray(idx_p), :L]
    else:
        reads_sub = np.full((Bp, L), n, dtype=np.int8)
        for k, b in enumerate(idx_p):
            rd = req.reads[b][:L]
            reads_sub[k, : len(rd)] = rd
        sub_reads = jnp.asarray(reads_sub)
    stacked = _reverse_core(
        sub_reads, jnp.asarray(end_ref[idx_p].astype(np.int32)),
        jnp.asarray(end_read[idx_p].astype(np.int32)),
        jnp.asarray(score1[idx_p].astype(np.int32)),
        ref_dev, jnp.asarray(common.extend_matrix(req.mat)),
        L=L, W=W, n=n, gapO=req.gapO, gapE=req.gapE,
        quirk=needs_quirk(req.mat, req.gapE), tier_word=tier_word,
        pallas=(backend == "pallas"))
    return (stacked, Bs)


def _reverse_complete(handle, idx, end_ref, end_read):
    """Download a _reverse_launch result and derive begins."""
    stacked, Bs = handle
    packed = np.array(stacked)
    s, er, ed = packed[0, :Bs], packed[1, :Bs], packed[2, :Bs]
    ref_begin = end_ref[idx] - er
    read_begin = end_read[idx] - ed
    return (ref_begin.astype(np.int32), read_begin.astype(np.int32), s)


def _reverse_pass(req: BatchRequest, idx: np.ndarray, end_ref, end_read,
                  score1, W: int, mat_ext, tier_word: bool, backend):
    """Synchronous launch + complete (kept for callers outside the
    pipelined flow)."""
    handle = _reverse_launch(req, idx, end_ref, end_read, score1, W,
                             mat_ext, tier_word, backend)
    return _reverse_complete(handle, idx, end_ref, end_read)


def attach_cigar(r: oracle.AlignResult, read: np.ndarray, ref: np.ndarray,
                 mat: np.ndarray, gapO: int, gapE: int):
    from ssw_tpu.ops import banded

    sub_ref = ref[r.ref_begin1:r.ref_end1 + 1]
    sub_read = read[r.read_begin1:r.read_end1 + 1]
    path = banded.banded_cigar(sub_ref, sub_read, r.score1, gapO, gapE, mat)
    if path is None:
        r.flag = 1
    else:
        r.cigar = path
