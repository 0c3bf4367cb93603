"""Pallas TPU kernel for the batched striped-SW forward pass.

TPU-first design notes (this is a re-design, not a port of the SSE kernel in
ref: src/ssw.c:197-386):

  * The reference's 8-bit/16-bit SIMD split becomes a value-range split over
    VPU lane width: the fast tier runs the DP in **int16** (2x vector
    registers per op vs int32), which is exact whenever the provable cell
    bound  L*(max|mat| + gapE) + gapO  fits in 14 bits — true for every DNA
    and most protein workloads, in both the reference's "byte" and "word"
    geometries (any cell is bounded by read_len * max(mat), so no saturation
    handling is needed, unlike the reference's clamp-at-255 path).  Workloads
    outside that bound, and the quirk path (whose segmented-scan bias needs
    headroom), run the int32 kernel.  NB: current Mosaic toolchains cannot
    legalize int16 vector max/sub/select (probed at runtime by
    _i16_supported, sweep in tools/probe_i16.py), so on hardware everything
    runs the int32 tier today at ~87% of its op-count speed of light
    (BENCH.md); the int16 tier auto-enables when a toolchain allows it.
  * Farrar's lazy-F correction loop becomes a log-depth prefix-max scan
    along the read dimension (Hillis-Steele with masked lane rolls); the
    reference's "E sees only lane-local F" quirk is a second scan over the
    same source with a per-read segmented reset (implemented by biasing
    each lane block into its own value range; int32 kernel only).
  * The reference grid iterates sequentially over reference-column blocks;
    H/E state and best-score trackers live in VMEM scratch that persists
    across grid steps.  Per-column maxima stream out to HBM for the
    suboptimal-score scan; batch layout is (B sublanes, L lanes).
  * F's zero-clamp is dropped (a negative F never beats h_tilde >= 0); E's
    zero-clamp is kept — it is semantically free (a negative E never wins a
    max against h_tilde >= 0) and bounds the value range.  Affine constants
    (decay - gapO, gapE - decay, lane masks) are folded outside the column
    loop.

Shapes: profile (n+1, B, L) int8 (upcast on device — the host link is the
scarce resource), ref (R,) int32 with R % COL_BLOCK == 0, geometry masks
(B, L) bool/int8.  Outputs match ops/scan_sw.forward_shared_ref.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 28)
NEG16 = -(2 ** 14)
SEG_BUMP = 2 ** 21
PACK_BUMP = 2 ** 17  # slot separation for packed rows: DP intermediates
                     # span < 2**16, so 2**17 keeps up to 2**14 slots
                     # strictly ordered inside int32
QBUMP = PACK_BUMP // 16  # sub-slot lane-block separation for the quirk's
                     # segmented scan on PACKED rows: a slot has at most 16
                     # blocks (byte tier), so block biases stay strictly
                     # inside one PACK_BUMP step and (slot, block) ordering
                     # is lexicographic; exact only while the slot-local
                     # value span  pack_bound*(max_sub+gapE)+gapO  < QBUMP
                     # (the planner guards; protein reads are far inside)
COL_BLOCK = 256
UNROLL = int(os.environ.get("SSW_TPU_UNROLL", "16"))
             # columns per loop iteration: 16 measured +25% on v5e
             # (amortizes loop bookkeeping and lets Mosaic keep
             # H/E/trackers in registers across columns); the env
             # override is a measurement knob (read once at import;
             # must divide COL_BLOCK, and the gate slack scales with it)
I16_HEADROOM = 2 ** 14  # cell-value bound that makes the int16 tier exact
GATE_RADIUS = 64   # truncated prefix-max radius for gated column groups
GATE_RADIUS2 = 128  # wide second tier — measurement-only (SSW_TPU_GATE2=1):
                    # the s=128 scan level it would skip is a whole-vreg
                    # move that Mosaic issues for ~free (measured:
                    # kernel_lab r3e!128 == enc within noise), so the tier
                    # is dead branch weight in production (BENCH.md r4)
NOISE_CEIL_PER_SUB = 21  # auto-disable heuristic: a gate tier only pays if
                    # its threshold clears the noise ceiling of a 32k-lane
                    # chunk, else the branch + hm reduce are pure overhead
                    # (measured -1.7% at default penalties, BENCH.md r4).
                    # Karlin-Altschul for a balanced +-m DNA matrix gives
                    # lambda = ln(3)/m, so E[max noise H over lanes*window
                    # ~ 2^27 cells] ~= ln(2^27)/lambda + 4/lambda tail
                    # ~= 21*m.  Defaults m2/x2/o3/e1: threshold 34 < 42 ->
                    # off (measured noise 55-82 confirms it cannot open);
                    # m1/x3/o5/e2: threshold 83 > 21 -> on (measured open
                    # ~100% of noise columns).


def _shift_right(x, s, fill):
    """Shift lanes right by s, filling vacated lanes with `fill`.  Lowered by
    Mosaic as pad+slice (works for 16- and 32-bit lanes; pltpu.roll would
    need an extra iota/select for the fill and only supports 32-bit)."""
    return jnp.pad(x, ((0, 0), (s, 0)), constant_values=fill)[:, :-s]


def _prefix_max(x, L, neg, bound=None):
    """Inclusive prefix max along the last axis (log-depth shifted maxes).
    `bound` limits the scan radius (enough for segmented scans whose segments
    are at most `bound` long)."""
    s = 1
    limit = L if bound is None else min(bound, L)
    while s < limit:
        x = jnp.maximum(x, _shift_right(x, s, neg))
        s *= 2
    return x


def _forward_kernel(ref_ref,           # SMEM (1, 1, COL_BLOCK) ref codes
                    idx_ref,           # SMEM (1, 1, COL_BLOCK) global col idx
                    own_ref,           # SMEM (1, 1, COL_BLOCK) 0/1 best gate
                    profile_ref,       # VMEM (n1, B, L) dt
                    dmg_ref,           # VMEM (B, L) dt: decay - gapO
                    gmd_ref,           # VMEM (B, L) dt: gapE - decay
                    maskneg_ref,       # VMEM (B, L) dt: 0 valid / neg pad
                    seg_bias_ref,      # VMEM (B, L) int32 seg_id * SEG_BUMP
                    seg_reset_ref,     # VMEM (B, L) int32 0/1
                    *refs,             # outputs + scratch, mode-dependent:
                                       # blockmax: maxcol (1,B,S) int32 acc,
                                       #   bv (B,L) dt, bc (B,L) int32,
                                       #   scratch H, E, rv (B,L) dt,
                                       #   rc (B,L) int32
                                       # else: maxcol (B,COL_BLOCK) dt,
                                       #   gmax/end_ref (B,1) int32,
                                       #   h_best (B,L) dt, scratch H, E
                    gapO: int, gapE: int, L: int, quirk: bool, dt,
                    blockmax: bool = False, gate_sub: int | None = None,
                    gate_radii: tuple = (),
                    packed: bool = False, pack_bound: int | None = None,
                    S: int = 1, dual: bool = False):
    block = pl.program_id(0)
    neg = dt(NEG16 if dt == jnp.int16 else NEG)
    neg_i = NEG16 if dt == jnp.int16 else NEG
    gate = gate_sub is not None and bool(gate_radii)
    assert not (dual and quirk)  # dual-tier rests on tier-independent DP

    if quirk and packed:
        # extra input: per-lane block bias (qseg * QBUMP) for the quirk's
        # segmented scan — seg_bias_ref keeps the slot id (extraction)
        qbias_ref, *refs = refs
        refs = tuple(refs)
    if dual:
        # extra input: word-tier validity (subset of col_mask's byte-tier
        # span).  The blockmax merge emits BOTH tiers' per-slot maxima in
        # one pass — the only tier-dependent observable when the quirk is
        # off is which pad rows feed maxColumn (ref: the 16- vs 8-lane
        # stripe padding, src/ssw.c:163-188 vs :388-410), so one extra
        # masked reduce per 256 columns replaces the whole word-geometry
        # rerun of might-overflow reads (BENCH.md round 4)
        wmask_ref, *refs = refs
        refs = tuple(refs)

    enc = blockmax and dt != jnp.int16
    if blockmax:
        # lanetrack mode: per-lane (value, first-attainment column)
        # trackers defer every cross-lane reduce to one segmented reduce
        # per 256-column grid step — the per-column reduce is the
        # dominant tracker cost (~17% of kernel time, BENCH.md).  The
        # global best and end positions are reconstructed outside the
        # kernel from (bv, bc); the per-block maxima feed the streaming
        # suboptimal scan (its full-resolution columns are rebuilt by
        # bounded window re-runs).  int32 tier (`enc`): the block-local
        # tracker is ONE int32 per lane, t = H*256 + (255 - j) — a single
        # running max keeps the highest H and, among equal H, the
        # earliest column (3 vector ops/column; own-gating rides the
        # scalar constant).  int16 tier keeps the split (rv, rc) pair
        # (the encoding needs 23 bits).  Either way the global (bv, bc)
        # merge is one decode+where-pair per 256-column grid step, and
        # merge-on-strict-improvement preserves first attainment across
        # blocks.
        if enc:
            maxcol_ref, bv_ref, bc_ref, H_ref, E_ref, rv_ref = refs[:6]
            rc_ref = None
        else:
            maxcol_ref, bv_ref, bc_ref, H_ref, E_ref, rv_ref, rc_ref = \
                refs[:7]
    else:
        maxcol_ref, gmax_ref, end_ref_ref, h_best_ref, H_ref, E_ref = refs[:6]
    hm_ref = refs[(6 if enc else 7) if blockmax else 6] if gate else None

    @pl.when(block == 0)
    def _init():
        H_ref[...] = jnp.zeros_like(H_ref)
        E_ref[...] = jnp.zeros_like(E_ref)
        if gate:
            hm_ref[0, 0] = 0
        if blockmax:
            bv_ref[...] = jnp.zeros_like(bv_ref)
            bc_ref[...] = jnp.full_like(bc_ref, -1)
        else:
            gmax_ref[...] = jnp.zeros_like(gmax_ref)
            end_ref_ref[...] = jnp.full_like(end_ref_ref, -1)
            h_best_ref[...] = jnp.zeros_like(h_best_ref)

    dmg = dmg_ref[...]
    gmd = gmd_ref[...]
    maskneg = maskneg_ref[...]
    zero = dt(0)
    if blockmax:
        # block-local per-lane maxima, reduced once at the end of the step.
        # Lane validity moves out of the per-column tracker compare (one
        # vector add per column) into the block init: invalid lanes start
        # at +big, which no per-column candidate can exceed (encoded
        # t < 2^23; unencoded Hm = H + off has H < -neg_i, off <= 0), and
        # are restored to the inert `neg` in the end-of-step merge.
        invalid = maskneg < zero
        if enc:
            rv_ref[...] = jnp.where(invalid, jnp.int32(2 ** 30),
                                    jnp.int32(0))
        else:
            rv_ref[...] = jnp.where(invalid, dt(-neg_i), neg)
        if dual:
            wm = wmask_ref[...] > 0  # loop-invariant word-tier validity
    if quirk or packed:
        seg_bias = seg_bias_ref[...]
        rst = seg_reset_ref[...] > 0  # loop-invariant: hoisted compare
    if packed:
        # the h_diag cut fires at SLOT starts only (the diagonal moves
        # freely across a slot's lane blocks); under quirk, rst also
        # marks block starts, so recover slot starts from the gmd poison
        rst_slot = (gmd == neg) if quirk else rst
    if quirk:
        # packed rows: decay_q inherits the slot bias folded into gmd
        # (sb[k-1]); it cancels against cs's +sb[k-1] for in-block sources,
        # and rst covers every block/slot start (incl. the NEG-poisoned
        # slot-start lanes, whose decay_q is garbage)
        decay_q = -(gmd.astype(jnp.int32) - gapE)
        qb = qbias_ref[...] if packed else seg_bias
        qbound = max((pack_bound if packed else L) // 8, 1)

    def run_group(jj, bound):
      if packed:
          # slot boundaries bound intra-slot F propagation; compose with
          # the gate's truncation when active
          bound = pack_bound if bound is None else min(bound, pack_bound)
      for u in range(UNROLL):
        j = jj * UNROLL + u
        code = ref_ref[0, 0, j]
        sub = profile_ref[code]
        H = H_ref[...]
        E = E_ref[...]
        h_shift = _shift_right(H, 1, zero)
        if packed:
            # slot-start lanes are read position 0: no diagonal from the
            # previous slot's read (the F cut is free — gmd is poisoned to
            # NEG at slot starts by the caller)
            h_shift = jnp.where(rst_slot, zero, h_shift)
        h_diag = h_shift + sub
        # no 0-clamp on h_tilde: E >= 0 always (its own update clamps), so
        # max(h_diag, E) >= 0 already
        h_tilde = jnp.maximum(h_diag, E)
        c = h_tilde + dmg
        # packed rows need no bias ops here: the per-slot bias (which makes
        # cross-slot carries inert, landing ~PACK_BUMP below any real value)
        # is folded into dmg, and its removal into gmd — both per-lane
        # constants — by _forward_call, so the slot-segmented scan costs
        # exactly what the plain scan does
        cm = _prefix_max(c, L, neg, bound=bound)
        F = _shift_right(cm, 1, neg) + gmd      # no 0-clamp: h_tilde >= 0
        H = jnp.maximum(h_tilde, F)
        if quirk:
            # lane-block-segmented scan; segments (slot lane-blocks when
            # packed) are <= bound long so the scan radius is bounded (the
            # bias pushes other segments out of range, making
            # cross-segment carries inert: packed rows order candidates
            # lexicographically by (slot*PACK_BUMP via c, block*QBUMP via
            # qb), with QBUMP above the slot-local value span)
            cs = _prefix_max(c + qb, L, neg, bound=qbound) - qb
            F_loc = _shift_right(cs, 1, neg) - decay_q + gapE
            F_loc = jnp.where(rst, 0, jnp.maximum(F_loc, 0))
            h_fp = jnp.maximum(h_tilde, F_loc)
        else:
            h_fp = H
        E = jnp.maximum(jnp.maximum(E - dt(gapE), h_fp - dt(gapO)), zero)
        H_ref[...] = H
        E_ref[...] = E

        if enc:
            # encoded tracker: t = H*256 + (255 - j); ties in H keep the
            # earlier column (255 - j larger).  own-gating rides the
            # scalar constant (non-own columns sink to -2^30, below every
            # valid t >= 0; lane validity lives in the rv init).  Needs
            # H < 2^23, far above any real cell bound (read_len*max|mat|),
            # and idx == block*COL_BLOCK + j, which both blockmax callers
            # guarantee (idx_blocks = arange).
            own = own_ref[0, 0, j]
            k = own * jnp.int32(2 ** 30 + 255 - j) - jnp.int32(2 ** 30)
            rv_ref[...] = jnp.maximum(rv_ref[...], H * jnp.int32(256) + k)
        elif blockmax:
            # int16 tier: split (rv, rc) pair, own-gating as an offset
            off = ((jnp.int32(1) - own_ref[0, 0, j])
                   * jnp.int32(neg_i)).astype(dt)
            Hm = H + off  # lane validity lives in the rv init, not here
            rv = rv_ref[...]
            m = Hm > rv
            rv_ref[...] = jnp.where(m, Hm, rv)
            rc_ref[...] = jnp.where(m, idx_ref[0, 0, j], rc_ref[...])
        else:
            colmax = jnp.max((H + maskneg).astype(jnp.int32), axis=1,
                             keepdims=True)  # (B, 1) int32
            own = own_ref[0, 0, j] > 0
            # lane-masked select instead of a single-lane dynamic store
            # (Mosaic requires lane offsets to be 128-aligned)
            lane = jax.lax.broadcasted_iota(jnp.int32,
                                            (colmax.shape[0], COL_BLOCK), 1)
            maxcol_ref[...] = jnp.where(lane == j, colmax.astype(dt),
                                        maxcol_ref[...])
            gmax = gmax_ref[...]
            upd = (colmax > gmax) & own
            gmax_ref[...] = jnp.where(upd, colmax, gmax)
            end_ref_ref[...] = jnp.where(upd, idx_ref[0, 0, j],
                                         end_ref_ref[...])
            h_best_ref[...] = jnp.where(upd, H, h_best_ref[...])
      if gate:
          # max over VALID lanes only: pad lanes do carry real, undecayed
          # values diagonally, but carries flow strictly rightward and
          # valid lanes are a prefix of the row (or of their slot, whose
          # boundary the pack bias cuts), so a hot pad lane can only
          # corrupt other pad lanes — unobservable.  Masking keeps a hot
          # read's pad transit from shutting the gate for the whole chunk.
          hm_ref[0, 0] = jnp.max((H_ref[...] + maskneg).astype(jnp.int32))

    if gate:
        # exact bounded-radius scan: F(k) only sees carries from lanes
        # k' >= k - radius + 1 after truncation; a dropped carry is
        #   h_tilde(k') - gapO - d*gapE  with  d >= radius,
        # inert (< 0, and H = max(h_tilde >= 0, F)) whenever
        #   max h_tilde <= gapO + (radius - 1)*gapE.
        # Within a 16-column group, max h_tilde grows by at most max_sub
        # per column from the gate sample, hence the UNROLL*max_sub slack.
        # Tiers (tightest first, from gate_radii): each group runs at the
        # tightest radius whose threshold admits the current max H, else
        # the full scan — one pl.when branch per tier + one for full.
        tiers = [(r, gapO + (r - 1) * gapE - UNROLL * gate_sub)
                 for r in gate_radii]

        def body(jj, _):
            hm = hm_ref[0, 0]
            lo = None
            for r, t in tiers:
                cond = (hm <= t) if lo is None else ((hm <= t) & (hm > lo))

                @pl.when(cond)
                def _tier(r=r):
                    run_group(jj, r)

                lo = t

            @pl.when(hm > lo)
            def _full():
                run_group(jj, None)

            return 0
    else:
        def body(jj, _):
            run_group(jj, None)
            return 0

    jax.lax.fori_loop(0, COL_BLOCK // UNROLL, body, 0)

    if blockmax:
        # merge the block-local tracker into the global (bv, bc) pair
        # (strict improvement keeps first-attainment order), and one
        # cross-lane reduce per 256 columns (floored at 0, matching
        # second_best_batch's disallowed->0).  Invalid lanes (held at +big
        # through the step so the per-column compare needs no mask add)
        # re-enter as the inert `neg` here.
        if enc:
            raw = rv_ref[...]
            rv = jnp.where(invalid, neg, raw >> 8)          # decoded value
            imp = rv > bv_ref[...]
            bv_ref[...] = jnp.where(imp, rv, bv_ref[...])
            col = (jnp.int32(block * COL_BLOCK + 255)
                   - (raw & jnp.int32(255)))                # decoded column
            bc_ref[...] = jnp.where(imp, col, bc_ref[...])
        else:
            rv = jnp.where(invalid, neg, rv_ref[...])
            imp = rv > bv_ref[...]
            bv_ref[...] = jnp.where(imp, rv, bv_ref[...])
            bc_ref[...] = jnp.where(imp, rc_ref[...], bc_ref[...])
        if packed:
            # per-slot block maxima: S masked reduces per 256 columns
            # (~5*S/256 vector ops per column; the pack planner caps S).
            # Slots are identified by their bias value — no extra input.
            # dual: channels [S, 2S) carry the word-tier (wm-restricted)
            # maxima of the same slots.
            rv32 = rv.astype(jnp.int32)
            S2 = 2 * S if dual else S
            lane_s = jax.lax.broadcasted_iota(
                jnp.int32, (rv.shape[0], S2), 1)
            for s in range(S):
                in_slot = seg_bias == s * PACK_BUMP
                mS = jnp.max(jnp.where(in_slot, rv32, jnp.int32(NEG)),
                             axis=1, keepdims=True)
                maxcol_ref[0] = jnp.where(lane_s == s,
                                          jnp.maximum(mS, 0),
                                          maxcol_ref[0])
                if dual:
                    mW = jnp.max(jnp.where(in_slot & wm, rv32,
                                           jnp.int32(NEG)),
                                 axis=1, keepdims=True)
                    maxcol_ref[0] = jnp.where(lane_s == S + s,
                                              jnp.maximum(mW, 0),
                                              maxcol_ref[0])
        elif dual:
            rv32 = rv.astype(jnp.int32)
            mb = jnp.maximum(jnp.max(rv32, axis=1, keepdims=True), 0)
            mw = jnp.maximum(
                jnp.max(jnp.where(wm, rv32, jnp.int32(NEG)), axis=1,
                        keepdims=True), 0)
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (rv.shape[0], 2), 1)
            maxcol_ref[0] = jnp.where(lane2 == 0, mb, mw)
        else:
            maxcol_ref[0] = jnp.maximum(
                jnp.max(rv.astype(jnp.int32), axis=1, keepdims=True),
                0)


@functools.partial(jax.jit, static_argnames=("gapO", "gapE", "quirk",
                                              "use_i16", "interpret",
                                              "blockmax", "gate_sub",
                                              "gate_radii",
                                              "packed", "pack_bound", "S",
                                              "dual"))
def _forward_call(profile, ref_blocks, idx_blocks, own_blocks, col_mask,
                  seg_id, seg_start, gapO: int, gapE: int,
                  quirk: bool = True, use_i16: bool = False,
                  interpret: bool = False, blockmax: bool = False,
                  gate_sub: int | None = None, gate_radii: tuple = (),
                  packed: bool = False,
                  pack_bound: int | None = None, S: int = 1,
                  lane_off=None, qbias=None, dual: bool = False,
                  wmask=None):
    n1, B, L = profile.shape
    nblocks = ref_blocks.shape[0]
    dt = jnp.int16 if use_i16 else jnp.int32
    neg = NEG16 if use_i16 else NEG
    gated = gate_sub is not None and bool(gate_radii)
    S2 = 2 * S if dual else S
    kernel = functools.partial(_forward_kernel, gapO=gapO, gapE=gapE, L=L,
                               quirk=quirk, dt=dt, blockmax=blockmax,
                               gate_radii=gate_radii,
                               gate_sub=gate_sub, packed=packed,
                               pack_bound=pack_bound, S=S, dual=dual)
    if lane_off is None:
        decay = (jnp.arange(L, dtype=jnp.int32) * gapE)[None, :]
        decay = jnp.broadcast_to(decay, (B, L))
    else:
        # packed rows: the gap decay restarts at every slot
        decay = lane_off.astype(jnp.int32) * gapE
    dmg = (decay - gapO).astype(dt)
    gmd = (gapE - decay).astype(dt)
    maskneg = jnp.where(col_mask > 0, 0, neg).astype(dt)
    bump = PACK_BUMP if packed else SEG_BUMP
    seg_bias = seg_id.astype(jnp.int32) * bump  # upcast BEFORE the bias
    seg_prev = jnp.pad(seg_id, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    slot_reset = (seg_start.astype(bool)
                  | (seg_prev != seg_id)).astype(jnp.int32)
    seg_reset = slot_reset
    if packed and qbias is not None:
        # quirk + packed: the segmented scan resets at every lane-block
        # start inside a slot, not just at slot starts (the gmd poison
        # below still keys on slot starts only)
        qprev = jnp.pad(qbias, ((0, 0), (1, 0)),
                        constant_values=-1)[:, :-1]
        seg_reset = (slot_reset.astype(bool)
                     | (qprev != qbias)).astype(jnp.int32)
    if packed:
        # fold the slot bias into the per-lane affine constants: c arrives
        # pre-biased through dmg, and F's un-bias rides gmd (whose 1-lane
        # shift matches shift(cm): F[k] = cm'[k-1] + gmd'[k] uses
        # seg_bias[k-1], equal to seg_bias[k] at slot-interior lanes) —
        # deleting both per-column bias ops from the DP loop.  The
        # slot-start poison (free F cut: a NEG gmd can never beat
        # h_tilde >= 0) is applied last so it dominates; it must also
        # dominate the *biased* cm, hence the S guard (pack_plan caps
        # max_slots at 64 anyway).
        assert S * PACK_BUMP < -NEG // 16
        dmg = dmg + seg_bias
        gmd = gmd - jnp.pad(seg_bias, ((0, 0), (1, 0)))[:, :-1]
        gmd = jnp.where(slot_reset > 0, dt(neg), gmd)
    vmem = lambda: pl.BlockSpec((B, L), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    if blockmax:
        # lanetrack outputs: per-slot block maxima + per-lane (value,
        # first-attainment column) trackers; gmax/end_ref/end_read are
        # reconstructed by the caller.  The maxima land as (nblocks, B, S)
        # with the grid step as the MAJOR axis: Mosaic requires the last
        # two block dims to be (8, 128)-divisible or equal to the array's,
        # and (B, S) blocks of a (B, nblocks*S) array satisfy neither for
        # S < 128 — (1, B, S) blocks of (nblocks, B, S) trivially do.
        out_shape = (
            jax.ShapeDtypeStruct((nblocks, B, S2), jnp.int32),
            jax.ShapeDtypeStruct((B, L), dt),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        )
        out_specs = (
            pl.BlockSpec((1, B, S2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem(), vmem(),
        )
        if use_i16:  # split (rv, rc) tracker pair
            scratch = [pltpu.VMEM((B, L), dt)] * 3 + [pltpu.VMEM((B, L),
                                                                 jnp.int32)]
        else:        # encoded tracker: H, E, rv only (no rc)
            scratch = [pltpu.VMEM((B, L), jnp.int32)] * 3
        if gated:
            scratch.append(pltpu.SMEM((1, 1), jnp.int32))
    else:
        out_shape = (
            jax.ShapeDtypeStruct((B, nblocks * COL_BLOCK), dt),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, L), dt),
        )
        out_specs = (
            pl.BlockSpec((B, COL_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vmem(),
        )
        scratch = [pltpu.VMEM((B, L), dt)] * 2
        if gated:
            scratch.append(pltpu.SMEM((1, 1), jnp.int32))
    in_specs = [
        pl.BlockSpec((1, 1, COL_BLOCK), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, COL_BLOCK), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, COL_BLOCK), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n1, B, L), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        vmem(), vmem(), vmem(), vmem(), vmem(),
    ]
    operands = [ref_blocks, idx_blocks, own_blocks, profile.astype(dt),
                dmg, gmd, maskneg, seg_bias, seg_reset]
    if quirk and packed:
        in_specs.append(vmem())
        operands.append(qbias)
    if dual:
        in_specs.append(vmem())
        operands.append(wmask)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    cost = pl.CostEstimate(
        flops=int(nblocks * COL_BLOCK) * B * L * 40,
        bytes_accessed=int(nblocks * COL_BLOCK) * B * 4,
        transcendentals=0,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
    if blockmax:
        # restore the (B, nblocks*S2) layout every consumer expects; this
        # is a cheap HBM pass over an array already COL_BLOCK x smaller
        # than the per-column maxima it replaces
        mc = jnp.transpose(res[0], (1, 0, 2)).reshape(B, nblocks * S2)
        res = (mc,) + res[1:]
    return res


_I16_OK: bool | None = None


def _i16_supported() -> bool:
    """Whether the backend can compile int16 vector arithmetic.  Mosaic's
    int16 support varies by libtpu build (the current axon toolchain aborts
    on arith.maxsi/subi over int16 vectors), so probe once with a tiny
    kernel and cache the answer; interpret mode (CPU) always works."""
    global _I16_OK
    if _I16_OK is None:
        import os
        if os.environ.get("SSW_TPU_I16", "1") == "0":
            # escape hatch: on toolchains where the Mosaic compiler aborts
            # in-process (rather than failing the remote compile RPC like
            # this harness), the probe below cannot catch the crash
            _I16_OK = False
        elif jax.devices()[0].platform == "cpu":
            _I16_OK = True
        else:
            def probe(x_ref, o_ref):
                v = jnp.maximum(x_ref[...] - jnp.int16(1), jnp.int16(0))
                o_ref[...] = _shift_right(v, 1, jnp.int16(-3))

            try:
                x = jnp.zeros((8, 128), jnp.int16)
                jax.block_until_ready(pl.pallas_call(
                    probe,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16))(x))
                # compile probe passed — but a toolchain that LEGALIZES i16
                # may still MIScompile it (VERDICT r2 item 8): require a
                # device-side numerics parity check of the real kernel
                # before the tier can ever auto-enable
                _I16_OK = _i16_parity_ok()
            except Exception:  # compile-time NotImplemented/abort
                _I16_OK = False
    return _I16_OK


def _i16_parity_ok() -> bool:
    """Run the forward kernel on-device in int16 and int32 on a workload
    inside the i16_exact bound and require identical outputs.  Uses fixed
    seeds so the gate is deterministic."""
    try:
        import numpy as np
        rng = np.random.default_rng(7)
        B, L, R, n1 = 64, 128, 512, 6
        mat = np.array([[2 if i == j else -2 for j in range(5)]
                        for i in range(5)], np.int8)
        reads = rng.integers(0, 4, (B, L)).astype(np.int64)
        prof = np.zeros((n1, B, L), np.int8)  # kernel layout (n1, B, L)
        prof[:5] = mat[:, reads]
        ref = jnp.asarray(rng.integers(0, 4, R).astype(np.int32))
        ref_blocks = jnp.pad(ref, (0, COL_BLOCK - R % COL_BLOCK)
                             if R % COL_BLOCK else (0, 0)).reshape(
                                 -1, 1, COL_BLOCK)
        idx_blocks = jnp.arange(ref_blocks.size,
                                dtype=jnp.int32).reshape(ref_blocks.shape)
        own = jnp.ones(ref_blocks.shape, jnp.int32)
        cm = jnp.ones((B, L), jnp.int32)
        seg = jnp.zeros((B, L), jnp.int8)
        ss = jnp.zeros((B, L), jnp.int32).at[:, 0].set(1)
        outs = []
        for use in (False, True):
            o = _forward_call(jnp.asarray(prof), ref_blocks, idx_blocks,
                              own, cm, seg, ss, 3, 1, quirk=False,
                              use_i16=use, interpret=False)
            outs.append([np.asarray(x.astype(jnp.int32)) for x in o])
        return all(np.array_equal(a, b) for a, b in zip(*outs))
    except Exception:
        return False


def gate_plan(L: int, gapO: int, gapE: int, max_sub: int | None,
              pack_bound: int | None = None
              ) -> tuple[int | None, tuple[int, ...]]:
    """(gate_sub, radii): the bounded-radius scan tiers that are provable
    and profitable, tightest first; (None, ()) disables the gate.  A tier
    needs max|mat| for its growth slack, a scan longer than its radius to
    have anything to save (for packed rows the effective scan length is
    the slot bound, not the row width), a positive threshold (otherwise no
    group can ever take that branch and it is dead weight), and — unless
    SSW_TPU_GATESCAN=force — a threshold above the chunk's noise ceiling
    (NOISE_CEIL_PER_SUB * max_sub; a tier whose threshold sits below the
    typical all-lanes max H never opens and only costs its branch).
    SSW_TPU_GATE2=1 adds the radius-128 tier (measurement only — the
    s=128 scan level is free, see GATE_RADIUS2)."""
    import os
    mode = os.environ.get("SSW_TPU_GATESCAN", "1")
    if max_sub is None or mode == "0":
        return None, ()
    eff = L if pack_bound is None else min(L, pack_bound)
    allowed = ((GATE_RADIUS, GATE_RADIUS2)
               if os.environ.get("SSW_TPU_GATE2", "0") == "1"
               else (GATE_RADIUS,))
    floor = 0 if mode == "force" else NOISE_CEIL_PER_SUB * max_sub
    radii = tuple(
        r for r in allowed
        if r < eff and gapO + (r - 1) * gapE - UNROLL * max_sub > floor)
    if not radii:
        return None, ()
    return int(max_sub), radii


def gate_sub_for(L: int, gapO: int, gapE: int,
                 max_sub: int | None) -> int | None:
    """max_sub when any bounded-radius scan tier is provable and
    profitable, else None (gate off).  See gate_plan."""
    return gate_plan(L, gapO, gapE, max_sub)[0]


def i16_exact(L: int, gapO: int, gapE: int, max_sub: int | None,
              quirk: bool) -> bool:
    """True when the int16 tier is provably exact: every DP cell is bounded
    by L*max|mat| (scores only accumulate over read positions), and all
    intermediates (c = h + decay - gapO, F fills at NEG16 - decay) stay
    inside int16.  The quirk path needs the SEG_BUMP bias headroom -> i32."""
    if quirk or max_sub is None:
        return False
    return L * (max_sub + gapE) + gapO < I16_HEADROOM


# Measured on v5e: one column step has a ~1us serial-dependency latency
# regardless of width, and ~32k lanes saturate it exactly; wider batches go
# throughput-bound at ~25% lower per-lane rate.  Oversized batches are
# therefore split into sweet-spot chunks that queue back-to-back on the
# device stream.
OPT_LANES = 32768


def forward_shared_ref(profile, ref, read_len, col_mask, seg_id, seg_start,
                       gapO: int, gapE: int, quirk: bool = True,
                       max_sub: int | None = None, blockmax: bool = False,
                       valid_len: int | None = None, wmask=None):
    """Drop-in equivalent of scan_sw.forward_shared_ref running the Pallas
    kernel.  profile here is (B, n1, L) like the scan path; transposed and
    re-blocked internally.  max_sub = max|substitution score| enables the
    int16 fast tier when the value range allows it.

    blockmax: emit (B, ceil(R/COL_BLOCK)) per-block column maxima (int32,
    >= 0, unclamped) instead of the full (B, R) per-column array — the
    bounded-memory streaming suboptimal-scan input.  valid_len gates which
    columns contribute (i < valid_len; defaults to R).  Scores/ends are
    identical either way (padded columns can never strictly exceed the
    running max).

    wmask (round 4, blockmax + quirk-off only): word-tier validity masks;
    col_mask must then be the BYTE-tier (superset) masks, and the maxcol
    output becomes (B, 2, nblk) — both tiers' block maxima from ONE pass
    (tier affects only which pad rows feed maxColumn when the quirk is
    off), replacing the word-geometry rerun of might-overflow reads."""
    B, n1, L = profile.shape
    R = ref.shape[0]
    Rp = (R + COL_BLOCK - 1) // COL_BLOCK * COL_BLOCK
    ref_padded = jnp.full((Rp,), n1 - 1, dtype=jnp.int32).at[:R].set(ref)
    ref_blocks = ref_padded.reshape(Rp // COL_BLOCK, 1, COL_BLOCK)
    idx_blocks = jnp.arange(Rp, dtype=jnp.int32).reshape(ref_blocks.shape)
    if blockmax:
        vl = R if valid_len is None else valid_len
        own_blocks = (idx_blocks < jnp.int32(vl)).astype(jnp.int32)
    else:
        own_blocks = jnp.ones(ref_blocks.shape, jnp.int32)
    interpret = jax.devices()[0].platform == "cpu"
    use_i16 = i16_exact(L, gapO, gapE, max_sub, quirk) and _i16_supported()
    gate_sub, gate_radii = gate_plan(L, gapO, gapE, max_sub)
    dual = wmask is not None
    assert not (dual and (quirk or not blockmax))

    b_opt = max(8, (OPT_LANES // max(L, 1)) // 8 * 8)
    outs = []
    for lo in range(0, B, b_opt):
        hi = min(lo + b_opt, B)
        Bc = hi - lo
        # pad partial chunks up to a multiple of 64 rows so the set of
        # compiled kernel shapes stays small across varying batch sizes
        Bp = min(b_opt, (Bc + 63) // 64 * 64)
        pad = Bp - Bc

        def take(arr, fill):
            part = arr[lo:hi]  # narrow host dtype; kernels upcast on device
            if pad:
                part = jnp.concatenate(
                    [part, jnp.full((pad,) + part.shape[1:], fill,
                                    part.dtype)])
            return part

        prof = profile[lo:hi]
        if pad:
            prof = jnp.concatenate(
                [prof, jnp.zeros((pad,) + prof.shape[1:], prof.dtype)])
        res = _forward_call(
            jnp.transpose(prof, (1, 0, 2)), ref_blocks, idx_blocks,
            own_blocks, take(col_mask, 0), take(seg_id, 0),
            take(seg_start, 1), gapO, gapE, quirk, use_i16, interpret,
            blockmax, gate_sub, gate_radii, dual=dual,
            wmask=take(wmask, 0).astype(jnp.int32) if dual else None)
        # finalize like the scan path (padded rows sliced away)
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        rl = read_len[lo:hi]
        if blockmax:
            # reconstruct the global trackers from the per-lane (value,
            # first-attainment column) pairs: the global max first appears
            # at the earliest first-attainment among lanes holding it, and
            # end_read is the lowest such lane at that column (a lane has
            # H == gmax at column end_ref iff its tracker reads
            # (gmax, end_ref) — running maxes only strictly increase)
            maxcol, bv, bc = res
            bv32 = bv[:Bc].astype(jnp.int32)
            bc = bc[:Bc]
            gmax = jnp.max(bv32, axis=1, keepdims=True)  # >= 0: bv init 0
            is_g = (bv32 == gmax) & (gmax > 0)
            end_ref = jnp.min(jnp.where(is_g, bc, jnp.int32(2 ** 30)),
                              axis=1)
            end_ref = jnp.where(gmax[:, 0] > 0, end_ref, -1)
            hit = is_g & (bc == end_ref[:, None]) & (j < rl[:, None])
            if dual:
                # (B, nblk*2) interleaved channels -> (B, 2, nblk)
                nblk = maxcol.shape[1] // 2
                mc_out = maxcol[:Bc].reshape(Bc, nblk, 2).transpose(0, 2, 1)
            else:
                mc_out = maxcol[:Bc]
        else:
            maxcol, gmax, end_ref, h_best = res
            gmax = gmax[:Bc]
            end_ref = end_ref[:Bc, 0]
            hit = ((h_best[:Bc].astype(jnp.int32) == gmax)
                   & (j < rl[:, None]) & (gmax > 0))
            # clip: lower bound restores the scan path's 0 for all-masked
            # (empty) reads whose colmax is the negative sentinel; upper
            # bound is the reference word kernel's saturation point
            # (adds_epi16)
            mc_out = jnp.clip(maxcol[:Bc, :R], 0, 32767).astype(jnp.uint16)
        cand = jnp.where(hit, j, L)
        end_read = jnp.min(cand, axis=1)
        end_read = jnp.where(end_read == L, rl - 1, end_read)
        outs.append((gmax[:, 0], end_ref, end_read, mc_out))
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[k] for o in outs], axis=0)
                 for k in range(4))


REV_CB = 16  # columns per grid step in the per-read-window kernel: the
             # streamed substitution block is (B, REV_CB, L) in VMEM, so
             # REV_CB bounds VMEM at ~2 MB per buffer at the lane sweet spot


def _perread_kernel(subs_ref,          # VMEM (B, REV_CB*L) int8 gathered
                                       # subs, flattened so the int8 tile
                                       # constraint (32 sublanes) sees B
                                       # sublanes x (REV_CB*L) lanes
                    term_ref,          # VMEM (B, 1) terminate scores
                    dmg_ref, gmd_ref, maskneg_ref,       # VMEM (B, L)
                    seg_bias_ref, seg_reset_ref,         # VMEM (B, L)
                    gmax_ref,          # out VMEM (B, 1) int32
                    end_ref_ref,       # out VMEM (B, 1) int32
                    h_best_ref,        # out VMEM (B, L) int32
                    *rest_refs,        # [mc_ref (1, B, REV_CB) grid-major
                                       #  block of the (nblocks, B, REV_CB)
                                       #  array if emit_maxcol]
                                       # + scratch H, E (B, L), done (B, 1)
                    gapO: int, gapE: int, L: int, quirk: bool,
                    emit_maxcol: bool = False):
    """Begin-finding pass: per-read reference windows with the reference's
    terminate-at-score1 column-loop break (ref: src/ssw.c:339-341,918-930).
    Same DP recurrence as _forward_kernel; the profile gather happens
    outside (XLA take_along_axis) and streams in as per-column (B, L)
    substitution slabs.  emit_maxcol adds a (1, B, REV_CB) grid-major
    per-column-maxima output block per grid step — the full array is
    (nblocks, B, REV_CB) — for the streaming suboptimal scan's window
    re-runs, clamped at 0 like the scan path."""
    if emit_maxcol:
        mc_ref, H_ref, E_ref, done_ref = rest_refs
    else:
        H_ref, E_ref, done_ref = rest_refs
    block = pl.program_id(0)
    neg = jnp.int32(NEG)

    @pl.when(block == 0)
    def _init():
        H_ref[...] = jnp.zeros_like(H_ref)
        E_ref[...] = jnp.zeros_like(E_ref)
        gmax_ref[...] = jnp.zeros_like(gmax_ref)
        end_ref_ref[...] = jnp.full_like(end_ref_ref, -1)
        h_best_ref[...] = jnp.zeros_like(h_best_ref)
        done_ref[...] = jnp.zeros_like(done_ref)

    dmg = dmg_ref[...]
    gmd = gmd_ref[...]
    maskneg = maskneg_ref[...]
    term = term_ref[...]
    if quirk:
        seg_bias = seg_bias_ref[...]
        rst = seg_reset_ref[...] > 0  # loop-invariant: hoisted compare
        decay_q = -(gmd - gapE)

    for u in range(REV_CB):
        sub = subs_ref[:, u * L:(u + 1) * L].astype(jnp.int32)
        H = H_ref[...]
        E = E_ref[...]
        h_diag = _shift_right(H, 1, jnp.int32(0)) + sub
        h_tilde = jnp.maximum(h_diag, E)  # E >= 0 covers the 0-clamp
        c = h_tilde + dmg
        cm = _prefix_max(c, L, neg)
        F = _shift_right(cm, 1, neg) + gmd
        H = jnp.maximum(h_tilde, F)
        if quirk:
            cs = _prefix_max(c + seg_bias, L, neg,
                             bound=max(L // 8, 1)) - seg_bias
            F_loc = _shift_right(cs, 1, neg) - decay_q + gapE
            F_loc = jnp.where(rst, 0, jnp.maximum(F_loc, 0))
            h_fp = jnp.maximum(h_tilde, F_loc)
        else:
            h_fp = H
        E = jnp.maximum(jnp.maximum(E - jnp.int32(gapE),
                                    h_fp - jnp.int32(gapO)), jnp.int32(0))
        H_ref[...] = H
        E_ref[...] = E

        colmax = jnp.maximum(
            jnp.max(H + maskneg, axis=1, keepdims=True), 0)  # (B, 1)
        if emit_maxcol:
            # each lane u of the fresh (1, B, REV_CB) block is written
            # exactly once across the unrolled loop, so no init is needed
            lane = jax.lax.broadcasted_iota(jnp.int32,
                                            (colmax.shape[0], REV_CB), 1)
            mc_ref[0] = jnp.where(lane == u, colmax, mc_ref[0])
        done = done_ref[...]
        gmax = gmax_ref[...]
        upd = (colmax > gmax) & (done == 0)
        gmax_ref[...] = jnp.where(upd, colmax, gmax)
        end_ref_ref[...] = jnp.where(upd, block * REV_CB + u,
                                     end_ref_ref[...])
        h_best_ref[...] = jnp.where(upd, H, h_best_ref[...])
        done_ref[...] = done | (colmax == term).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("L", "gapO", "gapE", "quirk",
                                              "interpret", "emit_maxcol"))
def _perread_call(subs, term, col_mask, seg_id, seg_start, L: int,
                  gapO: int, gapE: int, quirk: bool, interpret: bool,
                  emit_maxcol: bool = False):
    B, WL = subs.shape
    W = WL // L
    nblocks = W // REV_CB
    kernel = functools.partial(_perread_kernel, gapO=gapO, gapE=gapE, L=L,
                               quirk=quirk, emit_maxcol=emit_maxcol)
    decay = (jnp.arange(L, dtype=jnp.int32) * gapE)[None, :]
    dmg = jnp.broadcast_to(decay - gapO, (B, L)).astype(jnp.int32)
    gmd = jnp.broadcast_to(gapE - decay, (B, L)).astype(jnp.int32)
    maskneg = jnp.where(col_mask > 0, 0, NEG).astype(jnp.int32)
    seg_bias = seg_id.astype(jnp.int32) * SEG_BUMP  # upcast BEFORE the bias
    seg_prev = jnp.pad(seg_id, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    seg_reset = (seg_start.astype(bool)
                 | (seg_prev != seg_id)).astype(jnp.int32)
    vmem = lambda: pl.BlockSpec((B, L), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, REV_CB * L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vmem(), vmem(), vmem(), vmem(), vmem(),
        ],
        out_specs=(
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ) + ((pl.BlockSpec((1, B, REV_CB), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),) if emit_maxcol
             else ()),
        scratch_shapes=[
            pltpu.VMEM((B, L), jnp.int32),
            pltpu.VMEM((B, L), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
    ) + ((jax.ShapeDtypeStruct((nblocks, B, REV_CB), jnp.int32),)
         if emit_maxcol else ())
    cost = pl.CostEstimate(
        flops=int(W) * B * L * 40,
        bytes_accessed=int(W) * B * L * 4,
        transcendentals=0,
    )
    res = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                         cost_estimate=cost, interpret=interpret)(
        subs, term, dmg, gmd, maskneg, seg_bias, seg_reset)
    if emit_maxcol:
        # grid-major layout (see _forward_call's blockmax note) -> (B, W)
        mc = jnp.transpose(res[3], (1, 0, 2)).reshape(B, W)
        res = res[:3] + (mc,)
    return res


def forward_perread_ref(profile, refw, read_len, col_mask, seg_id, seg_start,
                        gapO: int, gapE: int, quirk: bool = True,
                        terminate=None, emit_maxcol: bool = False):
    """Pallas drop-in for scan_sw.forward_perread_ref (ref: the reverse
    begin-finding pass, src/ssw.c:918-930): every read has its own (B, W)
    reference window.  The per-column profile gather is hoisted out of the
    kernel — XLA computes subs[b, w, :] = profile[b, refw[b, w], :] once
    and the kernel streams (B, REV_CB, L) slabs from HBM, overlapping the
    DMA with the DP chain.  emit_maxcol adds a (B, W) per-column-maxima
    output (streaming suboptimal window re-runs)."""
    B, n1, L = profile.shape
    W = refw.shape[1]
    Wp = (W + REV_CB - 1) // REV_CB * REV_CB
    refw_p = jnp.concatenate(
        [refw.astype(jnp.int32),
         jnp.full((B, Wp - W), n1 - 1, jnp.int32)], axis=1)
    if terminate is None:
        terminate = jnp.full((B,), -1, jnp.int32)
    interpret = jax.devices()[0].platform == "cpu"
    prof8 = profile.astype(jnp.int8)
    b_opt = max(8, (OPT_LANES // max(L, 1)) // 8 * 8)
    outs = []
    for lo in range(0, B, b_opt):
        hi = min(lo + b_opt, B)
        Bc = hi - lo
        Bp = min(b_opt, (Bc + 63) // 64 * 64)
        pad = Bp - Bc

        def take(arr, fill):
            part = arr[lo:hi]  # narrow host dtype; kernels upcast on device
            if pad:
                part = jnp.concatenate(
                    [part, jnp.full((pad,) + part.shape[1:], fill,
                                    part.dtype)])
            return part

        # int8 stream: halves the HBM->VMEM traffic of the gathered profile
        # slabs; flattened to (Bp, W*L) so the int8 tile sees Bp sublanes.
        # Gathered per chunk (advisor round 2) so the transient scales with
        # the chunk, not the whole reverse batch (B x Wp x L can reach GBs
        # for long reads x permissive windows)
        subs = jnp.take_along_axis(
            take(prof8, 0), take(refw_p, n1 - 1)[:, :, None],
            axis=1).reshape(Bp if pad else Bc, -1)
        res = _perread_call(
            subs, take(terminate, -1)[:, None], take(col_mask, 0),
            take(seg_id, 0), take(seg_start, 1), L, gapO, gapE, quirk,
            interpret, emit_maxcol)
        gmax, end_ref, h_best = res[:3]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        rl = read_len[lo:hi]
        gmax = gmax[:Bc]
        hit = ((h_best[:Bc] == gmax) & (j < rl[:, None]) & (gmax > 0))
        cand = jnp.where(hit, j, L)
        end_read = jnp.min(cand, axis=1)
        end_read = jnp.where(end_read == L, rl - 1, end_read)
        out = (gmax[:, 0], end_ref[:Bc, 0], end_read)
        if emit_maxcol:
            out = out + (res[3][:Bc, :W],)
        outs.append(out)
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[k] for o in outs], axis=0)
                 for k in range(len(outs[0])))


def forward_shared_ref_gated(profile, ref, idxs, owned, read_len, col_mask,
                             seg_id, seg_start, gapO: int, gapE: int,
                             quirk: bool = True, max_sub: int | None = None):
    """Pallas equivalent of scan_sw.forward_shared_ref_gated: per-column
    global indices + an `owned` gate on best-hit tracking, used by the
    sequence-parallel shards whose halo warm-up columns are inexact
    (parallel/dist.py).  Per-column maxima are emitted for every local
    column; the caller slices the owned range."""
    B, n1, L = profile.shape
    R = ref.shape[0]
    Rp = (R + COL_BLOCK - 1) // COL_BLOCK * COL_BLOCK
    pad = Rp - R
    ref_blocks = jnp.concatenate(
        [ref.astype(jnp.int32),
         jnp.full((pad,), n1 - 1, jnp.int32)]).reshape(-1, 1, COL_BLOCK)
    idx_blocks = jnp.concatenate(
        [idxs.astype(jnp.int32),
         jnp.full((pad,), -1, jnp.int32)]).reshape(-1, 1, COL_BLOCK)
    own_blocks = jnp.concatenate(
        [owned.astype(jnp.int32),
         jnp.zeros((pad,), jnp.int32)]).reshape(-1, 1, COL_BLOCK)
    interpret = jax.devices()[0].platform == "cpu"
    use_i16 = i16_exact(L, gapO, gapE, max_sub, quirk) and _i16_supported()
    gate_sub, gate_radii = gate_plan(L, gapO, gapE, max_sub)
    maxcol, gmax, end_ref, h_best = _forward_call(
        jnp.transpose(profile, (1, 0, 2)), ref_blocks, idx_blocks,
        own_blocks, col_mask.astype(jnp.int32), seg_id.astype(jnp.int32),
        seg_start.astype(jnp.int32), gapO, gapE, quirk, use_i16, interpret,
        gate_sub=gate_sub, gate_radii=gate_radii)
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    hit = ((h_best.astype(jnp.int32) == gmax) & (j < read_len[:, None])
           & (gmax > 0))
    cand = jnp.where(hit, j, L)
    end_read = jnp.min(cand, axis=1)
    end_read = jnp.where(end_read == L, read_len - 1, end_read)
    return (gmax[:, 0], end_ref[:, 0], end_read,
            jnp.clip(maxcol[:, :R], 0, 32767).astype(jnp.uint16))


@functools.partial(jax.jit, static_argnames=("L", "nb"))
def _pack_geometry(so, sl, rl, L: int, nb: int = 16):
    """Per-lane packed geometry from the compact (n_rows, S) slot tables
    (common.pack_tables): col_mask (lane inside a slot's tier-padded span),
    slot_id (ascending; row tails inherit the last slot, harmless — they
    are masked), slot_start, lane_off (offset within the slot, which
    keeps growing past the last slot like unpacked pad lanes do), qseg
    (the lane-block index within the slot for the quirk's segmented
    scan: each tier-padded slot is exactly nb blocks of sl/nb lanes,
    nb = 16 byte tier / 8 word — ref stripe layout src/ssw.c:163-188),
    and wcol (the WORD-tier validity span inside byte-sized slots, for
    the dual-tier blockmax emission)."""
    j = jnp.arange(L, dtype=jnp.int32)[None, None, :]       # (1, 1, L)
    o = so[:, :, None]                                       # (Br, S, 1)
    e = o + sl[:, :, None]
    inside = (j >= o) & (j < e)
    col_mask = inside.any(axis=1)
    started = (j >= o).astype(jnp.int32)
    slot_id = jnp.maximum(started.sum(axis=1) - 1, 0)        # (Br, L)
    slot_start = (j == o).any(axis=1)
    off_here = jnp.max(jnp.where(j >= o, o, 0), axis=1)
    lane_off = jnp.arange(L, dtype=jnp.int32)[None, :] - off_here
    sl_here = jnp.take_along_axis(sl, slot_id, axis=1)       # (Br, L)
    qseg = jnp.clip(lane_off * nb // jnp.maximum(sl_here, 1), 0, nb - 1)
    rl_here = jnp.take_along_axis(rl, slot_id, axis=1)
    wcol = col_mask & (lane_off < (rl_here + 7) // 8 * 8)
    return col_mask, slot_id, slot_start, lane_off, qseg, wcol


@functools.partial(jax.jit, static_argnames=("S", "dual"))
def _pack_reconstruct(bv, bc, maxcol, slot_id, lane_off, rl_s, S: int,
                      dual: bool = False):
    """Per-slot outputs from the packed kernel's per-lane trackers: the
    slot-restricted mirror of forward_shared_ref's blockmax
    reconstruction (global max = earliest first-attainment among lanes
    holding it; end_read = lowest such lane offset).  Returns (Br, S)
    tables + (Br, S, nblk) block maxima; the caller gathers per read."""
    Br, L = bv.shape
    bv32 = bv.astype(jnp.int32)
    m3 = slot_id[:, None, :] == jnp.arange(S, dtype=jnp.int32)[None, :,
                                                               None]
    neg3 = jnp.int32(-(2 ** 30))
    gmax = jnp.max(jnp.where(m3, bv32[:, None, :], neg3), axis=2)
    gmax = jnp.maximum(gmax, 0)                              # (Br, S)
    pos = gmax > 0
    is_g = m3 & (bv32[:, None, :] == gmax[:, :, None]) & pos[:, :, None]
    big = jnp.int32(2 ** 30)
    end_ref = jnp.min(jnp.where(is_g, bc[:, None, :], big), axis=2)
    end_ref = jnp.where(pos, end_ref, -1)
    lo = lane_off[:, None, :]
    hit = (is_g & (bc[:, None, :] == end_ref[:, :, None])
           & (lo < rl_s[:, :, None]))
    cand = jnp.where(hit, lo, L)
    end_read = jnp.min(cand, axis=2)
    end_read = jnp.where(end_read == L, rl_s - 1, end_read)
    S2 = 2 * S if dual else S
    nblk = maxcol.shape[1] // S2
    mc = maxcol.reshape(Br, nblk, S2).transpose(0, 2, 1)    # (Br, S2, nblk)
    return gmax, end_ref, end_read, mc


def forward_shared_ref_packed(profile, ref, so, sl, rl_s, flat_idx,
                              gapO: int, gapE: int,
                              max_sub: int | None = None,
                              valid_len: int | None = None,
                              quirk: bool = False, word: bool = False,
                              dual: bool = False):
    """Lane-packed forward pass: several reads per kernel row, each in its
    own contiguous slot of tier-padded DP rows (common.pack_plan).  Only
    the streaming/blockmax regime — per-read outputs (score, end_ref,
    end_read, blockmax (B, nblocks)) are bit-identical to
    forward_shared_ref on the unpacked layout; the DP inside a slot sees
    exactly the lanes an unpacked row would (slot starts cut h_diag/F, the
    per-slot bias cuts the prefix-max — cross-slot carries are inert).

    quirk (round 4): the lane-block E quirk composes with packing via a
    second, sub-slot bias level — the quirk's segmented scan sees
    candidates ordered lexicographically by (slot * PACK_BUMP, block_in_
    slot * QBUMP), exact while the slot-local value span stays under
    QBUMP (caller guards: pack_bound*(max_sub+gapE)+gapO < QBUMP).
    `word` selects the tier's 8-block stripe geometry (quirk only; the
    uniform-tier batches the quirk path produces — no overflow
    speculation there — keep nb static).

    profile: (n_rows, n1, L) over the PACKED codes (common.pack_codes);
    so/sl/rl_s: (n_rows, S) slot tables; flat_idx: (B,) row*S + slot.
    Always the int32 tier: the slot bias needs value headroom.
    Ref for what one slot computes: the byte/word kernels,
    src/ssw.c:197-386 (quirk E-update :288-299)."""
    Br, n1, L = profile.shape
    S = so.shape[1]
    R = ref.shape[0]
    Rp = (R + COL_BLOCK - 1) // COL_BLOCK * COL_BLOCK
    ref_padded = jnp.full((Rp,), n1 - 1, dtype=jnp.int32).at[:R].set(ref)
    ref_blocks = ref_padded.reshape(Rp // COL_BLOCK, 1, COL_BLOCK)
    idx_blocks = jnp.arange(Rp, dtype=jnp.int32).reshape(ref_blocks.shape)
    vl = R if valid_len is None else valid_len
    own_blocks = (idx_blocks < jnp.int32(vl)).astype(jnp.int32)
    interpret = jax.devices()[0].platform == "cpu"
    # pack_bound is static and shared across row chunks (bucketed to a
    # power of two so the compiled-shape set stays small)
    pack_bound = max(int(np.max(np.asarray(sl))), 1)
    pack_bound = 1 << (pack_bound - 1).bit_length()
    assert not (dual and quirk)
    if quirk:
        assert max_sub is not None
        assert pack_bound * (max_sub + gapE) + gapO < QBUMP, \
            "slot-local value span exceeds the quirk block bias separation"
    gate_sub, gate_radii = gate_plan(L, gapO, gapE, max_sub,
                                     pack_bound=pack_bound)
    so_d, sl_d, rl_d = jnp.asarray(so), jnp.asarray(sl), jnp.asarray(rl_s)
    b_opt = max(8, (OPT_LANES // max(L, 1)) // 8 * 8)
    nb = 8 if word else 16
    outs = []
    for lo in range(0, Br, b_opt):
        hi = min(lo + b_opt, Br)
        col_mask, slot_id, slot_start, lane_off, qseg, wcol = \
            _pack_geometry(so_d[lo:hi], sl_d[lo:hi], rl_d[lo:hi], L, nb)
        maxcol, bv, bc = _forward_call(
            jnp.transpose(profile[lo:hi], (1, 0, 2)), ref_blocks,
            idx_blocks, own_blocks, col_mask.astype(jnp.int32), slot_id,
            slot_start.astype(jnp.int32), gapO, gapE, quirk=quirk,
            use_i16=False, interpret=interpret, blockmax=True,
            gate_sub=gate_sub, gate_radii=gate_radii, packed=True,
            pack_bound=pack_bound, S=S, lane_off=lane_off,
            qbias=qseg * jnp.int32(QBUMP) if quirk else None,
            dual=dual, wmask=wcol.astype(jnp.int32) if dual else None)
        outs.append(_pack_reconstruct(bv, bc, maxcol, slot_id, lane_off,
                                      rl_d[lo:hi], S, dual=dual))
    if len(outs) == 1:
        gmax, end_ref, end_read, mc = outs[0]
    else:
        gmax, end_ref, end_read, mc = (
            jnp.concatenate([o[k] for o in outs], axis=0)
            for k in range(4))
    fi = jnp.asarray(flat_idx)
    nblk = mc.shape[2]
    if dual:
        # per-read gather of BOTH tier channels: mc is (Br, 2S, nblk) with
        # byte channels [0, S) and word channels [S, 2S)
        row, sl_i = fi // S, fi % S
        flat = mc.reshape(Br * 2 * S, nblk)
        mc_res = jnp.stack([flat[row * 2 * S + sl_i],
                            flat[row * 2 * S + S + sl_i]], axis=1)
    else:
        mc_res = mc.reshape(Br * S, nblk)[fi]
    return (gmax.reshape(-1)[fi], end_ref.reshape(-1)[fi],
            end_read.reshape(-1)[fi], mc_res)
