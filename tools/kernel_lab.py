"""Microbenchmark lab for the forward-DP Pallas kernel: measures variants
that add/remove pieces of the per-column work, to locate where the cycles
go (VERDICT round-1 item 1: push int32 throughput toward VPU SoL).

Variants (cumulative structure, one switch each):
  full       -- the production kernel structure (pallas_sw equivalent)
  nostore    -- per-column maxcol select-store removed
  notrack    -- maxcol + gmax/end/h_best trackers removed (pure DP)
  nodp       -- trackers only (DP recurrence replaced by 1 add)  [sanity]
  maskstore  -- maxcol store via pltpu.store(mask=...) instead of select
  concat     -- maxcol accumulated via per-UNROLL concat, stored per tile

Timing: queue REPS calls, force one device->host transfer (axon
block_until_ready does not block; see BENCH.md).

Usage: python tools/kernel_lab.py [variant ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 28)
COL_BLOCK = 256
UNROLL = 16

B, L = 128, 256
NBLOCKS = 128          # 32768 reference columns per call
REPS = 8

def set_shape(b, l, nblocks):
    global B, L, NBLOCKS
    B, L, NBLOCKS = b, l, nblocks


def _shift_right(x, s, fill):
    return jnp.pad(x, ((0, 0), (s, 0)), constant_values=fill)[:, :-s]


def _prefix_max(x, L, neg):
    s = 1
    while s < L:
        x = jnp.maximum(x, _shift_right(x, s, neg))
        s *= 2
    return x


def _prefix_max_r4(x, L, neg):
    """Radix-4 scan: fewer dependent steps (3/step incl. shift), more ops."""
    s = 1
    while s < L:
        a = _shift_right(x, s, neg)
        if 2 * s < L:
            b = _shift_right(x, 2 * s, neg)
            c = _shift_right(x, 3 * s, neg) if 3 * s < L else None
            m2 = jnp.maximum(a, b) if c is None else jnp.maximum(
                jnp.maximum(a, b), c)
            x = jnp.maximum(x, m2)
        else:
            x = jnp.maximum(x, a)
        s *= 4
    return x


def make_kernel(variant: str, unroll: int = UNROLL,
                forced_bound: int | None = None, count: bool = False):
    do_dp = variant not in ("nodp", "skeleton")
    do_track = variant not in ("notrack", "noprof_notrack", "skeleton")
    do_store = variant not in ("nostore", "notrack", "noprof_notrack",
                               "skeleton")
    do_prof = variant not in ("noprofile", "noprof_notrack", "skeleton",
                              "selectchain")
    scan_bound = 32 if variant == "shortscan" else None
    radix4 = variant == "radix4"
    if variant in ("shortscan", "radix4"):
        do_track = False
        do_store = False
    trim = variant in ("trim", "trimpack")
    biased = variant == "biased"
    packtrack = variant in ("packtrack", "trimpack")
    ring8 = variant == "ring8"
    # round-3 probes (see BENCH.md round-3 section):
    #   noclamp   -- drop h_tilde's 0-clamp (redundant: E is 0-clamped)
    #   lanetrack -- per-lane (val, col) trackers + per-grid-step blockmax,
    #                no per-column cross-lane reduce (blockmax-mode shape)
    #   gatescan  -- 6-level scan when the block-entry colmax bound proves
    #                no F-carry can cross 63 lanes; else full 8-level
    #   r3        -- all three combined
    noclamp = variant in ("noclamp", "r3", "lanetrack_nc", "gatescan_nc",
                          "enc", "r3e", "r3e2")
    lanetrack = variant in ("lanetrack", "lanetrack_nc", "r3")
    gatescan = variant in ("gatescan", "gatescan_nc", "r3", "r3e", "r3e2")
    # r3e2: the round-4 two-tier gate (radius 64 at thresh1, radius 128 at
    # thresh2 = gapO + 127*gapE - UNROLL*max_sub, else full); `count`
    # surfaces per-tier engagement via the end_ref output (rows 0-2)
    gate2 = variant == "r3e2"
    if forced_bound is not None:   # '!R' suffix: forced truncation —
        gatescan = gate2 = False   # INEXACT, measures the tier's ceiling
    # enc: the round-3 encoded lanetrack tracker — one running max over
    # t = H*256 + (255 - j) replaces the (val, col, blockmax) triple
    # (3 vector ops/column vs 5); r3e = enc + gatescan + noclamp, the
    # production default path's probe twin
    enc = variant in ("enc", "r3e", "r3e2")

    def kernel(ref_ref, profile_ref, dmg_ref, gmd_ref, maskneg_ref,
               maxcol_ref, gmax_ref, end_ref_ref, h_best_ref,
               H_ref, E_ref, ring_ref, hm_ref, *, gapO, gapE):
        block = pl.program_id(0)
        neg = jnp.int32(NEG)

        @pl.when(block == 0)
        def _init():
            H_ref[...] = jnp.zeros_like(H_ref)
            E_ref[...] = jnp.zeros_like(E_ref)
            gmax_ref[...] = jnp.zeros_like(gmax_ref)
            end_ref_ref[...] = jnp.full_like(end_ref_ref, -1)
            h_best_ref[...] = jnp.zeros_like(h_best_ref)
            if lanetrack or gatescan or enc:
                ring_ref[0] = jnp.zeros_like(ring_ref[0])
                ring_ref[1] = jnp.zeros_like(ring_ref[1])
                for k in range(4):
                    hm_ref[0, k] = 0

        if lanetrack or gatescan or noclamp or enc:
            # r3 probe family: per-lane (val, col) trackers / blockmax acc /
            # level-gated scan.  max_sub = 2 in the lab workload.
            dmg_l = dmg_ref[...]
            gmd_l = gmd_ref[...]
            maskneg_l = maskneg_ref[...]
            # safe next 16 columns: entry colmax + 16*max_sub below the
            # radius-63 carry bound gapO + 63*gapE
            thresh = gapO + 63 * gapE - unroll * 2

            def col_step(j, H, E, bound):
                code = ref_ref[0, 0, j]
                sub = profile_ref[code]
                h_diag = _shift_right(H, 1, jnp.int32(0)) + sub
                if noclamp:
                    h_tilde = jnp.maximum(h_diag, E)  # E >= 0 covers the 0
                else:
                    h_tilde = jnp.maximum(jnp.maximum(h_diag, E),
                                          jnp.int32(0))
                c = h_tilde + dmg_l
                cm = _prefix_max(c, bound, neg)
                F = _shift_right(cm, 1, neg) + gmd_l
                H = jnp.maximum(h_tilde, F)
                E = jnp.maximum(
                    jnp.maximum(E - jnp.int32(gapE), H - jnp.int32(gapO)),
                    jnp.int32(0))
                H_ref[...] = H
                E_ref[...] = E
                if enc:
                    t = H * jnp.int32(256) + (jnp.int32(255) - j)
                    ring_ref[0] = jnp.maximum(ring_ref[0], t)
                elif lanetrack:
                    m = H > ring_ref[0]
                    ring_ref[0] = jnp.where(m, H, ring_ref[0])
                    h_best_ref[...] = jnp.where(
                        m, block * COL_BLOCK + j, h_best_ref[...])
                    ring_ref[1] = jnp.maximum(ring_ref[1], H + maskneg_l)
                else:
                    colmax = jnp.max(H + maskneg_l, axis=1, keepdims=True)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (B, COL_BLOCK), 1)
                    maxcol_ref[...] = jnp.where(
                        lane == j, colmax, maxcol_ref[...])
                    gmax = gmax_ref[...]
                    upd = colmax > gmax
                    gmax_ref[...] = jnp.where(upd, colmax, gmax)
                    end_ref_ref[...] = jnp.where(
                        upd, block * COL_BLOCK + j, end_ref_ref[...])
                    h_best_ref[...] = jnp.where(upd, H, h_best_ref[...])
                return H, E

            thresh2 = gapO + 127 * gapE - unroll * 2

            def body(jj, _):
                def run16(bound, slot=None):
                    H = H_ref[...]
                    E = E_ref[...]
                    for u in range(unroll):
                        H, E = col_step(jj * unroll + u, H, E, bound)
                    if gatescan:
                        hm_ref[0, 0] = jnp.max(H + maskneg_l)
                    if count and slot is not None:
                        hm_ref[0, slot] = hm_ref[0, slot] + 1

                if gate2:
                    hm = hm_ref[0, 0]
                    t1 = hm <= thresh
                    t2 = hm <= thresh2

                    @pl.when(t1)
                    def _fast():
                        run16(64, 1)

                    @pl.when(jnp.logical_not(t1) & t2)
                    def _mid():
                        run16(128, 2)

                    @pl.when(jnp.logical_not(t2))
                    def _full():
                        run16(L, 3)
                elif gatescan:
                    safe = hm_ref[0, 0] <= thresh

                    @pl.when(safe)
                    def _fast():
                        run16(64, 1)

                    @pl.when(jnp.logical_not(safe))
                    def _full():
                        run16(L, 3)
                else:
                    run16(L if forced_bound is None else forced_bound)
                return 0

            jax.lax.fori_loop(0, COL_BLOCK // unroll, body, 0)
            if enc:
                # decode + merge once per grid step (the production kernel's
                # (bv, bc) merge shape): block maxima, strict-improvement
                # global best with first-attainment column
                raw = ring_ref[0]
                val = raw >> 8
                mv = jnp.max(val, axis=1, keepdims=True)
                maxcol_ref[:, :1] = mv
                imp = mv > gmax_ref[...]
                gmax_ref[...] = jnp.where(imp, mv, gmax_ref[...])
                end_ref_ref[...] = jnp.where(
                    imp, block * COL_BLOCK + 255
                    - (jnp.max(raw, axis=1, keepdims=True)
                       & jnp.int32(255)), end_ref_ref[...])
                ring_ref[0] = jnp.zeros_like(raw)
            elif lanetrack:
                # blockmax store + per-grid-step escape of the val tracker
                maxcol_ref[:, :1] = jnp.max(ring_ref[1], axis=1,
                                            keepdims=True)
                ring_ref[1] = jnp.zeros_like(ring_ref[1])
                gmax_ref[...] = jnp.max(ring_ref[0], axis=1, keepdims=True)
            if count:
                # surface per-tier group counts via end_ref rows 0-2 on the
                # last block (counts live in SMEM hm_ref[0, 1:4])
                @pl.when(block == NBLOCKS - 1)
                def _emit_counts():
                    row = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
                    cnts = jnp.where(row == 0, hm_ref[0, 1],
                                     jnp.where(row == 1, hm_ref[0, 2],
                                               hm_ref[0, 3]))
                    end_ref_ref[...] = jnp.where(row < 3, cnts,
                                                 end_ref_ref[...])
            return

        dmg = dmg_ref[...]
        gmd = gmd_ref[...]
        maskneg = maskneg_ref[...]

        ilv = None
        if packtrack:
            lane_l = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
            ilv = 1024 + (1023 - lane_l)  # all lanes "valid" in the lab
            maskneg2 = jnp.zeros((B, L), jnp.int32)  # no padding in lab

        def body(jj, _):
            cols = []
            for u in range(unroll):
                j = jj * unroll + u
                code = ref_ref[0, 0, j]
                if do_prof:
                    sub = profile_ref[code]
                elif variant == "selectchain":
                    sub = profile_ref[0]
                    for k in range(1, 6):
                        sub = jnp.where(code == k, profile_ref[k], sub)
                else:
                    sub = dmg
                H = H_ref[...]
                E = E_ref[...]
                if biased:
                    # fully-biased: state Hd=H+dmg, Ed=E+dmg; profile holds
                    # subE = sub + gapE (precomputed outside); constants:
                    # fill v=-gapO-gapE, K1=gapE-gapO
                    Hd = H
                    Ed = E
                    c = jnp.maximum(
                        _shift_right(Hd, 1, jnp.int32(-gapO - gapE)) + sub,
                        Ed)
                    cm = _prefix_max(c, L, neg)
                    scm = _shift_right(cm, 1, neg)
                    Hd = jnp.maximum(c, scm + jnp.int32(gapE - gapO))
                    Ed = jnp.maximum(jnp.maximum(Ed - jnp.int32(gapE),
                                                 Hd - jnp.int32(gapO)), dmg)
                    H = Hd
                    E = Ed
                elif trim:
                    # biased-domain dataflow: sub2 = sub + dmg folded,
                    # zero-clamp absorbed by E >= 0, E-update off-chain
                    sub2 = sub + dmg          # (stand-in for precomputed)
                    Ed = E + dmg
                    c = jnp.maximum(_shift_right(H, 1, jnp.int32(0)) + sub2,
                                    Ed)
                    cm = _prefix_max(c, L, neg)
                    ht = c - dmg
                    scm = _shift_right(cm, 1, neg)
                    H = jnp.maximum(ht, scm + gmd)
                    e1 = jnp.maximum(E - jnp.int32(gapE), jnp.int32(0))
                    pre = jnp.maximum(e1, ht - jnp.int32(gapO))
                    E = jnp.maximum(pre, scm + (gmd - jnp.int32(gapO)))
                elif do_dp:
                    h_diag = _shift_right(H, 1, jnp.int32(0)) + sub
                    h_tilde = jnp.maximum(jnp.maximum(h_diag, E),
                                          jnp.int32(0))
                    c = h_tilde + dmg
                    if scan_bound:
                        cm = _prefix_max(c, scan_bound, neg)
                    elif radix4:
                        cm = _prefix_max_r4(c, L, neg)
                    else:
                        cm = _prefix_max(c, L, neg)
                    F = _shift_right(cm, 1, neg) + gmd
                    H = jnp.maximum(h_tilde, F)
                    E = jnp.maximum(
                        jnp.maximum(E - jnp.int32(gapE), H - jnp.int32(gapO)),
                        jnp.int32(0))
                else:
                    H = H + sub
                H_ref[...] = H
                E_ref[...] = E

                if do_track and biased:
                    # colmax on Hd needs maskneg - dmg (precomputed = gmd-ish)
                    colmax = jnp.max(H + (maskneg - dmg), axis=1,
                                     keepdims=True)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (B, COL_BLOCK), 1)
                    maxcol_ref[...] = jnp.where(
                        lane == j, colmax, maxcol_ref[...])
                    gmax = gmax_ref[...]
                    upd = colmax > gmax
                    gmax_ref[...] = jnp.where(upd, colmax, gmax)
                    end_ref_ref[...] = jnp.where(
                        upd, block * COL_BLOCK + j, end_ref_ref[...])
                    h_best_ref[...] = jnp.where(upd, H, h_best_ref[...])
                elif do_track and ring8:
                    ring_ref[u % 8] = H
                    if u % 8 == 7:
                        hs = ring_ref[...]          # (8, B, L)
                        cm8 = jnp.max(hs + maskneg[None], axis=2,
                                      keepdims=True)  # (8, B, 1)
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (B, COL_BLOCK), 1)
                        for w in range(8):
                            jw = j - 7 + w
                            colmax = cm8[w]
                            maxcol_ref[...] = jnp.where(
                                lane == jw, colmax, maxcol_ref[...])
                            gmax = gmax_ref[...]
                            upd = colmax > gmax
                            gmax_ref[...] = jnp.where(upd, colmax, gmax)
                            end_ref_ref[...] = jnp.where(
                                upd, block * COL_BLOCK + jw,
                                end_ref_ref[...])
                            h_best_ref[...] = jnp.where(
                                upd, ring_ref[w], h_best_ref[...])
                elif do_track and packtrack:
                    key = (H + maskneg2) * 2048 + ilv
                    kmax = jnp.max(key, axis=1, keepdims=True)
                    colmax = jnp.right_shift(kmax, 11)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (B, COL_BLOCK), 1)
                    maxcol_ref[...] = jnp.where(
                        lane == j, colmax, maxcol_ref[...])
                    gmax = gmax_ref[...]
                    upd = colmax > gmax
                    gmax_ref[...] = jnp.where(upd, colmax, gmax)
                    end_ref_ref[...] = jnp.where(
                        upd, block * COL_BLOCK + j, end_ref_ref[...])
                    # best packed key stored in h_best_ref[:, :1]
                    h_best_ref[:, :1] = jnp.where(upd, kmax,
                                                  h_best_ref[:, :1])
                elif do_track:
                    colmax = jnp.max(H + maskneg, axis=1, keepdims=True)
                    if do_store:
                        if variant == "maskstore":
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, (B, COL_BLOCK), 1)
                            pltpu.store(
                                maxcol_ref,
                                jnp.broadcast_to(colmax, (B, COL_BLOCK)),
                                mask=lane == j)
                        elif variant == "concat":
                            cols.append(colmax)
                        else:
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, (B, COL_BLOCK), 1)
                            maxcol_ref[...] = jnp.where(
                                lane == j, colmax, maxcol_ref[...])
                    gmax = gmax_ref[...]
                    upd = colmax > gmax
                    gmax_ref[...] = jnp.where(upd, colmax, gmax)
                    end_ref_ref[...] = jnp.where(
                        upd, block * COL_BLOCK + j, end_ref_ref[...])
                    h_best_ref[...] = jnp.where(upd, H, h_best_ref[...])
            if variant == "concat":
                tile = jnp.concatenate(cols, axis=1)  # (B, unroll)
                maxcol_ref[:, pl.ds(jj * unroll, unroll)] = tile
            return 0

        jax.lax.fori_loop(0, COL_BLOCK // unroll, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "unroll",
                                              "forced_bound", "count"))
def run(profile, ref_blocks, dmg, gmd, maskneg, variant, unroll=UNROLL,
        forced_bound=None, count=False):
    kernel = functools.partial(make_kernel(variant, unroll, forced_bound,
                                           count), gapO=3, gapE=1)
    n1 = profile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NBLOCKS,),
        in_specs=[
            pl.BlockSpec((1, 1, COL_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n1, B, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, COL_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, L), jnp.int32),
            pltpu.VMEM((B, L), jnp.int32),
            pltpu.VMEM((8, B, L), jnp.int32),
            pltpu.SMEM((1, 4), jnp.int32),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, NBLOCKS * COL_BLOCK), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
    )
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)(
        ref_blocks, profile, dmg, gmd, maskneg)


def main():
    variants = sys.argv[1:] or ["full", "full#64", "full#256", "full#512",
                                "full#1024", "full#256x512"]
    rng = np.random.default_rng(0)
    n1 = 6
    for label in variants:
        v = label
        unroll = UNROLL
        b, l, nb = 128, 256, 128
        count = v.endswith("?")
        if count:
            v = v[:-1]
        forced = None
        if "!" in v:
            v, s = v.split("!")
            forced = int(s)
        if "@" in v:
            v, s = v.split("@")
            unroll = int(s)
        if "#" in v:
            v, s = v.split("#")
            if "x" in s:
                b, l = (int(x) for x in s.split("x"))
            else:
                b = int(s)
            nb = max(1, (128 * 128 * 256) // (b * l))
        set_shape(b, l, nb)
        profile = jnp.asarray(rng.integers(-2, 3, (n1, B, L)), jnp.int32)
        ref_blocks = jnp.asarray(
            rng.integers(0, 4, (NBLOCKS, 1, COL_BLOCK)), jnp.int32)
        decay = (jnp.arange(L, dtype=jnp.int32) * 1)[None, :]
        dmg = jnp.broadcast_to(decay - 3, (B, L)).astype(jnp.int32)
        gmd = jnp.broadcast_to(1 - decay, (B, L)).astype(jnp.int32)
        maskneg = jnp.zeros((B, L), jnp.int32)
        cells = B * L * NBLOCKS * COL_BLOCK
        try:
            outs = run(profile, ref_blocks, dmg, gmd, maskneg, v, unroll,
                       forced, count)
            np.asarray(outs[1])  # force
            t0 = time.perf_counter()
            for _ in range(REPS):
                outs = run(profile, ref_blocks, dmg, gmd, maskneg, v,
                           unroll, forced, count)
            np.asarray(outs[1])
            dt = (time.perf_counter() - t0 - 0.028) / REPS
            rate = cells / dt / 1e9
            extra = ""
            if count:
                c = np.asarray(outs[2])[:3, 0]
                total = NBLOCKS * (COL_BLOCK // unroll)
                extra = (f"   tiers r64/r128/full = "
                         f"{c[0]}/{c[1]}/{c[2]} of {total}")
            print(f"{label:16s}: {dt*1e3:8.2f} ms/call   "
                  f"{rate:8.1f} G lane-cells/s{extra}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:16s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
