"""Pallas TPU kernel for the batched striped-SW forward pass.

TPU-first design notes (this is a re-design, not a port of the SSE kernel in
ref: src/ssw.c:197-386):

  * The VPU operates on 32-bit lanes, so the reference's 8-bit/16-bit SIMD
    split buys nothing on TPU; the DP runs exactly in int32 and the
    byte/word tiers survive only as *geometry* (lane-block ids + column
    masks) because they are observable in the suboptimal-score scan.
  * Farrar's lazy-F correction loop becomes a log-depth prefix-max scan
    along the read dimension (Hillis-Steele with masked lane rolls); the
    reference's "E sees only lane-local F" quirk is a second scan over the
    same source with a per-read segmented reset (implemented by biasing
    each lane block into its own value range).
  * The reference grid iterates sequentially over reference-column blocks;
    H/E state and best-score trackers live in VMEM scratch that persists
    across grid steps.  Per-column maxima stream out to HBM for the
    suboptimal-score scan; batch layout is (B sublanes, L lanes).

Shapes: profile (n+1, B, L) int32, ref (R,) int32 with R % COL_BLOCK == 0,
geometry masks (B, L) int32.  Outputs match ops/scan_sw.forward_shared_ref.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 28)
SEG_BUMP = 2 ** 21
COL_BLOCK = 256


def _prefix_max(x, L, bound=None):
    """Inclusive prefix max along the last axis (log-depth masked shifts).
    `bound` limits the scan radius (enough for segmented scans whose segments
    are at most `bound` long)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    s = 1
    limit = L if bound is None else min(bound, L)
    while s < limit:
        shifted = pltpu.roll(x, s, axis=1)
        x = jnp.maximum(x, jnp.where(col >= s, shifted, NEG))
        s *= 2
    return x


def _shift_right_one(x, fill):
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(col >= 1, pltpu.roll(x, 1, axis=1), fill)


def _forward_kernel(ref_ref,           # SMEM (1, 1, COL_BLOCK) ref codes
                    profile_ref,       # VMEM (n1, B, L)
                    col_mask_ref,      # VMEM (B, L) int32 0/1
                    seg_bias_ref,      # VMEM (B, L) int32 seg_id * SEG_BUMP
                    seg_reset_ref,     # VMEM (B, L) int32 0/1
                    maxcol_ref,        # out VMEM (B, COL_BLOCK) int32
                    gmax_ref,          # out VMEM (B, 1) int32
                    end_ref_ref,       # out VMEM (B, 1) int32
                    h_best_ref,        # out VMEM (B, L) int32
                    H_ref, E_ref,      # scratch VMEM (B, L) int32
                    *, gapO: int, gapE: int, L: int, quirk: bool):
    block = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(block == 0)
    def _init():
        H_ref[...] = jnp.zeros_like(H_ref)
        E_ref[...] = jnp.zeros_like(E_ref)
        gmax_ref[...] = jnp.zeros_like(gmax_ref)
        end_ref_ref[...] = jnp.full_like(end_ref_ref, -1)
        h_best_ref[...] = jnp.zeros_like(h_best_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (profile_ref.shape[1], L), 1)
    decay = col * gapE
    col_mask = col_mask_ref[...]
    seg_bias = seg_bias_ref[...]
    seg_reset = seg_reset_ref[...]

    def body(j, _):
        code = ref_ref[0, 0, j]
        sub = profile_ref[code]
        H = H_ref[...]
        E = E_ref[...]
        h_diag = _shift_right_one(H, 0) + sub
        h_tilde = jnp.maximum(jnp.maximum(h_diag, E), 0)
        c = h_tilde - gapO + decay
        cm = _prefix_max(c, L)
        F = jnp.maximum(_shift_right_one(cm, NEG) - decay + gapE, 0)
        H = jnp.maximum(h_tilde, F)
        if quirk:
            # lane-block-segmented scan; segments are <= L/8 long (word
            # tier) so the scan radius is bounded (the bias pushes other
            # segments out of range, making cross-segment carries inert)
            cs = _prefix_max(c + seg_bias, L, bound=max(L // 8, 1)) - seg_bias
            F_loc = _shift_right_one(cs, NEG) - decay + gapE
            F_loc = jnp.where(seg_reset > 0, 0, jnp.maximum(F_loc, 0))
            h_fp = jnp.maximum(h_tilde, F_loc)
        else:
            h_fp = H
        E = jnp.maximum(jnp.maximum(E - gapE, h_fp - gapO), 0)
        H_ref[...] = H
        E_ref[...] = E

        colmax = jnp.max(jnp.where(col_mask > 0, H, 0), axis=1,
                         keepdims=True)  # (B, 1)
        # lane-masked select instead of a single-lane dynamic store (Mosaic
        # requires lane offsets to be 128-aligned)
        lane = jax.lax.broadcasted_iota(jnp.int32,
                                        (colmax.shape[0], COL_BLOCK), 1)
        maxcol_ref[...] = jnp.where(lane == j, colmax, maxcol_ref[...])
        gmax = gmax_ref[...]
        upd = colmax > gmax
        gmax_ref[...] = jnp.where(upd, colmax, gmax)
        end_ref_ref[...] = jnp.where(upd, block * COL_BLOCK + j,
                                     end_ref_ref[...])
        h_best_ref[...] = jnp.where(upd, H, h_best_ref[...])
        return 0

    jax.lax.fori_loop(0, COL_BLOCK, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("gapO", "gapE", "quirk", "interpret"))
def _forward_call(profile, ref_blocks, col_mask, seg_bias, seg_reset,
                  gapO: int, gapE: int, quirk: bool = True,
                  interpret: bool = False):
    n1, B, L = profile.shape
    nblocks = ref_blocks.shape[0]
    kernel = functools.partial(_forward_kernel, gapO=gapO, gapE=gapE, L=L,
                               quirk=quirk)
    out_shape = (
        jax.ShapeDtypeStruct((B, nblocks * COL_BLOCK), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, COL_BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n1, B, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        ],
    )
    cost = pl.CostEstimate(
        flops=int(nblocks * COL_BLOCK) * B * L * 40,
        bytes_accessed=int(nblocks * COL_BLOCK) * B * 4,
        transcendentals=0,
    )
    maxcol, gmax, end_ref, h_best = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(ref_blocks, profile, col_mask, seg_bias, seg_reset)
    return maxcol, gmax, end_ref, h_best


def forward_shared_ref(profile, ref, read_len, col_mask, seg_id, seg_start,
                       gapO: int, gapE: int, quirk: bool = True):
    """Drop-in equivalent of scan_sw.forward_shared_ref running the Pallas
    kernel.  profile here is (B, n1, L) like the scan path; transposed and
    re-blocked internally."""
    B, n1, L = profile.shape
    prof = jnp.transpose(profile, (1, 0, 2))
    R = ref.shape[0]
    Rp = (R + COL_BLOCK - 1) // COL_BLOCK * COL_BLOCK
    ref_padded = jnp.full((Rp,), n1 - 1, dtype=jnp.int32).at[:R].set(ref)
    ref_blocks = ref_padded.reshape(Rp // COL_BLOCK, 1, COL_BLOCK)
    interpret = jax.devices()[0].platform == "cpu"
    maxcol, gmax, end_ref, h_best = _forward_call(
        prof, ref_blocks, col_mask.astype(jnp.int32),
        (seg_id * SEG_BUMP).astype(jnp.int32), seg_start.astype(jnp.int32),
        gapO, gapE, quirk, interpret)
    # finalize like the scan path
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    gmax_v = gmax[:, 0]
    hit = (h_best == gmax[:, :1]) & (j < read_len[:, None]) & (gmax > 0)
    cand = jnp.where(hit, j, L)
    end_read = jnp.min(cand, axis=1)
    end_read = jnp.where(end_read == L, read_len - 1, end_read)
    return gmax_v, end_ref[:, 0], end_read, maxcol[:, :R].astype(jnp.uint16)
