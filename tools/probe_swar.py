"""Probe: packed 2xint16-in-int32 (SWAR) lane arithmetic vs native int32.

VERDICT r2 asked for the "packed 2xint16-in-int32 guard-bit add/max" door
to be attempted (the i16_exact regime bounds every DP value below 2**14,
so two DP cells fit one 32-bit VPU lane with guard bits).  This probe
measures the emulation cost of the one op class that dominates the
striped-SW recurrence: **max** (11 of the kernel's ~30 per-cell vector
ops; BENCH.md round-3 table).

Packed add/sub/shift are genuinely 1 op per packed pair (no carry crosses
the half boundary while both halves stay inside 15 bits).  Packed max has
no hardware support on 32-bit VPU lanes and must be emulated:

    t    = (a | G) - b          # G = 0x80008000: per-half borrow guard
    m    = t & G                # guard survives  <=>  a_half >= b_half
    mask = m - (m >> 15)        # 0x7FFF where a wins, 0 where b wins
    r    = (a & mask) | (b & (mask ^ 0x7FFF7FFF))

= 8 vector ops per packed pair = 4 per element, vs 1 native max per
element.  Whole-kernel arithmetic (see BENCH.md): 11 maxes -> 44 ops/pair,
~19 other ops -> ~9.5/element, total ~54 ops/element vs ~30 native:
**~1.8x slower**, before bias bookkeeping for negative intermediates.
Break-even needs a <=3.5-op packed max, below the 4-op floor of any
compare/mask/select emulation.  The only real 2x-density door stays
native int16 vregs (toolchain-blocked; tools/probe_i16.py).

This probe validates the two load-bearing claims on hardware:
  1. packed guard-bit max is exact (checked vs unpacked int32 max), and
  2. a packed-max chain times ~4x a native-max chain per element
     (both issue-bound: same dependent-chain structure as the DP scan).

Run on the TPU: python tools/probe_swar.py  (CPU/interpret: correctness
only).  Ref for what the kernel computes: src/ssw.c:197-386.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

G = np.int32(np.uint32(0x8000_8000))   # two's-complement int32 literal
LOW = np.int32(0x7FFF_7FFF)
DEPTH = 256            # dependent-op chain length per kernel call
B, L = 64, 512         # 32k lanes: the v5e column-step sweet spot


def packed_max(a, b):
    """Per-16-bit-half max of two packed pairs (halves in [0, 2**15))."""
    t = (a | G) - b
    m = t & G
    mask = m - jax.lax.shift_right_logical(m, 15)  # logical: guard bit 31
    return (a & mask) | (b & (mask ^ LOW))


def _native_kernel(x_ref, y_ref, o_ref):
    x, y = x_ref[...], y_ref[...]
    for _ in range(DEPTH):
        x = jnp.maximum(x, y)
        y = y + 1            # keep the chain alive (no constant-folding)
    o_ref[...] = x


def _swar_kernel(x_ref, y_ref, o_ref):
    x, y = x_ref[...], y_ref[...]
    for _ in range(DEPTH):
        x = packed_max(x, y)
        y = y + 0x0001_0001  # +1 to each half
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("which", "interpret"))
def run(x, y, which: str, interpret: bool):
    kern = _native_kernel if which == "native" else _swar_kernel
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        interpret=interpret)(x, y)


def check_exact(rng):
    """Packed max == per-half max on random 14-bit halves."""
    a = rng.integers(0, 2 ** 14, (B, L), np.int64)
    b = rng.integers(0, 2 ** 14, (B, L), np.int64)
    c = rng.integers(0, 2 ** 14, (B, L), np.int64)
    d = rng.integers(0, 2 ** 14, (B, L), np.int64)
    pa = jnp.asarray((a << 16) | b, jnp.int32)  # halves stay < 2**15
    pb = jnp.asarray((c << 16) | d, jnp.int32)
    got = np.asarray(packed_max(pa, pb)).astype(np.int64) & 0xFFFF_FFFF
    want = (np.maximum(a, c) << 16) | np.maximum(b, d)
    assert np.array_equal(got, want), "packed max mismatch"
    print("packed_max exact on 16k random pairs: OK")


def bench(which, interpret):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 2 ** 14, (B, L)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2 ** 14, (B, L)), jnp.int32)
    run(x, y, which, interpret).block_until_ready()
    reps = 1 if interpret else 50
    t0 = time.time()
    o = None
    for _ in range(reps):
        o = run(x, y, which, interpret)
    np.asarray(o)  # the transfer is the only reliable fence on axon
    dt = (time.time() - t0) / reps
    return dt


def main():
    rng = np.random.default_rng(0)
    check_exact(rng)
    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        print("CPU/interpret: correctness only (timings meaningless)")
        return
    tn = bench("native", interpret)
    ts = bench("swar", interpret)
    # native: DEPTH maxes for B*L elements; swar: DEPTH packed maxes for
    # 2*B*L elements -> per-element cost ratio = (ts/2) / tn
    print(f"native max-chain: {tn * 1e3:.2f} ms/call "
          f"({DEPTH * B * L / tn / 1e9:.1f} Gmax/s)")
    print(f"swar packed-max chain: {ts * 1e3:.2f} ms/call "
          f"({DEPTH * 2 * B * L / ts / 1e9:.1f} Gmax/s delivered)")
    print(f"per-element cost ratio (swar/native): {ts / 2 / tn:.2f}x "
          f"(model predicts ~4x; kernel-weighted whole-DP ~1.8x)")


if __name__ == "__main__":
    main()
