"""Probe which int16 vector-op formulations the current Mosaic toolchain
compiles, to find a path to the 2x-density int16 kernel tier
(VERDICT round 1, item 1).  Run on the TPU; each probe is compiled in a
fresh subprocess when --isolate is given so an in-process SIGABRT cannot
kill the sweep.

Usage: python tools/probe_i16.py [--isolate] [name ...]
"""

from __future__ import annotations

import subprocess
import sys

PROBES = {}


def probe(name):
    def deco(fn):
        PROBES[name] = fn
        return fn
    return deco


def _run(kernel, n_in=1, dtype="int16"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dt = jnp.dtype(dtype)
    xs = [jnp.ones((8, 128), dt) * (i + 1) for i in range(n_in)]
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), dt))(*xs)
    return jax.block_until_ready(out)


@probe("maxi")
def _p_maxi():
    import jax.numpy as jnp

    def k(x_ref, o_ref):
        o_ref[...] = jnp.maximum(x_ref[...], jnp.int16(3))
    _run(k)


@probe("subi")
def _p_subi():
    import jax.numpy as jnp

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] - jnp.int16(1)
    _run(k)


@probe("addi")
def _p_addi():
    import jax.numpy as jnp

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.int16(-1)
    _run(k)


@probe("where_max")
def _p_where():
    import jax.numpy as jnp

    def k(x_ref, y_ref, o_ref):
        a, b = x_ref[...], y_ref[...]
        o_ref[...] = jnp.where(a > b, a, b)
    _run(k, n_in=2)


@probe("select_ge")
def _p_select():
    import jax
    import jax.numpy as jnp

    def k(x_ref, y_ref, o_ref):
        a, b = x_ref[...], y_ref[...]
        o_ref[...] = jax.lax.select(a >= b, a, b)
    _run(k, n_in=2)


@probe("pad_slice")
def _p_pad():
    import jax.numpy as jnp

    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.pad(x, ((0, 0), (1, 0)),
                             constant_values=jnp.int16(-3))[:, :-1]
    _run(k)


@probe("full_step")
def _p_full():
    """A faithful miniature of the real DP column step in int16."""
    import jax.numpy as jnp

    def k(p_ref, h_ref, e_ref, o_ref):
        sub, H, E = p_ref[...], h_ref[...], e_ref[...]
        neg = jnp.int16(-16384)
        hd = jnp.pad(H, ((0, 0), (1, 0)), constant_values=jnp.int16(0))[:, :-1]
        ht = jnp.maximum(jnp.maximum(hd + sub, E), jnp.int16(0))
        c = ht + jnp.int16(-3)
        s = 1
        while s < 128:
            c = jnp.maximum(
                c, jnp.pad(c, ((0, 0), (s, 0)),
                           constant_values=neg)[:, :-s])
            s *= 2
        F = jnp.pad(c, ((0, 0), (1, 0)), constant_values=neg)[:, :-1]
        H2 = jnp.maximum(ht, F + jnp.int16(1))
        E2 = jnp.maximum(jnp.maximum(E - jnp.int16(1), H2 - jnp.int16(3)),
                         jnp.int16(0))
        o_ref[...] = H2 + E2
    _run(k, n_in=3)


@probe("mixed_cast")
def _p_cast():
    """int16 state, int32 colmax reduction (what the kernel's tracker does)."""
    import jax.numpy as jnp

    def k(x_ref, o_ref):
        x = x_ref[...]
        m = jnp.max(x.astype(jnp.int32), axis=1, keepdims=True)
        o_ref[...] = (x + m.astype(jnp.int16))
    _run(k)


@probe("i32_cmp_max")
def _p_i32cmp():
    """max via i32 compare on i16 values upcast (fallback formulation)."""
    import jax.numpy as jnp

    def k(x_ref, y_ref, o_ref):
        a, b = x_ref[...], y_ref[...]
        m = a.astype(jnp.int32) > b.astype(jnp.int32)
        o_ref[...] = jnp.where(m, a, b)
    _run(k, n_in=2)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    isolate = "--isolate" in sys.argv
    names = args or list(PROBES)
    if isolate:
        results = {}
        for name in names:
            r = subprocess.run(
                [sys.executable, __file__, name],
                capture_output=True, text=True, timeout=600,
                cwd="/root/repo")
            ok = f"OK {name}" in r.stdout
            results[name] = "OK" if ok else "FAIL"
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
            print(f"{name}: {results[name]}")
            if not ok:
                for ln in tail:
                    print(f"    {ln}")
        print({k: v for k, v in results.items()})
    else:
        for name in names:
            try:
                PROBES[name]()
                print(f"OK {name}")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
